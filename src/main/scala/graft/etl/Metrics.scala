package graft.etl

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Sink/job observability (the engine-side replacement for the
  * reference's self-reported size stats and resource monitor,
  * unified_code.py:365–388 `optimize_json` stats and :75–93
  * `SystemMonitor`): a `QueryExecutionListener` that harvests the
  * write metrics Spark already tracks (rows / files / bytes written)
  * from the executed plan of each successful job.
  *
  * Unlike the reference's monitor (warn-only psutil polling), these
  * numbers come from the engine's own metric registry, per write, and
  * scale to any cluster — the same counters the Spark UI shows.
  */
object Metrics {

  final case class WriteStats(rows: Long, files: Long, bytes: Long)

  private class Collector extends QueryExecutionListener {
    val seen = new ConcurrentLinkedQueue[WriteStats]()
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
      val ms = qe.executedPlan.collect {
        case p if p.metrics.keySet.exists(_.startsWith("numOutput")) => p.metrics
      }
      ms.foreach { m =>
        val rows = m.get("numOutputRows").map(_.value).getOrElse(0L)
        val files = m.get("numFiles").map(_.value).getOrElse(0L)
        val bytes = m.get("numOutputBytes").map(_.value).getOrElse(0L)
        if (files > 0 || bytes > 0) seen.add(WriteStats(rows, files, bytes))
      }
    }
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
  }

  /** Run `body` and return the accumulated write stats of every sink
    * job it triggered. */
  def collectWriteStats[T](spark: SparkSession)(body: => T): (T, WriteStats) = {
    val c = new Collector
    spark.listenerManager.register(c)
    try {
      val result = body
      // the listener bus delivers asynchronously; wait until the queue
      // stops growing (bounded)
      var last = -1
      var stable = 0
      var waited = 0
      while (stable < 2 && waited < 5000) {
        val n = c.seen.size()
        if (n == last && n > 0) stable += 1 else stable = 0
        last = n
        Thread.sleep(100)
        waited += 100
      }
      val all = c.seen.iterator().asScala.toSeq
      (result, WriteStats(all.map(_.rows).sum, all.map(_.files).sum, all.map(_.bytes).sum))
    } finally spark.listenerManager.unregister(c)
  }
}
