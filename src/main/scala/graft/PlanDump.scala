package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` physical plans for catalog queries —
  * the optimization rounds' evidence artifact (plans/r{N}/<q>_before
  * / _after): the judge checks plan-shape claims (Exchange count,
  * join strategy, PushedFilters) against these files without running
  * Spark.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> [q1,q2,…]
  * — no query list dumps the whole catalog. Plans are captured
  * WITHOUT executing the queries (explain is plan-time only), so a
  * dump is cheap; store-backed queries still build their warm
  * fixtures on first touch (plan construction resolves manifests). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix) = args.take(3)
    val only = args.lift(3).map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
          println(s"[plandump] $name -> $outDir/${name}_$suffix.txt")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
          Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"),
            s"PLAN CAPTURE FAILED: ${e.getClass.getName}: ${e.getMessage}\n")
        }
      }
    Core.clearCaches(spark)
    spark.stop()
  }
}
