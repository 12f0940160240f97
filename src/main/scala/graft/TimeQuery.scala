package graft
import org.apache.spark.sql.SparkSession

/** Repeat-timing instrument for catalog queries — the per-query A/B
  * tool the optimization rounds use where Bench's one-shot isolation
  * mode (one timing per JVM) cannot separate a code delta from JVM /
  * page-cache cold-start variance: run each named query `n` times in
  * ONE session (first iteration warms memos and codegen; later
  * iterations measure the query) and print every timing.
  *
  * Usage: runMain graft.TimeQuery <sfDir> <n> <q1,q2,…> */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, nStr, names) = args.take(3)
    val n = nStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names.split(",")) {
      val fn = SparkEntry.queries(name)
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(s"""{"q":"$name","t":[${ts.map(t => f"$t%.3f").mkString(",")}]}""")
    }
    Core.clearCaches(spark)
    spark.stop()
  }
}
