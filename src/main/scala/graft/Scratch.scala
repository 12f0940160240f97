package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{IndexStore, Selection}
import graft.Core._

// throwaway measurement harness (deleted before commit): the quartered
// reanchorStore variant's gate margins + build time
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (a <- args) {
      val Array(sf, modS) = a.split(":")
      val mod = modS.toInt
      val dir = s"/root/testdata/$sf"
      val t0 = System.nanoTime()
      val idx = java.nio.file.Files.createTempDirectory("graft-rea-q").toString
      val docs = table(spark, dir, "documents")
        .select(col("doc_id"), md5(col("doc_id").cast("string")).as("text"),
          col("source"), col("n_chars"))
      IndexStore.write(spark, docs.filter(col("doc_id") % mod === 0), idx,
        governed = true)
      val f1s = docs.filter(col("doc_id") % 4 === 1)
      val (_, rep1) = IndexStore.screenAndFoldGated(spark, idx,
        f1s.filter(col("doc_id") % 10 =!= 1)
          .unionByName(f1s.filter(col("doc_id") % 10 === 1)
            .select(col("doc_id"), col("text"),
              lit("probe_shift").as("source"),
              (col("n_chars") + 480).as("n_chars"))),
        "src0", maxPsi = 1.0)
      val r1 = rep1.select(col("source"), col("psi_max"), col("held"))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
      println(s"== $sf m$mod fold1: held=${r1.filter(_._3).map(_._1).toSeq} " +
        s"maxAdmittedDraw=${r1.filter(!_._3).map(_._2).max} " +
        s"probePsi=${r1.filter(_._3).map(_._2).toSeq}")
      val cum = IndexStore.driftFromStore(spark, idx, "src0")
        .select(col("source"), col("psi_max")).collect()
        .map(r => (r.getString(0), r.getDouble(1)))
      println(s"== $sf m$mod no-laundering scan max=${cum.map(_._2).max} " +
        s"(${cum.maxBy(_._2)._1})")
      IndexStore.reanchorCensus(spark, idx, "src0",
        docs.filter(col("source") === "src0")
          .select(col("doc_id"), col("text"), col("source"),
            (col("n_chars") + 480).as("n_chars")),
        maxPsi = 1.0)
      val (_, rep2) = IndexStore.screenAndFoldGated(spark, idx,
        docs.filter(col("doc_id") % 4 === 3 &&
            col("source") =!= "src0" && col("doc_id") % 10 === 3)
          .select(col("doc_id"), col("text"),
            lit("probe_shift").as("source"),
            (col("n_chars") + 480).as("n_chars")),
        "src0", maxPsi = 1.0)
      val r2 = rep2.select(col("source"), col("psi_max"), col("held"))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
      println(s"== $sf m$mod fold2: held=${r2.filter(_._3).map(_._1).toSeq} " +
        s"probePass=${r2.map(t => (t._1, t._2)).toSeq}")
      println(f"== $sf m$mod build wall: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      IndexStore.deleteRec(new java.io.File(idx))
    }
    spark.stop()
  }
}
