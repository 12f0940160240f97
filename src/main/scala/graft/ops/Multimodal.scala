package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Core._

/** Multimodal-column plumbing (north-star surface): image/audio/video
  * payloads are opaque `binary` columns with typed metadata travelling
  * alongside. The container has no image/audio codecs, so the decode
  * step is a clearly-marked deterministic STUB (`fakeDecode`) — but the
  * Spark-side plumbing (binary schema, per-partition batch processing,
  * metadata struct shape) is real and tested.
  *
  * Scale notes: payloads stay in the executor (never collected); the
  * decode runs via `mapPartitions` so a real codec would amortize its
  * init cost per partition (the Scala analog of the batch shape a
  * Pandas UDF / `mapInPandas` would have); metadata-only queries prune
  * the binary column at the Parquet scan.
  */
object Multimodal {

  /** STUB decoder: stands in for an image/audio codec. Deterministic
    * pure function of the payload bytes — replace with a real codec
    * (e.g. javax.imageio) when one is available in the runtime. */
  def fakeDecode(payload: Array[Byte]): (Int, Int, String) = {
    val n = payload.length
    (320 + n % 320, 240 + n % 240, if (n % 2 == 0) "rgb8" else "gray8")
  }

  final case class MediaMeta(doc_id: Long, width: Int, height: Int,
      pixfmt: String, n_bytes: Long)

  /** mapPartitions decode pipeline over binary payloads (not oracle-
    * checkable — exercised by MultimodalSpec). */
  def decodeMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "documents")
      .select($"doc_id", $"text".cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init site for a real codec
        it.map { case (id, payload) =>
          val (w, h, fmt) = fakeDecode(payload)
          MediaMeta(id, w, h, fmt, payload.length.toLong)
        }
      }
      .toDF()
  }

  val catalog: Map[String, Q] = Map(

    // ---- binary payload + metadata extraction (oracle-checkable: the
    // byte-level ops are identical in both engines) ----
    "q50_multimodal_meta" -> Q(
      (s, dir) => {
        import s.implicits._
        val payload = $"text".cast("binary")
        table(s, dir, "documents").select(
            $"doc_id",
            length(payload).as("n_bytes"),
            md5(payload).as("payload_md5"),
            (lit(320) + $"n_chars" % 320).cast("int").as("width"),
            (lit(240) + $"n_chars" % 240).cast("int").as("height"),
            when($"n_chars" % 2 === 0, "rgb8").otherwise("gray8").as("pixfmt"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
        cast(octet_length(cast(text as blob)) as bigint) AS n_bytes,
        md5(text) AS payload_md5,
        cast(320 + n_chars % 320 as int) AS width,
        cast(240 + n_chars % 240 as int) AS height,
        CASE WHEN n_chars % 2 = 0 THEN 'rgb8' ELSE 'gray8' END AS pixfmt
        FROM documents ORDER BY doc_id"""))
  )
}
