package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * with a deterministic fake "decode" (SURVEY.md §2 row 28).
  *
  * The image/audio codecs aren't available in this environment, so the
  * decode step is a clearly-marked deterministic stand-in — but the
  * Spark-side machinery is real: a `binary` payload column with a typed
  * metadata struct, a case-class `Dataset` boundary, and per-partition
  * imperative feature extraction via `mapPartitions` (the Scala analogue of
  * a vectorized decode UDF: one iterator pass per partition, no
  * driver-side collection, embarrassingly parallel at 100 TB).
  *
  * Payloads are synthesized from the documents table (UTF-8 text bytes) so
  * the DuckDB oracle can recompute every feature relationally.
  */
object Multimodal {

  case class MmIn(doc_id: Long, media_type: String, payload: Array[Byte],
    width: Int, height: Int)
  case class MmOut(doc_id: Long, media_type: String, n_bytes: Long,
    checksum: Long, feat: Long)

  val P: Long = TextStats.FpMod

  /** Deterministic fake decode: rolling polynomial hash of the payload
    * bytes (stands in for a real pixel/sample decode; same recurrence as
    * TextStats.fingerprint so the oracle reproduces it). */
  private def fakeDecodeChecksum(payload: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < payload.length) {
      h = (h * TextStats.FpPrime + (payload(i) & 0xff)) % P
      i += 1
    }
    h
  }

  /** media_type-dependent fake feature: pixel count for images, sample
    * count for audio, frame count for video — all from the typed
    * metadata, not the payload (the metadata IS real). */
  private def fakeFeature(m: MmIn): Long = m.media_type match {
    case "image" => m.width.toLong * m.height
    case "audio" => m.width.toLong * 1000L
    case _       => m.height.toLong * 24L
  }

  /** ASCII-only equivalence (same caveat as TextStats): the Spark side
    * computes n_bytes/checksum from the UTF-8 payload BYTES while the
    * oracle uses character length and per-char `ascii()` — identical only
    * while the testdata text is pure ASCII (one byte per char, ascii() =
    * byte value). If the corpus ever grows non-ASCII text, switch the
    * oracle to `octet_length(encode(text))` + a byte-wise fold rather than
    * weakening this side. */
  def mmFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = Tables.documents(spark, dir)
      .select(col("doc_id"),
        expr("CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END")
          .as("media_type"),
        encode(col("text"), "UTF-8").as("payload"),
        (col("n_chars") % 640 + 16).cast("int").as("width"),
        (col("n_chars") % 480 + 16).cast("int").as("height"))
      .as[MmIn]
    src.mapPartitions { it =>
      it.map(m => MmOut(m.doc_id, m.media_type, m.payload.length.toLong,
        fakeDecodeChecksum(m.payload), fakeFeature(m)))
    }.toDF()
      .orderBy("doc_id")
  }

  // ---- mm_frames ----------------------------------------------------------

  /** Frame sampling plumbing for the video rows: every FrameStride-th
    * frame index, with its (fake) byte offset into the payload — the
    * explode shape a real frame sampler produces ahead of a decode UDF.
    * One narrow explode per video row, no shuffle. */
  val FrameStride = 24

  def mmFrames(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .where(col("doc_id") % 3 === 2) // the video stripe of the mm table
      .select(col("doc_id"),
        (col("n_chars") % 480 + 16).cast("int").as("height"),
        (col("n_chars") % 640 + 16).cast("int").as("width"))
      .withColumn("n_frames", (col("height") * 24).cast("long"))
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(FrameStride.toLong)))
          .as("frame_idx"),
        col("width"))
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * col("width")).as("byte_offset"))
      .orderBy("doc_id", "frame_idx")

  val mmFramesSql: String =
    s"""WITH v AS (
       |  SELECT doc_id,
       |         CAST(n_chars % 480 + 16 AS INT) AS height,
       |         CAST(n_chars % 640 + 16 AS INT) AS width
       |  FROM documents WHERE doc_id % 3 = 2),
       |f AS (
       |  SELECT doc_id, width, unnest(range(0, CAST(height AS BIGINT) * 24,
       |         $FrameStride)) AS frame_idx
       |  FROM v)
       |SELECT doc_id, frame_idx, frame_idx * width AS byte_offset
       |FROM f ORDER BY doc_id, frame_idx""".stripMargin

  val mmFeaturesSql: String =
    s"""WITH m AS (
       |  SELECT doc_id,
       |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
       |    text,
       |    CAST(n_chars % 640 + 16 AS INT) AS width,
       |    CAST(n_chars % 480 + 16 AS INT) AS height
       |  FROM documents)
       |SELECT doc_id, media_type,
       |  CAST(length(text) AS BIGINT) AS n_bytes,
       |  list_reduce(
       |    list_prepend(CAST(0 AS BIGINT),
       |      list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
       |    (h, c) -> (h * ${TextStats.FpPrime} + c) % $P) AS checksum,
       |  CASE media_type
       |    WHEN 'image' THEN CAST(width AS BIGINT) * height
       |    WHEN 'audio' THEN CAST(width AS BIGINT) * 1000
       |    ELSE CAST(height AS BIGINT) * 24 END AS feat
       |FROM m ORDER BY doc_id""".stripMargin
}
