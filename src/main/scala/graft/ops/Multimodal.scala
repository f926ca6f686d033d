package graft.ops

import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2 "Multimodal"): media
  * payloads are opaque `binary` columns with typed metadata; decode /
  * frame-extraction runs per-partition over the bytes.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked DETERMINISTIC STUB (fixed-stride byte windows over
  * the payload). Everything around it — the binary schema, the
  * partitioning, the per-partition batch iteration, the frame output
  * schema — is the real 100 TB shape: payload bytes never leave the
  * executor, frames are emitted streaming per partition, and the
  * frame table is keyed for downstream joins.
  */
object Multimodal {

  /** Synthesize a deterministic binary payload per document (stands
    * in for real media bytes; derived from the text so it is
    * reproducible in the oracle).
    */
  def withPayload(df: DataFrame): DataFrame =
    df.withColumn("payload", col("text").cast("binary"))
      .withColumn("media_type",
        element_at(typedLit(Seq("image", "audio", "video")), (col("doc_id") % 3 + 1).cast("int")))

  // ---------------------------------------------------------------
  // mm_binary_meta — typed metadata extracted FROM the binary column
  // (byte length, content hash, magic-header bytes).
  // ---------------------------------------------------------------
  private def binaryMeta(s: SparkSession, dir: String): DataFrame =
    withPayload(Tables.load(s, dir, "documents"))
      .select(
        col("doc_id"), col("media_type"),
        length(col("payload")).cast("bigint").as("n_bytes"),
        md5(col("payload")).as("content_md5"),
        hex(substring(col("text"), 1, 4).cast("binary")).as("header_hex"))
      .orderBy("doc_id")

  private val binaryMetaSql =
    """SELECT doc_id, ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
      | octet_length(encode(text)) AS n_bytes,
      | md5(text) AS content_md5,
      | hex(encode(substring(text, 1, 4))) AS header_hex
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // mm_frame_sample — per-partition decode + frame sampling. The
  // decoder below is the STUB: a real build would replace
  // `decodeFrames` with a codec call; schema and flow are unchanged.
  // ---------------------------------------------------------------
  final case class Frame(doc_id: Long, frame_idx: Int, offset: Int, n_bytes: Int, frame_hex: String)

  /** STUB DECODER — deterministic fake: "frames" are 16-byte windows
    * every 32 bytes of payload. Replace with a real codec at the same
    * signature; everything downstream is codec-agnostic.
    */
  private[ops] def decodeFrames(docId: Long, payload: Array[Byte]): Iterator[Frame] = {
    val stride = 32
    val width = 16
    Iterator.range(0, math.max(payload.length - width + 1, 1), stride).zipWithIndex.map {
      case (off, idx) =>
        val slice = payload.slice(off, math.min(off + width, payload.length))
        Frame(docId, idx, off, slice.length, slice.map("%02X".format(_)).mkString)
    }
  }

  private def frameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val framed = withPayload(Tables.load(s, dir, "documents"))
      .select(col("doc_id"), col("payload"))
      .repartition(col("doc_id")) // co-locate payload bytes; frames stay executor-local
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => decodeFrames(id, bytes) })
    framed.toDF().orderBy("doc_id", "frame_idx")
  }

  // Oracle replica of the stub decoder: 16-byte windows every 32
  // bytes, clipped at payload end (ASCII text ⇒ chars == bytes, so
  // DuckDB's string substring reproduces the byte slices; hex() is
  // uppercase in both).
  private val frameSampleSql =
    """WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS blen FROM documents),
      |o AS (SELECT doc_id, text, unnest(range(0, greatest(blen - 15, 1), 32)) AS off FROM d),
      |f AS (SELECT doc_id, CAST(off / 32 AS INT) AS frame_idx, CAST(off AS INT) AS "offset",
      |        substring(text, CAST(off + 1 AS INT), 16) AS fr
      |      FROM o)
      |SELECT doc_id, frame_idx, "offset",
      |  CAST(octet_length(encode(fr)) AS INT) AS n_bytes,
      |  hex(encode(fr)) AS frame_hex
      |FROM f
      |ORDER BY doc_id, frame_idx""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("mm_binary_meta", binaryMeta, Some(binaryMetaSql)),
    Op("mm_frame_sample", frameSample, Some(frameSampleSql)))
}
