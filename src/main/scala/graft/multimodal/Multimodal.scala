package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** A media file as it would sit in a multimodal training table: an
  * opaque binary payload plus typed metadata columns.
  */
final case class MediaFile(doc_id: Long, content: Array[Byte], media_type: String)

/** Output of the (stubbed) image decoder. */
final case class ImageMeta(
    doc_id: Long,
    byte_len: Long,
    width: Long,
    height: Long,
    format: String)

/** One sampled frame of a (fake) video payload. */
final case class Frame(doc_id: Long, frame_idx: Long, frame_off: Long)

/** Output of the (stubbed) resize + feature-extract stage. */
final case class ResizedImage(
    doc_id: Long,
    width: Long,
    height: Long,
    rs_width: Long,
    rs_height: Long,
    feat: Double)

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns processed by partition-wise decoder functions.
  *
  * The decode itself is a clearly-marked DETERMINISTIC STUB (no media
  * libraries in this container): metadata is derived arithmetically from
  * the byte length, which is exactly what makes the Spark-side plumbing
  * testable end-to-end — schema (binary + struct), partition-wise batch
  * execution via `mapPartitions` (the Scala analog of `mapInPandas`:
  * open-decoder-once-per-partition, stream rows through), and a DuckDB
  * oracle over the same arithmetic. Swapping in a real decoder changes
  * only the function body, not the pipeline shape.
  *
  * Scale notes: decode is a narrow per-partition pass — no shuffle. The
  * binary payload never moves through a shuffle; only extracted metadata
  * does. That is the property to preserve at 100 TB: decode early, ship
  * features, never reshuffle raw media bytes.
  */
object Multimodal {

  /** documents.text cast to binary plays the media payload. */
  def mediaFiles(spark: SparkSession, d: String): Dataset[MediaFile] = {
    import spark.implicits._
    Tables.documents(spark, d)
      .select(
        $"doc_id",
        $"text".cast("binary").as("content"),
        (when($"doc_id" % 2 === 0, "image").otherwise("video")).as("media_type"))
      .as[MediaFile]
  }

  /** STUB image decoder: deterministic metadata from the payload bytes.
    * A real implementation would parse the image header here.
    */
  def decodeImageStub(bytes: Array[Byte]): (Long, Long, String) = {
    val n = bytes.length.toLong
    val width = 64L + n % 640L
    val height = 64L + (n / 7L) % 480L
    val format = (n % 3L) match {
      case 0L => "png"
      case 1L => "jpeg"
      case _ => "webp"
    }
    (width, height, format)
  }

  /** Partition-wise decode: one decoder "session" per partition, rows
    * streamed through the iterator (never materialized per partition).
    */
  def decodeMeta(files: Dataset[MediaFile]): Dataset[ImageMeta] = {
    import files.sparkSession.implicits._
    files.mapPartitions { it =>
      // decoder init would happen here, once per partition
      it.map { f =>
        val (w, h, fmt) = decodeImageStub(f.content)
        ImageMeta(f.doc_id, f.content.length.toLong, w, h, fmt)
      }
    }
  }

  val FrameSize = 128L
  val FrameStep = 2L

  /** STUB frame sampler: every FrameStep-th FrameSize-byte "frame".
    * Frame count is ceil(len/FrameSize), so a payload that is an exact
    * multiple of FrameSize gets no phantom frame past its last byte and
    * an empty payload yields no frames.
    */
  def sampleFrames(files: Dataset[MediaFile]): Dataset[Frame] = {
    import files.sparkSession.implicits._
    files.flatMap { f =>
      val nFrames = (f.content.length + FrameSize - 1) / FrameSize
      (0L until nFrames by FrameStep).map(i => Frame(f.doc_id, i, i * FrameSize))
    }
  }

  val TargetWidth = 224L

  /** STUB resize + feature extraction, chained after decode in the same
    * partition-wise pass (decode → resize → featurize without a shuffle,
    * the shape a real preprocessing stage keeps at 100 TB). Resize
    * clamps width to TargetWidth preserving aspect (floor arithmetic —
    * integer-exact on both engines); the "feature" is a deterministic
    * scalar a real model head would replace.
    */
  def resizeStub(m: ImageMeta): ResizedImage = {
    val rw = math.min(m.width, TargetWidth)
    val rh = math.max(1L, m.height * rw / m.width)
    val feat = ((m.byte_len * 2654435761L + m.doc_id) % 1000L).toDouble / 1000.0
    ResizedImage(m.doc_id, m.width, m.height, rw, rh, feat)
  }

  def resized(files: Dataset[MediaFile]): Dataset[ResizedImage] = {
    import files.sparkSession.implicits._
    decodeMeta(files).mapPartitions(_.map(resizeStub))
  }

  def metaQuery(spark: SparkSession, d: String): DataFrame =
    decodeMeta(mediaFiles(spark, d)).toDF()

  def resizeQuery(spark: SparkSession, d: String): DataFrame =
    resized(mediaFiles(spark, d)).toDF()

  def framesQuery(spark: SparkSession, d: String): DataFrame =
    sampleFrames(mediaFiles(spark, d)).toDF()

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_meta" -> (metaQuery _),
    "multimodal_frames" -> (framesQuery _),
    "multimodal_resize" -> (resizeQuery _))

  val oracles: Map[String, String] = Map(
    "multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  64 + CAST(octet_length(encode(text)) AS BIGINT) % 640 AS width,
        |  64 + (CAST(octet_length(encode(text)) AS BIGINT) // 7) % 480 AS height,
        |  CASE CAST(octet_length(encode(text)) AS BIGINT) % 3
        |    WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format
        |FROM documents""".stripMargin,
    "multimodal_resize" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS len,
        |    64 + CAST(octet_length(encode(text)) AS BIGINT) % 640 AS width,
        |    64 + (CAST(octet_length(encode(text)) AS BIGINT) // 7) % 480 AS height
        |  FROM documents)
        |SELECT doc_id, width, height,
        |  least(width, 224) AS rs_width,
        |  greatest(1, height * least(width, 224) // width) AS rs_height,
        |  CAST((len * 2654435761 + doc_id) % 1000 AS DOUBLE) / 1000.0 AS feat
        |FROM m""".stripMargin,
    "multimodal_frames" ->
      """SELECT doc_id,
        |  CAST(f AS BIGINT) AS frame_idx,
        |  CAST(f * 128 AS BIGINT) AS frame_off
        |FROM (SELECT doc_id,
        |        unnest(range(0, (CAST(octet_length(encode(text)) AS BIGINT) + 127) // 128, 2)) AS f
        |      FROM documents) t""".stripMargin)
}
