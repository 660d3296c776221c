package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star X4): media as opaque
  * `binary` payloads + typed metadata, with decode / feature-extract
  * as batched per-partition transforms.
  *
  * The Spark side is real and load-bearing: schema, partitioning,
  * the typed Dataset API, and the batch shape (fixed-size record
  * batches inside mapPartitions — the JVM analogue of Arrow-batched
  * mapInPandas, so a real decoder amortizes model/library init across
  * a batch, not per row). The decoder itself is a STUB — this
  * container has no image/audio libraries — replaced by a
  * deterministic byte-statistics fake, clearly marked below.
  *
  * At scale: payloads never shuffle (all transforms are narrow maps);
  * only the small feature rows move. Feature extraction parallelism =
  * input partitions; `repartition(n)` upstream is the throughput
  * knob when payload sizes skew.
  */
object Multimodal {

  /** One media row: opaque payload + the typed metadata a real
    * pipeline carries alongside (dimensions for images, sample rate
    * for audio, frame count for video). */
  final case class MediaRecord(
      mediaId: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, sampleRate: Int)

  /** Extracted features: byte stats + a perceptual-hash stand-in. */
  final case class MediaFeatures(
      mediaId: Long, kind: String, nBytes: Long,
      byteMean: Double, histHead: Seq[Long], phash: Long)

  /** ---- STUB ----
    * A real implementation decodes the payload (JPEG→pixels,
    * WAV→samples, video→frames) with a native library and computes
    * real features/embeddings. Deterministic fake: byte length, mean
    * byte value, the first 4 buckets of a 16-bucket byte histogram,
    * and an FNV-1a hash as the "perceptual hash". Same signature,
    * same batch shape, swap the body when the codec exists. */
  def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { r =>
      val bytes = if (r.payload == null) Array.emptyByteArray else r.payload
      var fnv = 0xcbf29ce484222325L
      val hist = new Array[Long](16)
      var sum = 0L
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        sum += b
        hist(b >> 4) += 1
        fnv = (fnv ^ b) * 0x100000001b3L
        i += 1
      }
      MediaFeatures(
        r.mediaId, r.kind, bytes.length.toLong,
        if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length,
        hist.take(4).toSeq, fnv)
    }

  /** Batched per-partition feature extraction — mapPartitions with
    * fixed-size record batches (the mapInPandas/Arrow shape). */
  def extractFeatures(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(batchSize).flatMap(decodeBatch))
  }

  /** Frame sampling for "video" payloads: every `stride`-th
    * `frameBytes`-sized slice becomes a frame row (explode — narrow,
    * no shuffle). Pure column expressions, no UDF. */
  def sampleFrames(media: DataFrame, frameBytes: Int = 256, stride: Int = 4): DataFrame =
    media
      .filter(col("kind") === "video")
      .select(col("mediaId"), posexplode(
        transform(
          sequence(lit(0),
            greatest(expr(s"(length(payload) - 1) div ${frameBytes * stride}"), lit(0)).cast("int")),
          i => substring(col("payload"), (i * frameBytes * stride + 1).cast("int"), lit(frameBytes))))
        .as(Seq("frame_no", "frame")))
      .filter(length(col("frame")) > 0)

  /** Deterministic media table derived from `documents` (no media
    * files ship with the testdata): payload = UTF-8 bytes of the
    * text, kind round-robins image/audio/video, metadata synthesized
    * from doc stats. */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("mediaId"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      (col("n_chars") % 640).cast("int").as("width"),
      (col("n_chars") % 480).cast("int").as("height"),
      lit(16000).as("sampleRate"))
      .as[MediaRecord]
  }
}
