package graft.llmops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * processed in partition-local batches.
  *
  * The real decode (image/audio/video libraries) is STUBBED — this
  * container has no media codecs — but everything Spark-side is real and
  * tested: the schema contract, the batched `mapPartitions` shape (the
  * Scala analog of `mapInPandas` batch processing: bounded memory per
  * batch, no per-row virtual-call overhead), and the deterministic
  * feature outputs that let the pipeline be oracle-verified.
  *
  * At 100 TB: payloads stay in columnar storage until this stage,
  * batches bound executor memory (`BatchSize` × max payload), and the
  * stage is a narrow transformation — no shuffle.
  */
object Multimodal {

  /** Input contract: one media object per row. */
  final case class MediaRecord(doc_id: Long, kind: String, media: Array[Byte])

  /** Output contract: extracted features + carried metadata. */
  final case class MediaFeatures(
      doc_id: Long, kind: String, n_bytes: Long, sig: String, frames: Int)

  val BatchSize = 64

  /** A NULL media payload is an undecodable record: every facade below
    * SKIPS it (a real decoder would route it to quarantine) instead of
    * letting the byte-math stubs NPE mid-task. Callers wanting the
    * quarantine frame filter `media IS NULL` before calling. */
  private def decodable(df: org.apache.spark.sql.DataFrame) =
    df.filter(org.apache.spark.sql.functions.col("media").isNotNull)

  /** STUB decode: deterministic byte-level features standing in for a
    * codec call (the md5 is the "content fingerprint", `frames` a fake
    * sampled-frame count). Replace the body with a real decoder when
    * codecs are available; the batching contract stays. */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(r.media).map("%02x".format(_)).mkString
    MediaFeatures(r.doc_id, r.kind, r.media.length.toLong, hex,
      (r.media.length % 7 + 1).toInt)
  }

  /** Batched feature extraction over a media Dataset. */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaFeatures]
    ds.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        // A real decoder would process `batch` as one vectorized call.
        batch.iterator.map(decodeStub)
      }
    }
  }

  /** DataFrame façade: (doc_id, kind, media binary) → features. */
  def extractFeaturesDF(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaRecord]
    extractFeatures(decodable(df).as[MediaRecord]).toDF()
  }

  /** One sampled frame of a media payload. */
  final case class MediaFrame(
      doc_id: Long, kind: String, frame_idx: Int, frame_sig: String)

  /** STUB frame decode: a real video decoder seeks to frame k and
    * decodes; the stand-in slices the payload into `frameCount(r)` even
    * byte ranges and fingerprints each — deterministic, so the Spark
    * plumbing (one input row → N frame rows, batch-local work, no
    * shuffle) is oracle-verifiable end to end. */
  def frameCount(nBytes: Long): Int = (nBytes % 7 + 1).toInt

  def sampleFramesStub(r: MediaRecord): Iterator[MediaFrame] = {
    val n = frameCount(r.media.length.toLong)
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until n).iterator.map { k =>
      val from = (r.media.length.toLong * k / n).toInt
      val until = (r.media.length.toLong * (k + 1) / n).toInt
      md.reset()
      val hex = md.digest(java.util.Arrays.copyOfRange(r.media, from, until))
        .map("%02x".format(_)).mkString
      MediaFrame(r.doc_id, r.kind, k, hex)
    }
  }

  /** Frame sampling: each payload expands to its sampled frames —
    * a narrow flatMap (the generator shape); output rows are
    * frame-grain training examples. */
  def sampleFramesDF(df: DataFrame): DataFrame = {
    implicit val in = org.apache.spark.sql.Encoders.product[MediaRecord]
    implicit val out = org.apache.spark.sql.Encoders.product[MediaFrame]
    decodable(df).as[MediaRecord].mapPartitions { it =>
      it.grouped(BatchSize).flatMap(_.iterator.flatMap(sampleFramesStub))
    }.toDF()
  }

  /** Perceptual average-hash of a media payload: 4 × 16-bit bands. */
  final case class MediaAHash(doc_id: Long, kind: String,
      b0: Int, b1: Int, b2: Int, b3: Int)

  /** STUB perceptual hash (aHash family): a real implementation decodes
    * the image and downsamples to an 8×8 grayscale grid; the stand-in
    * "downsamples" the payload to 64 evenly-spaced bytes (the same 1-D
    * nearest-neighbor geometry as [[resizeStub]]). Bit i = sampled
    * byte i strictly above the integer mean of the 64 samples; bits
    * pack into four 16-bit bands so near-dup candidate generation can
    * band-join (pigeonhole: any pair within hamming distance 3 shares
    * at least one of 4 bands). Deterministic byte math — the oracle
    * replays it on the VARCHAR (ASCII corpus: byte == char). */
  def aHashStub(r: MediaRecord): MediaAHash = {
    val len = r.media.length
    val sb = Array.tabulate(64)(i => r.media((len.toLong * i / 64).toInt) & 0xff)
    val mean = sb.sum / 64
    def band(j: Int) = (0 until 16).foldLeft(0) { (acc, b) =>
      if (sb(16 * j + b) > mean) acc | (1 << b) else acc
    }
    MediaAHash(r.doc_id, r.kind, band(0), band(1), band(2), band(3))
  }

  /** Perceptual hashing over a payload DataFrame (doc_id, kind, media
    * binary with ≥ 64 bytes) — batch-local, narrow, no shuffle. The
    * batched-iterator shape is the REAL decoder's contract (a production
    * image pipeline amortizes decoder init per batch); pure-ASCII
    * corpora can take [[aHashBands]], the codegen twin. */
  def aHashDF(df: DataFrame): DataFrame = {
    implicit val in = org.apache.spark.sql.Encoders.product[MediaRecord]
    implicit val out = org.apache.spark.sql.Encoders.product[MediaAHash]
    decodable(df).as[MediaRecord].mapPartitions { it =>
      it.grouped(BatchSize).flatMap(_.iterator.map(aHashStub))
    }.toDF()
  }

  /** Column-expression twin of [[aHashDF]] over a STRING payload column
    * (byte == char on an ASCII corpus): same 4 × 16-bit bands through
    * the codegen'd `graft_ahash_bands` kernel — one O(64) byte pass per
    * row inside whole-stage codegen, no object serialization, no
    * batching stage. This is the hot path when the payload needs no
    * out-of-JVM decode; real binary media keeps the [[aHashDF]]
    * batched-decode contract. Output: the input columns plus `b0..b3`. */
  def aHashBands(df: DataFrame, textCol: String = "text"): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.withColumn("_ab",
        call_function("graft_ahash_bands", col(textCol).cast("binary")))
      .withColumn("b0", element_at(col("_ab"), 1))
      .withColumn("b1", element_at(col("_ab"), 2))
      .withColumn("b2", element_at(col("_ab"), 3))
      .withColumn("b3", element_at(col("_ab"), 4))
      .drop("_ab")
  }

  /** Audio input contract: payload + the sample-rate metadata a real
    * resampler/segmenter reads. */
  final case class AudioRecord(doc_id: Long, media: Array[Byte],
      sample_rate: Int)

  /** One fixed-duration overlapping audio segment (ASR/audio-LM
    * training grain). */
  final case class AudioSegment(doc_id: Long, sample_rate: Int,
      seg_idx: Int, start_byte: Long, seg_bytes: Long, seg_sig: String)

  /** Stub segmentation geometry: windows of `rate/100` bytes advancing
    * by `3·rate/400` (75% of the window — the standard overlapped
    * framing), expressed in bytes so the stub is codec-free while the
    * rate-dependent shape survives. A real segmenter replaces the byte
    * math with sample math; the plumbing contract is identical. */
  def audioSegBytes(rate: Int): Int = rate / 100
  def audioHopBytes(rate: Int): Int = 3 * rate / 400

  /** STUB audio segmentation: one payload row → N overlapping segment
    * rows, each fingerprinted — narrow flatMap, batch-local, no
    * shuffle; deterministic so the expansion is oracle-verifiable. */
  def segmentAudioStub(r: AudioRecord): Iterator[AudioSegment] = {
    val len = r.media.length
    val seg = audioSegBytes(r.sample_rate)
    val hop = audioHopBytes(r.sample_rate)
    val n = if (len == 0) 0 else (len - 1) / hop + 1
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until n).iterator.map { k =>
      val start = k * hop
      val sl = math.min(seg, len - start)
      md.reset()
      val hex = md
        .digest(java.util.Arrays.copyOfRange(r.media, start, start + sl))
        .map("%02x".format(_)).mkString
      AudioSegment(r.doc_id, r.sample_rate, k, start.toLong, sl.toLong, hex)
    }
  }

  /** Audio segmentation over a payload DataFrame
    * (doc_id, media binary, sample_rate). */
  def segmentAudioDF(df: DataFrame): DataFrame = {
    implicit val in = org.apache.spark.sql.Encoders.product[AudioRecord]
    implicit val out = org.apache.spark.sql.Encoders.product[AudioSegment]
    decodable(df).as[AudioRecord].mapPartitions { it =>
      it.grouped(BatchSize).flatMap(_.iterator.flatMap(segmentAudioStub))
    }.toDF()
  }

  /** Image-resize input contract: payload + the integer downscale
    * factor the pipeline's metadata prescribes. */
  final case class ImageRecord(doc_id: Long, media: Array[Byte], scale: Int)

  /** Resize output: new payload size + fingerprint, original carried. */
  final case class ImageResized(doc_id: Long, scale: Int,
      in_bytes: Long, out_bytes: Long, out_sig: String)

  /** STUB resize: 1-D nearest-neighbor — keep every `scale`-th byte (a
    * real resizer does this in 2-D over decoded pixels; the stand-in
    * keeps the size contract ceil(len/scale) and a deterministic
    * output fingerprint so the transform is oracle-verifiable). */
  def resizeStub(r: ImageRecord): ImageResized = {
    val len = r.media.length
    val out = Array.range(0, len, r.scale).map(r.media(_))
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(out).map("%02x".format(_)).mkString
    ImageResized(r.doc_id, r.scale, len.toLong, out.length.toLong, hex)
  }

  /** Resize over a payload DataFrame (doc_id, media binary, scale) —
    * batch-local, narrow, no shuffle. */
  def resizeDF(df: DataFrame): DataFrame = {
    implicit val in = org.apache.spark.sql.Encoders.product[ImageRecord]
    implicit val out = org.apache.spark.sql.Encoders.product[ImageResized]
    decodable(df).as[ImageRecord].mapPartitions { it =>
      it.grouped(BatchSize).flatMap(_.iterator.map(resizeStub))
    }.toDF()
  }
}
