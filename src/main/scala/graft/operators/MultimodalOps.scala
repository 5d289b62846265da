package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed partition-wise.
  *
  * The real Spark-side machinery — schema, partitioning, iterator-based
  * per-partition batch processing, feature schema — is implemented and
  * tested; the actual CODEC is stubbed behind [[Decoder]] with a
  * deterministic fake (this container ships no image/audio libraries).
  * A production deployment binds [[Decoder]] to e.g. a JNI codec and
  * nothing else changes.
  *
  * Scale design (100 TB): media bytes never leave their partition — all
  * feature extraction is mapPartitions (no shuffle, no driver collect).
  * Downstream joins use the extracted compact features, not the blobs;
  * the blob column stays columnar-at-rest in Parquet and is pruned away
  * by any query that doesn't touch it.
  */
object MultimodalOps {

  /** One media payload: id + modality tag + raw bytes. */
  final case class MediaRecord(media_id: Long, kind: String, media: Array[Byte])

  /** Compact per-media features (what downstream queries join against).
    * `hist_l2` (Σ count(b)² over the byte histogram) and `n_byte_kinds`
    * (distinct byte values) are EXACT integers derived from the same
    * histogram as `byte_entropy` — they are what the driver oracle gate
    * hashes, because a float entropy quantized at any fixed grid can
    * land within an ulp of a rounding boundary and flake across engines
    * whose summation orders differ. Any decode regression that moves the
    * histogram moves these integers identically on both sides. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      mean_byte: Double,
      byte_entropy: Double,
      hist_l2: Long,
      n_byte_kinds: Int)

  /** A sampled frame/chunk of a media payload. */
  final case class MediaFrame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Exact integer per-frame statistics — the hashable audit row of the
    * frame-sampling path (frame bytes themselves are not portably
    * SQL-comparable; their length/sum/endpoint bytes are). */
  final case class FrameStats(
      media_id: Long, frame_idx: Int, n_bytes: Long,
      sum_bytes: Long, first_byte: Int, last_byte: Int)

  /** [[sampleFrames]] + per-frame byte statistics, one typed map — the
    * frame payload never leaves its partition, only the fixed-width
    * stats row does. */
  def frameStats(ds: Dataset[MediaRecord], n: Int): Dataset[FrameStats] = {
    import ds.sparkSession.implicits._
    sampleFrames(ds, n).map { fr =>
      var s = 0L; var i = 0
      while (i < fr.frame.length) { s += fr.frame(i) & 0xff; i += 1 }
      FrameStats(fr.media_id, fr.frame_idx, fr.frame.length.toLong, s,
        fr.frame.head & 0xff, fr.frame.last & 0xff)
    }
  }

  /** Codec seam. `decodeDims` would parse a real container header
    * (PNG IHDR, JPEG SOF, WAV fmt...). */
  trait Decoder extends Serializable {
    def decodeDims(bytes: Array[Byte]): (Int, Int)
  }

  /** Deterministic fake codec: "dimensions" derive from the first bytes —
    * stable, pure, and cheap, so the surrounding plumbing is fully
    * testable. Byte statistics (mean/entropy) are real computations. */
  object StubDecoder extends Decoder {
    def decodeDims(bytes: Array[Byte]): (Int, Int) = {
      val w = if (bytes.length >= 2)
        ((bytes(0) & 0xff) << 4 | (bytes(1) & 0x0f)) max 1 else 1
      val h = if (bytes.length >= 4)
        ((bytes(2) & 0xff) << 4 | (bytes(3) & 0x0f)) max 1 else 1
      (w, h)
    }
  }

  /** Partition-wise feature extraction: one decoder instance per
    * partition, iterator-in/iterator-out (no per-row setup cost, no
    * materialized partition buffer). */
  def extractFeatures(
      ds: Dataset[MediaRecord],
      decoder: Decoder = StubDecoder): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val bytes = r.media
        val (w, h) = decoder.decodeDims(bytes)
        val hist = new Array[Long](256)
        var sum = 0L
        var i = 0
        while (i < bytes.length) { val b = bytes(i) & 0xff; hist(b) += 1; sum += b; i += 1 }
        val n = bytes.length.toDouble
        var ent = 0.0
        var l2 = 0L
        var kinds = 0
        var j = 0
        while (j < 256) {
          if (hist(j) > 0) {
            val p = hist(j) / n; ent -= p * math.log(p) / math.log(2)
            l2 += hist(j) * hist(j); kinds += 1
          }
          j += 1
        }
        MediaFeatures(r.media_id, r.kind, bytes.length.toLong,
          w, h, if (bytes.isEmpty) 0.0 else sum / n, ent, l2, kinds)
      }
    }
  }

  /** Frame sampling: split the payload into `n` evenly-spaced chunks
    * (a real video path would seek keyframes; the slicing/fan-out shape —
    * 1→N rows, bytes stay in-partition — is identical). */
  def sampleFrames(ds: Dataset[MediaRecord], n: Int): Dataset[MediaFrame] = {
    import ds.sparkSession.implicits._
    require(n > 0)
    ds.flatMap { r =>
      val len = r.media.length
      if (len == 0) Iterator.empty
      else (0 until n).iterator.map { k =>
        val from = (len.toLong * k / n).toInt
        val until = (len.toLong * (k + 1) / n).toInt max (from + 1) min len
        MediaFrame(r.media_id, k, java.util.Arrays.copyOfRange(r.media, from, until))
      }
    }
  }

  /** A resized media payload: the decoded grid resampled to (w, h). */
  final case class ResizedMedia(
      media_id: Long, kind: String, width: Int, height: Int, media: Array[Byte])

  /** The decoder's dims clamped to the payload's actual byte grid —
    * shared by [[resize]] and [[resizeStats]] so the resample and its
    * audit row can never disagree on the source geometry: a
    * hostile/buggy decoder returning zero or negative dims must not
    * turn into a negative source index (ADVICE r05). */
  private def clampedDims(
      decoder: Decoder, media: Array[Byte]): (Int, Int) = {
    val (w0, h0) = decoder.decodeDims(media)
    val w = (w0 max 1) min math.max(media.length, 1)
    val h = ((h0 max 1) min math.max(media.length / w, 1)) max 1
    (w, h)
  }

  /** Nearest-neighbor resize: decode dimensions via the codec seam, treat
    * the payload as a row-major width×height grid (a real codec yields
    * exactly that after decode), and resample to (targetW, targetH). Pure
    * per-row compute inside mapPartitions — one decoder per partition,
    * bytes never shuffle, and the OUTPUT is the bounded-size artifact
    * (targetW×targetH) that downstream stages consume; at 100 TB the
    * resize is the step that turns unbounded media bytes into fixed-cost
    * training inputs. */
  def resize(
      ds: Dataset[MediaRecord], targetW: Int, targetH: Int,
      decoder: Decoder = StubDecoder): Dataset[ResizedMedia] = {
    import ds.sparkSession.implicits._
    require(targetW > 0 && targetH > 0)
    ds.mapPartitions { it =>
      it.map { r =>
        val (w, h) = clampedDims(decoder, r.media)
        val out = new Array[Byte](targetW * targetH)
        var y = 0
        while (y < targetH) {
          val sy = (y.toLong * h / targetH).toInt
          var x = 0
          while (x < targetW) {
            val sx = (x.toLong * w / targetW).toInt
            val idx = sy * w + sx
            out(y * targetW + x) =
              if (r.media.isEmpty) 0 else r.media(idx min (r.media.length - 1))
            x += 1
          }
          y += 1
        }
        ResizedMedia(r.media_id, r.kind, targetW, targetH, out)
      }
    }
  }

  /** The hashable audit row of the DECODE+RESAMPLE path: the structurally
    * parsed source geometry (clamped decode dims) plus exact integer
    * statistics of the resampled grid. Resized bytes themselves are not
    * portably SQL-comparable; their histogram moments and endpoint bytes
    * are, and they move whenever any resample index moves — so an oracle
    * recomputing these puts the mapPartitions decode seam itself under
    * the hash gate (VERDICT r14 item 8). */
  final case class ResizedStats(
      media_id: Long, kind: String, src_w: Int, src_h: Int,
      sum_bytes: Long, hist_l2: Long, n_byte_kinds: Int,
      first_byte: Int, last_byte: Int)

  /** [[resize]] + exact per-payload statistics of the resampled grid, one
    * typed partition-wise pass — the resized bytes never leave their
    * partition, only the fixed-width audit row does. */
  def resizeStats(
      ds: Dataset[MediaRecord], targetW: Int, targetH: Int,
      decoder: Decoder = StubDecoder): Dataset[ResizedStats] = {
    import ds.sparkSession.implicits._
    require(targetW > 0 && targetH > 0)
    ds.mapPartitions { it =>
      it.map { r =>
        val (w, h) = clampedDims(decoder, r.media)
        val hist = new Array[Long](256)
        var sum = 0L
        var first = -1
        var last = 0
        var y = 0
        while (y < targetH) {
          val sy = (y.toLong * h / targetH).toInt
          var x = 0
          while (x < targetW) {
            val sx = (x.toLong * w / targetW).toInt
            val b =
              if (r.media.isEmpty) 0
              else r.media((sy * w + sx) min (r.media.length - 1)) & 0xff
            hist(b) += 1; sum += b
            if (first < 0) first = b
            last = b
            x += 1
          }
          y += 1
        }
        var l2 = 0L
        var kinds = 0
        var j = 0
        while (j < 256) {
          if (hist(j) > 0) { l2 += hist(j) * hist(j); kinds += 1 }
          j += 1
        }
        ResizedStats(r.media_id, r.kind, w, h, sum, l2, kinds,
          first max 0, last)
      }
    }
  }

  /** Blockwise average-hash (aHash) of a media payload: 64 bits, one per
    * cell of the 8×8 nearest-neighbor resample, set iff the cell byte
    * exceeds the integer mean of the 64 cells — packed as four 16-bit
    * band values so the banding stage (and both engines' Hamming
    * arithmetic) never touches a sign bit. */
  final case class PerceptualHash(
      media_id: Long, b0: Int, b1: Int, b2: Int, b3: Int)

  /** Perceptual fingerprint of each payload — the image-near-dup
    * primitive (aHash is public knowledge: mean-threshold the downsampled
    * grid). Same decode + clamp + resample arithmetic as [[resizeStats]]
    * at a fixed 8×8, so the q_blob_decode oracle discipline carries over
    * verbatim; one typed partition-wise pass, blobs never shuffle, only
    * the 20-byte fingerprint row leaves the scan partition. */
  def perceptualHash(
      ds: Dataset[MediaRecord],
      decoder: Decoder = StubDecoder): Dataset[PerceptualHash] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val (w, h) = clampedDims(decoder, r.media)
        val g = new Array[Int](64)
        var sum = 0
        var y = 0
        while (y < 8) {
          val sy = (y.toLong * h / 8).toInt
          var x = 0
          while (x < 8) {
            val sx = (x.toLong * w / 8).toInt
            val b =
              if (r.media.isEmpty) 0
              else r.media((sy * w + sx) min (r.media.length - 1)) & 0xff
            g(y * 8 + x) = b; sum += b
            x += 1
          }
          y += 1
        }
        val mean = sum / 64
        val bands = new Array[Int](4)
        var i = 0
        while (i < 64) {
          if (g(i) > mean) bands(i / 16) |= 1 << (i % 16)
          i += 1
        }
        PerceptualHash(r.media_id, bands(0), bands(1), bands(2), bands(3))
      }
    }
  }

  /** Per-FRAME perceptual fingerprint (media_id, frame_idx, 4×16-bit
    * bands): the payload splits into `frames` byte ranges with the
    * [[frameStats]] boundary arithmetic, and each frame is resampled
    * linearly to 64 cells (cell i = byte at f0 + ((f1−f0)·i)/64) and
    * mean-thresholded — the aHash idea applied per frame, so two videos
    * sharing a near-identical FRAME meet in the Hamming buckets even
    * when their other frames differ. Same seam contract as
    * [[perceptualHash]]: blobs never shuffle, one 24-byte row per frame
    * leaves the scan partition; empty payloads emit no frames (the
    * oracle's `WHERE n > 0`). */
  final case class FramePerceptualHash(
      media_id: Long, frame_idx: Int, b0: Int, b1: Int, b2: Int, b3: Int)

  def framePerceptualHash(
      ds: Dataset[MediaRecord], frames: Int): Dataset[FramePerceptualHash] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { r =>
        val n = r.media.length
        if (n == 0) Iterator.empty
        else (0 until frames).iterator.map { k =>
          val f0 = (n.toLong * k / frames).toInt
          val f1 = math.min(
            math.max(f0 + 1, (n.toLong * (k + 1) / frames).toInt), n)
          val len = f1 - f0
          val g = new Array[Int](64)
          var sum = 0
          var i = 0
          while (i < 64) {
            val b = r.media(f0 + (len.toLong * i / 64).toInt) & 0xff
            g(i) = b; sum += b
            i += 1
          }
          val mean = sum / 64
          val bands = new Array[Int](4)
          i = 0
          while (i < 64) {
            if (g(i) > mean) bands(i / 16) |= 1 << (i % 16)
            i += 1
          }
          FramePerceptualHash(r.media_id, k,
            bands(0), bands(1), bands(2), bands(3))
        }
      }
    }
  }

  /** Adapt the documents table into media records (UTF-8 payloads) so the
    * pipeline runs against driver-provided testdata end-to-end. */
  def documentsAsMedia(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id").as("media_id"), lit("text").as("kind"),
        encode(col("text"), "UTF-8").as("media"))
      .as[MediaRecord]
  }

  /** Catalog entry: features over the adapted corpus. Not SQL-expressible
    * (partition-wise iterator compute) → rows-only driver check; exact
    * values are golden-tested in MultimodalSpec. */
  def featureQuery(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(documentsAsMedia(spark, dir))
      .toDF()
      .orderBy("media_id")
}
