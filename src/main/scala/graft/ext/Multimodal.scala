package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Decoded media features. For PNG/GIF/BMP payloads width/height are
  * REAL, parsed from the container header ([[ImageHeader]]); for
  * anything else (`format` = "raw") they fall back to a deterministic
  * hash stand-in — audio/video codecs aren't in this container, but
  * the Spark-side plumbing (schema, binary columns, per-partition
  * batch decode) is the production shape either way.
  */
case class MediaFeatures(
    doc_id: Long,
    byte_len: Long,
    fp: String,
    format: String,
    width: Int,
    height: Int,
    n_frames: Int)

/** Decoded audio features; real for RIFF/WAVE payloads
  * ([[AudioHeader]]), hash stand-in (`format` = "raw") otherwise.
  */
case class AudioFeatures(
    doc_id: Long,
    byte_len: Long,
    format: String,
    channels: Int,
    sample_rate: Int,
    bits_per_sample: Int,
    n_samples: Long,
    duration_ms: Long)

/** Decoded video container features; real for MP4/ISO-BMFF payloads
  * ([[VideoHeader]]), hash stand-in (`format` = "raw") otherwise.
  * `n_sampled_1hz` is the 1-frame-per-second sampling plan every
  * vision-language pipeline starts from: how many frames a 1 Hz
  * sampler pulls from this clip (floor(duration)+1, the t=0 frame
  * included).
  */
case class VideoFeatures(
    doc_id: Long,
    byte_len: Long,
    format: String,
    n_tracks: Int,
    timescale: Long,
    duration_ticks: Long,
    duration_ms: Long,
    n_sampled_1hz: Long)

/** Per-sampled-frame pixel statistics (see
  * [[Multimodal.videoFrameStats]]): all integer, closed-form
  * recomputable when frames are DC-only JPEGs.
  */
case class VideoFrameStats(
    doc_id: Long,
    frame_no: Int,
    n_frames: Int,
    width: Int,
    height: Int,
    gray_sum: Long,
    gray_min: Int,
    gray_max: Int)

/** Multimodal-column handling: media as opaque `binary` columns with
  * typed metadata, decoded per-partition.
  *
  * The decode runs in `mapPartitions` — one decoder instance per
  * partition, rows streamed through it in batches, which is the shape
  * a real libjpeg/ffmpeg binding needs (amortized init, bounded
  * memory). At 100 TB the binary column rides in parquet alongside
  * the metadata; partition sizing is controlled by
  * `spark.sql.files.maxPartitionBytes` as usual, and the decode
  * stage is embarrassingly parallel (no shuffle).
  */
object Multimodal {

  /** Attach an opaque binary "media" column (here: utf-8 bytes of a
    * text column standing in for image/audio payloads).
    */
  def withBlob(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("blob", col(textCol).cast("binary"))

  /** One md5-hex per payload — the single definition all stub feature
    * derivations and fingerprints share, so they can't drift.
    */
  def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString

  /** STUB decoder for non-image payloads: deterministic fake features
    * from the payload hash. A real audio/video codec would sit here;
    * everything around it (partition-wise batching, typed output
    * schema) is the production shape.
    */
  def decodeStub(bytes: Array[Byte]): (Long, String, Int, Int, Int) = {
    val hex = md5Hex(bytes)
    val width = (java.lang.Long.parseLong(hex.substring(0, 7), 16) % 1024).toInt
    val height = (java.lang.Long.parseLong(hex.substring(7, 14), 16) % 768).toInt
    val frames = (bytes.length % 30) + 1
    (bytes.length.toLong, hex, width, height, frames)
  }

  /** Decode one payload: real header parse for PNG/GIF/BMP — with
    * real GIF frame counts from the block walk, 1 for the static
    * formats (and for truncated header-only GIFs) — hash stand-in for
    * everything else.
    */
  def decode(id: Long, bytes: Array[Byte]): MediaFeatures =
    ImageHeader.parse(bytes) match {
      case Some((fmt, w, h)) =>
        val fp = md5Hex(bytes)
        val frames =
          if (fmt == "gif") ImageHeader.gifFrames(bytes).getOrElse(1) else 1
        MediaFeatures(id, bytes.length.toLong, fp, fmt, w, h, frames)
      case None =>
        val (len, fp, w, h, f) = decodeStub(bytes)
        MediaFeatures(id, len, fp, "raw", w, h, f)
    }

  /** Per-partition batch decode of (doc_id, blob) rows. */
  def decodeFeatures(df: DataFrame): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // decoder init happens once per partition (amortized, like a
        // real codec context)
        rows.map { case (id, bytes) => decode(id, bytes) }
      }
  }

  /** Per-partition batch decode of (doc_id, blob) audio rows: real
    * RIFF/WAVE header parse ([[AudioHeader]]); non-audio payloads get
    * the deterministic hash stand-in with format "raw". duration_ms
    * is exact long arithmetic (floor), reproducible in SQL.
    */
  def decodeAudio(df: DataFrame): Dataset[AudioFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          AudioHeader.parseWav(bytes).map(w =>
            AudioFeatures(id, bytes.length.toLong, "wav", w.channels,
              w.sampleRate, w.bitsPerSample, w.nSamples,
              w.nSamples * 1000L / w.sampleRate))
          .orElse(FlacDecoder.streamInfo(bytes).map { si =>
            // header-only STREAMINFO census — no frame decode. A
            // 0-rate STREAMINFO parses (the 20-bit field may be 0)
            // but has no duration: fail LOUD with the id, never a
            // bare task-killing ArithmeticException
            if (si.sampleRate == 0)
              throw new IllegalArgumentException(
                s"decodeAudio: id $id FLAC STREAMINFO declares " +
                  "sample rate 0 — corrupt member")
            AudioFeatures(id, bytes.length.toLong, "flac", si.channels,
              si.sampleRate, si.bps, si.totalSamples,
              si.totalSamples * 1000L / si.sampleRate)
          })
          .getOrElse {
              val hex = md5Hex(bytes)
              val rate = 8000 * ((java.lang.Long
                .parseLong(hex.substring(0, 7), 16) % 3).toInt + 1)
              val n = bytes.length % 100 + 1
              AudioFeatures(id, bytes.length.toLong, "raw",
                (java.lang.Long.parseLong(hex.substring(7, 14), 16) % 2)
                  .toInt + 1,
                rate, 16, n.toLong, n * 1000L / rate)
          }
        }
      }
  }

  /** Per-partition batch decode of (doc_id, blob) video rows: real
    * MP4/ISO-BMFF box walk ([[VideoHeader]]); non-video payloads get
    * the deterministic hash stand-in with format "raw". All derived
    * fields are exact long arithmetic (floor), reproducible in SQL.
    */
  def decodeVideo(df: DataFrame): Dataset[VideoFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          VideoHeader.parseMp4(bytes) match {
            case Some(h) =>
              // clamp BOTH sides before the ×1000: an adversarial
              // mvhd can carry durationTicks near ±2^63 (version-1
              // all-ones "unknown duration" reads as -1 through the
              // signed be64), and an unclamped multiply wraps —
              // duration_ms/n_sampled_1hz must stay non-negative for
              // any payload that parses as mp4
              val safeTicks =
                math.min(math.max(h.durationTicks, 0L),
                  Long.MaxValue / 1000L)
              val ms = safeTicks * 1000L / h.timescale
              VideoFeatures(id, bytes.length.toLong, "mp4", h.nTracks,
                h.timescale, h.durationTicks, ms, ms / 1000L + 1L)
            case None =>
              val hex = md5Hex(bytes)
              val ts = 600L
              val dur = java.lang.Long.parseLong(hex.substring(0, 7), 16) %
                36000L
              val ms = dur * 1000L / ts
              VideoFeatures(id, bytes.length.toLong, "raw",
                (java.lang.Long.parseLong(hex.substring(7, 14), 16) % 3)
                  .toInt + 1,
                ts, dur, ms, ms / 1000L + 1L)
          }
        }
      }
  }

  /** REAL video frame sampling + pixel decode over (doc_id, blob)
    * MJPEG-AVI rows: [[MjpegAvi.frameIndex]] walks the container
    * WITHOUT reading frame payloads, every `stride`-th frame decodes
    * through the from-scratch [[JpegDecoder]], and each sampled frame
    * yields integer raster statistics — the frame-extraction pass a
    * video training pipeline runs (decode cost scales with SAMPLED
    * frames, not stored ones). Map-only, per-row memory one clip;
    * loud on non-AVI payloads or undecodable sampled frames, the
    * [[aHashImages]] contract.
    */
  def videoFrameStats(df: DataFrame, stride: Int): Dataset[VideoFrameStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          if (MjpegAvi.parse(bytes).isEmpty)
            throw new IllegalArgumentException(
              s"videoFrameStats: id $id is not an AVI payload " +
                s"(${bytes.length} bytes)")
          // ONE container walk supplies both the count and the
          // sampling input (parse above already validated the header)
          val idx = MjpegAvi.frameIndex(bytes)
          val n = idx.size
          MjpegAvi.sampleFramesFrom(bytes, idx, stride).map { case (no, px) =>
            var sum = 0L
            var mn = 255
            var mx = 0
            var i = 0
            while (i < px.gray.length) {
              val g = px.gray(i)
              sum += g
              if (g < mn) mn = g
              if (g > mx) mx = g
              i += 1
            }
            VideoFrameStats(id, no, n, px.width, px.height, sum, mn, mx)
          }
        }
      }
  }

  /** Resize plumbing: target dims fitting (maxW, maxH) with aspect
    * preserved — integer math only, over the decoded feature columns.
    * A real resampler would be another `mapPartitions` stage over the
    * blob; the dimension contract here is what its output schema
    * carries.
    */
  def withThumbnailDims(features: DataFrame, maxW: Int,
                        maxH: Int): DataFrame = {
    // scale = min(maxW/w, maxH/h, 1) in 1e6 fixed point. floor(a/b)
    // on doubles below 2^52 is the true integer quotient (division is
    // correctly rounded), so this is exactly reproducible in SQL.
    val scale = least(
      floor(lit(maxW.toLong * 1000000L) / greatest(col("width"), lit(1))),
      floor(lit(maxH.toLong * 1000000L) / greatest(col("height"), lit(1))),
      lit(1000000L)).cast("long")
    features
      .withColumn("thumb_w",
        greatest(floor(col("width") * scale / 1000000L), lit(1)).cast("int"))
      .withColumn("thumb_h",
        greatest(floor(col("height") * scale / 1000000L), lit(1)).cast("int"))
  }

  /** Frame sampling plumbing: the frame indices a video decoder would
    * be asked to emit — every `step`-th frame, as an array column.
    */
  def frameSampleIndices(nFrames: Column, step: Int): Column = {
    require(step >= 1, s"frame sampling step ($step) must be >= 1")
    // a 0-frame clip samples NOTHING: the greatest() clamp alone
    // would emit [0], claiming a frame that does not exist
    when(nFrames <= 0, array().cast("array<int>"))
      .otherwise(sequence(lit(0), greatest(nFrames - 1, lit(0)),
        lit(step)))
  }

  /** 60-bit average-hash of a REAL decoded raster — the perceptual
    * near-dup signature for image corpora (aHash: pool the grayscale
    * image to a 10×6 grid, threshold each cell at the grid mean;
    * near-dup images differ in few bits, so the SAME banded blocking
    * as text simhash finds candidates sub-quadratically). All integer
    * arithmetic: cell value = ⌊Σgray/npix⌋ over the cell's pixel
    * block (block x-range [cx·w/10, (cx+1)·w/10), same floor split
    * vertically), bit (cy·10 + cx) set iff cell·60 > Σcells — no
    * float anywhere, so the signature is bit-identical on any engine
    * and the DuckDB oracle replays it in closed form.
    */
  def aHashFromGray(p: Pixels): Long = {
    val cells = cellMeans(p)
    var tot = 0L
    var i = 0
    while (i < 60) { tot += cells(i); i += 1 }
    var hash = 0L
    i = 0
    while (i < 60) {
      if (cells(i) * 60 > tot) hash |= 1L << i
      i += 1
    }
    hash
  }

  /** Floor-split integer mean pool to a gw×gh grid (the shared
    * front end of every perceptual hash here): cell (cx, cy) =
    * ⌊Σgray/npix⌋ over the block x ∈ [cx·w/gw, (cx+1)·w/gw) (same
    * floor split vertically). Requires w ≥ gw and h ≥ gh so every
    * cell is non-empty.
    */
  private def poolGrid(p: Pixels, gw: Int, gh: Int): Array[Long] = {
    require(p.width >= gw && p.height >= gh,
      s"hash pool needs a raster of at least ${gw}x$gh, got " +
        s"${p.width}x${p.height}")
    val cells = new Array[Long](gw * gh)
    var cy = 0
    while (cy < gh) {
      val y0 = cy * p.height / gh
      val y1 = (cy + 1) * p.height / gh
      var cx = 0
      while (cx < gw) {
        val x0 = cx * p.width / gw
        val x1 = (cx + 1) * p.width / gw
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += p.gray(y * p.width + x); x += 1 }
          y += 1
        }
        cells(cy * gw + cx) = s / ((y1 - y0).toLong * (x1 - x0))
        cx += 1
      }
      cy += 1
    }
    cells
  }

  /** The 10×6 pool behind [[aHashFromGray]] / [[dHashFromGray]]. */
  private def cellMeans(p: Pixels): Array[Long] = poolGrid(p, 10, 6)

  /** 54-bit DIFFERENCE hash (dHash) over the same 10×6 cell pool:
    * bit (cy·9 + cx) set iff cell(cx+1, cy) > cell(cx, cy) — the
    * horizontal-gradient sign pattern. Complements [[aHashFromGray]]
    * the way the standard detectors pair them: aHash thresholds
    * against the GLOBAL mean (robust to local noise, blind under
    * global gradients), dHash compares NEIGHBORS (invariant to any
    * global brightness/contrast shift, since a monotone transform
    * preserves every pairwise order). Integer-only, so the DuckDB
    * oracle replays it in closed form.
    */
  def dHashFromGray(p: Pixels): Long = {
    val cells = cellMeans(p)
    var hash = 0L
    var cy = 0
    while (cy < 6) {
      var cx = 0
      while (cx < 9) {
        if (cells(cy * 10 + cx + 1) > cells(cy * 10 + cx))
          hash |= 1L << (cy * 9 + cx)
        cx += 1
      }
      cy += 1
    }
    hash
  }

  /** The pHash DCT basis: K(u, x) = round(1024·cos((2x+1)uπ/64)) for
    * u < 8, x < 32 — the 8 lowest of the 32-point DCT-II basis rows
    * at a FIXED integer scale. Exposed to the query layer so the
    * DuckDB oracle interpolates the IDENTICAL 256 integers into its
    * SQL: both engines then run exact integer arithmetic end to end,
    * and the hash is bit-identical by construction rather than
    * within-epsilon.
    */
  private[graft] val PhK: Array[Array[Int]] = Array.tabulate(8, 32) {
    (u, x) =>
      math.round(1024.0 *
        math.cos((2 * x + 1) * u * math.Pi / 64.0)).toInt
  }

  /** 63-bit DCT perceptual hash (pHash): pool to 32×32, separable
    * integer DCT against [[PhK]] keeping the 8×8 low-frequency
    * block, then threshold each of the 63 AC coefficients against
    * their exact median (sorted index 31 of 63 — odd count, so
    * every median convention agrees). Bit (u·8 + v − 1) set iff
    * coef(u, v) > median. Positive contrast scaling multiplies
    * every coefficient AND the median by the same factor, so the
    * hash is exactly invariant to it; spatial structure lands in
    * few low-frequency coefficients, making pHash the most
    * transform-robust of the three hashes here (aHash: global mean;
    * dHash: neighbor gradients).
    */
  def pHashFromGray(p: Pixels): Long = {
    val cells = poolGrid(p, 32, 32)
    // row pass: r(u)(y) = Σ_x cell(x, y) · K(u, x)
    val r = Array.ofDim[Long](8, 32)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 32) {
        var s = 0L
        var x = 0
        while (x < 32) { s += cells(y * 32 + x) * PhK(u)(x); x += 1 }
        r(u)(y) = s
        y += 1
      }
      u += 1
    }
    // column pass: coef(u, v) = Σ_y r(u)(y) · K(v, y)
    val coef = new Array[Long](64)
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0L
        var y = 0
        while (y < 32) { s += r(u)(y) * PhK(v)(y); y += 1 }
        coef(u * 8 + v) = s
        v += 1
      }
      u += 1
    }
    val ac = java.util.Arrays.copyOfRange(coef, 1, 64)
    java.util.Arrays.sort(ac)
    val med = ac(31)
    var hash = 0L
    var i = 1
    while (i < 64) {
      if (coef(i) > med) hash |= 1L << (i - 1)
      i += 1
    }
    hash
  }

  /** [[pHashFromGray]] over real-decoded (doc_id, blob) image rows —
    * same map-only/loud contract as [[aHashImages]]. Returns
    * (id, phash).
    */
  def pHashImages(df: DataFrame, id: Column, blob: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.as("id"), blob.as("blob")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (i, bytes) =>
          val p = PixelDecoder.decode(bytes).getOrElse(
            throw new IllegalArgumentException(
              s"pHashImages: id $i is not a decodable image " +
                s"(${bytes.length} bytes)"))
          (i, pHashFromGray(p))
        }
      }.toDF("id", "phash")
  }

  /** [[dHashFromGray]] over real-decoded (doc_id, blob) image rows —
    * the gradient twin of [[aHashImages]], same map-only/loud
    * contract. Returns (id, dhash).
    */
  def dHashImages(df: DataFrame, id: Column, blob: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.as("id"), blob.as("blob")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (i, bytes) =>
          val p = PixelDecoder.decode(bytes).getOrElse(
            throw new IllegalArgumentException(
              s"dHashImages: id $i is not a decodable image " +
                s"(${bytes.length} bytes)"))
          (i, dHashFromGray(p))
        }
      }.toDF("id", "dhash")
  }

  /** Per-partition real-decode aHash over (doc_id, blob) image rows:
    * [[PixelDecoder.decode]] (real PNG inflate + filter
    * reconstruction, real BMP rows) feeds [[aHashFromGray]] in the
    * same map pass — once the raster must be materialized anyway,
    * the 60-cell pool is a free tail, so the former stub's separate
    * column-math hashing stage has no reason to exist. A payload the
    * decoder does not own fails LOUDLY with its id (an image-corpus
    * operator silently skipping images is corpus loss): callers with
    * mixed corpora filter on format upstream. Map-only — the single
    * shuffle in an end-to-end near-dup run is the band join's.
    *
    * Returns (id, ahash).
    */
  def aHashImages(df: DataFrame, id: Column, blob: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.as("id"), blob.as("blob")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (i, bytes) =>
          val p = PixelDecoder.decode(bytes).getOrElse(
            throw new IllegalArgumentException(
              s"aHashImages: id $i is not a decodable PNG/BMP/GIF/JPEG " +
                s"(${bytes.length} bytes)"))
          (i, aHashFromGray(p))
        }
      }.toDF("id", "ahash")
  }

  /** VAD-style energy SEGMENTATION per (doc_id, blob) audio row — the
    * voice-activity chunking an ASR training pipeline runs before
    * transcription: decode (same magic dispatch as
    * [[audioFingerprints]]), mark samples with |s| > `threshold`
    * voiced, and emit each MAXIMAL voiced run as
    * (id, seg_no, t_start, n_samples, energy). Map-only — the run
    * detection is a linear pass over each member's samples, no
    * shuffle at any scale; the SQL oracle replays it as an
    * islands-and-gaps window over the closed-form samples.
    */
  def audioSegments(df: DataFrame, id: Column, blob: Column,
                    threshold: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.as("id"), blob.as("blob")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (i, bytes) =>
          val samples = FlacDecoder.firstChannel(bytes)
            .orElse(AudioHeader.linearSamples(bytes)).getOrElse(
              throw new IllegalArgumentException(
                s"audioSegments: id $i is not a decodable audio " +
                  s"payload (${bytes.length} bytes)"))
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Int, Int, Int, Long)]
          var t = 0
          var segNo = 0
          while (t < samples.length) {
            val a = math.abs(samples(t))
            if (a > threshold) {
              val start = t
              var energy = 0L
              while (t < samples.length &&
                math.abs(samples(t)) > threshold) {
                energy += math.abs(samples(t))
                t += 1
              }
              out += ((i, segNo, start, t - start, energy))
              segNo += 1
            } else t += 1
          }
          out
        }
      }.toDF("id", "seg_no", "t_start", "n_samples", "energy")
  }

  /** SHOT-BOUNDARY detection per (doc_id, blob) MJPEG-AVI row — the
    * scene segmentation a video curation pipeline runs before
    * clip-level sampling: consecutive frames decode (stride 1 — this
    * op inherently reads every frame, unlike [[videoFrameStats]]'s
    * sampler), the mean-absolute-pixel-difference against the
    * previous frame scores each transition, and a score >
    * `cutThreshold` opens a new scene. Emits one row per scene:
    * (id, scene_no, f_start, n_frames). Map-only, per-row memory two
    * frames; same loud-failure contract as [[videoFrameStats]].
    */
  def videoScenes(df: DataFrame, cutThreshold: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          // the videoFrameStats pre-check: a non-AVI payload must
          // fail with the MEMBER ID, not an anonymous container-walk
          // error three frames deep (at corpus scale the id is the
          // only way to find the offending blob)
          if (MjpegAvi.parse(bytes).isEmpty)
            throw new IllegalArgumentException(
              s"videoScenes: id $id is not an AVI payload " +
                s"(${bytes.length} bytes)")
          val frames = MjpegAvi.sampleFrames(bytes, stride = 1)
          if (!frames.hasNext)
            throw new IllegalArgumentException(
              s"videoScenes: id $id has no frames")
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Int, Int, Int)]
          var prev: Pixels = null
          var sceneStart = 0
          var sceneNo = 0
          // count while streaming: the frames iterator is LAZY
          // (two-raster memory) and is exhausted after the loop —
          // .size here would read 0 and emit a negative tail length
          var nFrames = 0
          for ((no, px) <- frames) {
            if (prev != null) {
              // width AND height, not pixel count: a 12x8 -> 8x12
              // swap has the same gray.length and would diff across
              // mismatched row strides into garbage scene boundaries
              require(px.width == prev.width && px.height == prev.height,
                s"videoScenes: id $id frame $no changes dimensions")
              var diff = 0L
              var k = 0
              while (k < px.gray.length) {
                diff += math.abs(px.gray(k) - prev.gray(k))
                k += 1
              }
              if (diff / px.gray.length > cutThreshold) {
                out += ((id, sceneNo, sceneStart, no - sceneStart))
                sceneNo += 1
                sceneStart = no
              }
            }
            prev = px
            nFrames = no + 1
          }
          out += ((id, sceneNo, sceneStart, nFrames - sceneStart))
          out
        }
      }.toDF("doc_id", "scene_no", "f_start", "n_frames")
  }

  /** KEYFRAME perceptual hash per (doc_id, blob) MJPEG-AVI row — the
    * video near-dup signature every clip-dedup pipeline starts from:
    * the first sampled frame ([[MjpegAvi.sampleFrames]], so only ONE
    * frame per clip is ever decoded) pools through the same 10×6
    * [[aHashFromGray]] grid as the image pass, making the signature
    * directly joinable with image hashes in the shared banded
    * machinery. Loud on non-AVI payloads or empty clips.
    */
  def videoKeyframeAHash(df: DataFrame, id: Column, blob: Column,
                         stride: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.as("id"), blob.as("blob")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (i, bytes) =>
          if (MjpegAvi.parse(bytes).isEmpty)
            throw new IllegalArgumentException(
              s"videoKeyframeAHash: id $i is not an AVI payload " +
                s"(${bytes.length} bytes)")
          val frames = MjpegAvi.sampleFrames(bytes, stride)
          if (!frames.hasNext)
            throw new IllegalArgumentException(
              s"videoKeyframeAHash: id $i has no sampled frames")
          // the lazy iterator makes this literally ONE decode
          (i, aHashFromGray(frames.next()._2))
        }
      }.toDF("id", "vhash")
  }

  /** Real pixel-decode features per (doc_id, blob) image row — the
    * proof surface for [[PixelDecoder]]: integer raster statistics a
    * closed-form oracle can recompute pixel by pixel. Loud on
    * undecodable payloads (same contract as [[aHashImages]]).
    */
  def decodePixels(df: DataFrame): Dataset[PixelFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val fmt = ImageHeader.parse(bytes).map(_._1).getOrElse("raw")
          val p = PixelDecoder.decode(bytes).getOrElse(
            throw new IllegalArgumentException(
              s"decodePixels: doc $id is not a decodable " +
                s"PNG/BMP/GIF/JPEG (container format: $fmt)"))
          var sum = 0L
          var mn = 255
          var mx = 0
          var i = 0
          while (i < p.gray.length) {
            val g = p.gray(i)
            sum += g
            if (g < mn) mn = g
            if (g > mx) mx = g
            i += 1
          }
          PixelFeatures(id, fmt, p.width, p.height,
            p.gray.length.toLong, sum, mn, mx,
            p.gray(0), p.gray(p.gray.length - 1))
        }
      }
  }

  /** Integer box-downsample by (fx, fy): output pixel (X, Y) is the
    * FLOOR mean of the source block x ∈ [X·fx, min((X+1)·fx, w)) ×
    * y ∈ [Y·fy, min((Y+1)·fy, h)) — edge blocks shrink, nothing is
    * padded or interpolated. Floor-of-mean keeps every output
    * sample a DuckDB closed form (`sum(g) // count(*)` per cell),
    * so resize joins decode in the oracle-verified surface; it is
    * also the standard area-average thumbnail filter.
    */
  def boxDownsample(p: Pixels, fx: Int, fy: Int): Pixels = {
    require(fx >= 1 && fy >= 1, s"boxDownsample: factors ${fx}x$fy")
    val ow = (p.width + fx - 1) / fx
    val oh = (p.height + fy - 1) / fy
    val out = new Array[Int](ow * oh)
    var yy = 0
    while (yy < oh) {
      var xx = 0
      while (xx < ow) {
        var sum = 0L
        var cnt = 0
        var y = yy * fy
        val yEnd = math.min((yy + 1) * fy, p.height)
        while (y < yEnd) {
          var x = xx * fx
          val xEnd = math.min((xx + 1) * fx, p.width)
          while (x < xEnd) {
            sum += p.gray(y * p.width + x)
            cnt += 1
            x += 1
          }
          y += 1
        }
        out(yy * ow + xx) = (sum / cnt).toInt
        xx += 1
      }
      yy += 1
    }
    Pixels(ow, oh, out)
  }

  /** Real decode + [[boxDownsample]] features per (doc_id, blob)
    * image row — the thumbnail-RESIZE proof surface (map-only like
    * [[decodePixels]]; the byte codec and the box filter both run
    * per row, no shuffle).
    */
  def resizePixels(df: DataFrame, fx: Int, fy: Int)
      : Dataset[ResizeFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val p = PixelDecoder.decode(bytes).getOrElse(
            throw new IllegalArgumentException(
              s"resizePixels: doc $id is not a decodable image"))
          val t = boxDownsample(p, fx, fy)
          var sum = 0L
          var i = 0
          while (i < t.gray.length) { sum += t.gray(i); i += 1 }
          ResizeFeatures(id, t.width, t.height, sum,
            t.gray(0), t.gray(t.gray.length - 1))
        }
      }
  }

  /** ONE decode pass yielding the raster statistics and BOTH
    * perceptual signatures (60-bit aHash + 54-bit dHash) per
    * (doc_id, blob) — the curation chain
    * ([[graft.queries.MultimodalQueries]] `curate_images`) needs the
    * stats + aHash, the near-dup rows need one signature each, and at
    * corpus scale the byte-codec decode dominates the map cost, so
    * separate [[decodePixels]]/[[aHashImages]]/[[dHashImages]] passes
    * would pay it three times. Materialized once as the
    * `mm_img_feats` stage and fanned out.
    */
  def curationFeatures(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val p = PixelDecoder.decode(bytes).getOrElse(
            throw new IllegalArgumentException(
              s"curationFeatures: doc $id is not a decodable image"))
          var sum = 0L
          var mn = 255
          var mx = 0
          var i = 0
          while (i < p.gray.length) {
            val g = p.gray(i)
            sum += g
            if (g < mn) mn = g
            if (g > mx) mx = g
            i += 1
          }
          (id, sum, mn, mx, aHashFromGray(p), dHashFromGray(p))
        }
      }.toDF("doc_id", "gray_sum", "gray_min", "gray_max", "ahash",
        "dhash")
  }

  /** ONE-decode-pass video curation features ([[curationFeatures]]'
    * discipline for clips): per (doc_id, blob) MJPEG-AVI row, every
    * frame decodes ONCE and yields the keyframe brightness sum, the
    * shot count at `cutThreshold`, and the keyframe's 10×6 aHash —
    * so a curation chain gates, censuses and near-dups from a single
    * pass instead of three decodes. Map-only, two-frame memory.
    */
  def videoCurationFeatures(df: DataFrame,
                            cutThreshold: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          if (MjpegAvi.parse(bytes).isEmpty)
            throw new IllegalArgumentException(
              s"videoCurationFeatures: id $id is not an AVI payload " +
                s"(${bytes.length} bytes)")
          val frames = MjpegAvi.sampleFrames(bytes, stride = 1)
          if (!frames.hasNext)
            throw new IllegalArgumentException(
              s"videoCurationFeatures: id $id has no frames")
          val key = frames.next()._2
          var sum = 0L
          var i = 0
          while (i < key.gray.length) { sum += key.gray(i); i += 1 }
          var scenes = 1
          var prev = key
          for ((no, px) <- frames) {
            require(px.width == prev.width && px.height == prev.height,
              s"videoCurationFeatures: id $id frame $no changes dims")
            var diff = 0L
            var k = 0
            while (k < px.gray.length) {
              diff += math.abs(px.gray(k) - prev.gray(k))
              k += 1
            }
            if (diff / px.gray.length > cutThreshold) scenes += 1
            prev = px
          }
          (id, sum, scenes.toLong, aHashFromGray(key))
        }
      }.toDF("doc_id", "gray_sum", "n_scenes", "vhash")
  }

  /** Integer DECIMATION resample per (doc_id, blob) audio row — the
    * sample-rate normalization an ASR pipeline runs before batching
    * (48 kHz field recordings → the model's 16 kHz): each block of
    * `factor` consecutive samples reduces to its floor-mean, a
    * trailing partial block to the floor-mean of what remains. The
    * floor is computed as `floor(sum / factor.toDouble)` — exact for
    * any |sum| < 2⁵², identical in SQL, and NOT integer division
    * (which truncates toward zero on negative sums, the
    * engine-divergence trap BENCH notes document). Emits compact
    * per-member stats (n_in, n_out, sum/min/max of the resampled
    * signal) rather than the waveform — the census shape an oracle
    * can hash. Map-only; same decode dispatch and loud contract as
    * [[audioFingerprints]].
    */
  def audioResample(df: DataFrame, id: Column, blob: Column,
                    factor: Int): DataFrame = {
    require(factor >= 2, s"decimation factor $factor")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.as("id"), blob.as("blob")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (i, bytes) =>
          val s = FlacDecoder.firstChannel(bytes)
            .orElse(AudioHeader.linearSamples(bytes)).getOrElse(
              throw new IllegalArgumentException(
                s"audioResample: id $i is not a decodable audio " +
                  s"payload (${bytes.length} bytes)"))
          var sum = 0L
          var mn = Int.MaxValue
          var mx = Int.MinValue
          var nOut = 0
          var at = 0
          while (at < s.length) {
            val end = math.min(at + factor, s.length)
            var bs = 0L
            var k = at
            while (k < end) { bs += s(k); k += 1 }
            val v = math.floor(bs / (end - at).toDouble).toInt
            sum += v
            if (v < mn) mn = v
            if (v > mx) mx = v
            nOut += 1
            at = end
          }
          // an empty decodable clip (data-chunk size 0, FLAC
          // totalSamples 0) has no extremes: emit NULLs — the SQL
          // min/max-over-nothing semantics the oracle replays — not
          // the Int.MaxValue/MinValue loop sentinels (min_out >
          // max_out presented as census data)
          if (nOut == 0) (i, s.length, nOut, sum,
            Option.empty[Int], Option.empty[Int])
          else (i, s.length, nOut, sum, Some(mn), Some(mx))
        }
      }.toDF("id", "n_in", "n_out", "sum_out", "min_out", "max_out")
  }

  /** 60-bit audio energy fingerprint over decoded PCM samples — the
    * perceptual near-dup signature for audio corpora, the twin of
    * [[aHashFromGray]]: split the samples into 60 equal windows
    * ([w·n/60, (w+1)·n/60), floor split), window energy = Σ|sample|,
    * bit w set iff energy·60 > Σenergies. Integer-only, so the DuckDB
    * oracle replays it in closed form. Clips SHORTER than 60 samples
    * return the 0 no-content sentinel (NOT a require — see the
    * consumer contract below).
    */
  def audioFingerprint(samples: Array[Int]): Long = {
    // a clip shorter than the 60 energy windows has no stable
    // signature: fingerprint 0 (the all-below-mean pattern), NOT a
    // require — a single well-formed 50-sample WAV in a corpus must
    // not kill the whole feature pass (the short/unvoiced-members-
    // report-zero contract of audioCurationFeatures). CONSUMER
    // CONTRACT: 0 is the no-content sentinel and must be EXCLUDED
    // from near-dup pair joins (mm_audio_fingerprint / curate_audio
    // filter afp <> 0) — on a corpus with many short clips the
    // shared 0 signature would otherwise emit C(n,2) hamming-0
    // pairs, the quadratic fan-out the df-caps elsewhere prevent.
    // Census/feature consumers keep the 0 rows.
    if (samples.length < 60) return 0L
    val n = samples.length
    val e = new Array[Long](60)
    var w = 0
    while (w < 60) {
      // Long product: w * n wraps Int negative past ~36.4M samples
      // (a 12.6-minute 48 kHz clip), which would index the array at a
      // negative offset and kill the whole feature pass on one clip
      val s0 = (w.toLong * n / 60).toInt
      val s1 = ((w + 1).toLong * n / 60).toInt
      var s = 0L
      var i = s0
      while (i < s1) { s += math.abs(samples(i).toLong); i += 1 }
      e(w) = s
      w += 1
    }
    var tot = 0L
    var i = 0
    while (i < 60) { tot += e(i); i += 1 }
    var fp = 0L
    i = 0
    while (i < 60) {
      if (e(i) * 60 > tot) fp |= 1L << i
      i += 1
    }
    fp
  }

  /** ONE decode pass yielding the VAD census (voiced-sample count +
    * voiced-segment count at `threshold`, the aggregate of
    * [[audioSegments]]) AND the 60-bit energy fingerprint per
    * (doc_id, blob) — [[curationFeatures]]' decode-once discipline
    * for audio: the curation chain gates on the census and near-dups
    * on the fingerprint, and PCM decode dominates both. Members with
    * no voiced run report (0, 0) — the left-join+fill contract of the
    * census form. Materialized once as the `mm_audio_feats` stage.
    */
  def audioCurationFeatures(df: DataFrame,
                            threshold: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (i, bytes) =>
          val samples = FlacDecoder.firstChannel(bytes)
            .orElse(AudioHeader.linearSamples(bytes)).getOrElse(
              throw new IllegalArgumentException(
                s"audioCurationFeatures: id $i is not a decodable " +
                  s"audio payload (${bytes.length} bytes)"))
          var t = 0
          var voiced = 0L
          var segs = 0L
          while (t < samples.length) {
            if (math.abs(samples(t)) > threshold) {
              segs += 1
              while (t < samples.length &&
                math.abs(samples(t)) > threshold) {
                voiced += 1
                t += 1
              }
            } else t += 1
          }
          (i, voiced, segs, audioFingerprint(samples))
        }
      }.toDF("doc_id", "voiced", "n_segments", "afp")
  }

  /** ONE decode pass yielding both energy sums the SNR census rates:
    * voiced (Σ|s| over samples with |s| > `threshold` — run grouping
    * never changes the sum, so this equals the [[audioSegments]]
    * energy total) and total (Σ|s| over every sample). Fused so the
    * dominant PCM decode runs once instead of twice (the
    * decode-once discipline of [[audioCurationFeatures]]); map-only.
    */
  def audioEnergy(df: DataFrame, id: Column, blob: Column,
                  threshold: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.as("id"), blob.as("blob")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (i, bytes) =>
          val samples = FlacDecoder.firstChannel(bytes)
            .orElse(AudioHeader.linearSamples(bytes)).getOrElse(
              throw new IllegalArgumentException(
                s"audioEnergy: id $i is not a decodable audio " +
                  s"payload (${bytes.length} bytes)"))
          var voiced = 0L
          var total = 0L
          var t = 0
          while (t < samples.length) {
            val a = math.abs(samples(t)).toLong
            total += a
            if (a > threshold) voiced += a
            t += 1
          }
          (i, voiced, total)
        }
      }.toDF("id", "voiced_energy", "total_energy")
  }

  /** Per-partition sample decode + fingerprint over (doc_id, blob)
    * audio rows, dispatched by container magic: RIFF/WAVE through
    * [[AudioHeader.linearSamples]] (16-bit integer PCM read directly,
    * G.711 μ-law/A-law expanded through the spec tables, mono IMA
    * ADPCM), `fLaC` through [[FlacDecoder.firstChannel]] (lossless,
    * so decoded samples are bit-identical to the source PCM and the
    * fingerprint is coding-blind). Loud on undecodable payloads,
    * same contract as [[aHashImages]]. Returns (id, afp); map-only.
    */
  def audioFingerprints(df: DataFrame, id: Column,
                        blob: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.as("id"), blob.as("blob")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (i, bytes) =>
          val samples = FlacDecoder.firstChannel(bytes)
            .orElse(AudioHeader.linearSamples(bytes)).getOrElse(
              throw new IllegalArgumentException(
                s"audioFingerprints: id $i is not a decodable 16-bit " +
                  s"PCM/G.711/ADPCM WAV or FLAC (${bytes.length} bytes)"))
          (i, audioFingerprint(samples))
        }
      }.toDF("id", "afp")
  }
}

/** Real pixel-decode statistics (see [[Multimodal.decodePixels]]):
  * all integer, each recomputable by the closed-form oracle.
  */
case class PixelFeatures(
    doc_id: Long,
    format: String,
    width: Int,
    height: Int,
    n_pixels: Long,
    gray_sum: Long,
    gray_min: Int,
    gray_max: Int,
    gray_tl: Int,
    gray_br: Int)

/** Box-downsampled raster statistics (see
  * [[Multimodal.resizePixels]]): all integer, closed-form
  * oracle-recomputable cell by cell.
  */
case class ResizeFeatures(
    doc_id: Long,
    out_w: Int,
    out_h: Int,
    gray_sum: Long,
    gray_tl: Int,
    gray_br: Int)
