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
          AudioHeader.parseWav(bytes) match {
            case Some(w) =>
              AudioFeatures(id, bytes.length.toLong, "wav", w.channels,
                w.sampleRate, w.bitsPerSample, w.nSamples,
                w.nSamples * 1000L / w.sampleRate)
            case None =>
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
              // clamp before the ×1000: an adversarial mvhd can carry
              // durationTicks near 2^63, and the unclamped multiply
              // wraps negative — duration_ms/n_sampled_1hz must stay
              // non-negative for any payload that parses as mp4
              val safeTicks =
                math.min(h.durationTicks, Long.MaxValue / 1000L)
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
  def frameSampleIndices(nFrames: Column, step: Int): Column =
    sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(step))

  /** 60-bit average-hash of a binary payload — the perceptual-hash
    * near-dup signature for image corpora (aHash: threshold each cell
    * of a grayscale grid at the grid mean; near-dup images differ in
    * few bits, so the SAME banded blocking as text simhash finds
    * candidates sub-quadratically). The pixel-decode step is the
    * documented STUB (a 60-cell grid derived deterministically from
    * the payload's md5 — a real libjpeg resize+grayscale would sit
    * exactly there); everything around it is the production shape:
    * pure codegen'd column math (no UDF), map-only cell hashing,
    * integer mean compare (cell·60 > Σcells — no float), then
    * [[DedupOps.simhashBandPairs]] for the banded candidate join.
    *
    * Shape: explode to one row per grid cell (a bounded 60×), window
    * the per-image total over the id partition, fold the bits back
    * with one groupBy on the SAME key (window and agg share one
    * exchange). Deliberately NOT the higher-order-function form
    * (`transform` + nested `aggregate` over a per-row array): HOFs
    * are interpreted, and Catalyst's project-collapse inlines the
    * array and its total into every consumer — measured 28 s for 5k
    * images once the band join's pushed-down key filter re-derived
    * the whole 60-md5 chain per reference. The exploded form is
    * whole-stage-codegen end to end, the aggregation is a hard
    * barrier no filter rewrites through, and it benched 40× faster.
    *
    * Returns (id, ahash). One shuffle, on id.
    */
  def aHash60(df: DataFrame, id: Column, blob: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pix = df.select(id.as("id"), md5(blob).as("__hex"))
      .select(col("id"), col("__hex"),
        explode(sequence(lit(0), lit(59))).as("__i"))
      .select(col("id"), col("__i"),
        PortableHash.md5PrefixLong(
          concat(col("__hex"), lit("#"), col("__i").cast("string")), 7)
          .as("__p"))
    pix
      .withColumn("__tot", sum(col("__p")).over(Window.partitionBy("id")))
      .groupBy(col("id"))
      .agg(sum(when(col("__p") * 60 > col("__tot"),
        expr("shiftleft(1L, __i)")).otherwise(0L)).as("ahash"))
  }
}
