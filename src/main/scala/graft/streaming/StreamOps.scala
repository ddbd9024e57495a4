package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch event-time operators
  * (graft.ext.EventWindows): the same plan shapes with a watermark
  * prepended, so a batch query's semantics carry to `readStream`
  * unchanged. State stores are keyed exactly like the batch shuffles,
  * so a 1000-executor cluster partitions streaming state the same way
  * it partitions the batch aggregation.
  */
object StreamOps {

  /** Timestamp → epoch micros — ONE definition of the sub-millisecond
    * flooring shared by every (ts, tie)-ordered keyed operator
    * (funnel, ewma, trend): `getTime` carries millis, `getNanos` the
    * in-second fraction, so the sub-milli micros are
    * (nanos/1000) % 1000. Hoisted because a fix applied to one
    * per-operator copy and not the others would silently desynchronize
    * their shared ordering contract.
    */
  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000 + (t.getNanos / 1000) % 1000

  private def fromMicros(m: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(m, 1000L))
    t.setNanos((Math.floorMod(m, 1000000L) * 1000L).toInt)
    t
  }

  /** Idle-TTL option → GroupStateTimeout policy (every keyed-state
    * operator): a TTL needs processing-time timeouts, no TTL must NOT
    * register them (they make the engine plan timer batches forever).
    */
  private def ttlTimeout(ttl: Option[String]): GroupStateTimeout =
    if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
    else GroupStateTimeout.NoTimeout

  /** Watermarked tumbling event-time aggregation (streaming twin of
    * EventWindows.tumbling). Append-mode ready: windows finalize when
    * the watermark passes their end.
    */
  def tumblingCounts(events: DataFrame, watermark: String,
                     duration: String): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), duration), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(38,2)")).cast("double")
          .as("sum_value"))
      .select(col("window.start").as("wstart"), col("event_type"),
        col("n"), col("sum_value"))

  /** Watermarked session windows per user (streaming twin of
    * EventWindows.sessions).
    */
  def sessionCounts(events: DataFrame, watermark: String,
                    gap: String): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n"))

  /** Watermarked stream-stream interval join (streaming twin of
    * EventWindows.rangeJoin): left rows pair with right rows sharing
    * `key` whose timestamp falls in [left.ts + lowerBound, left.ts +
    * upperBound] — the clicks-within-an-hour-of-impression shape.
    * Both sides carry a watermark and the join condition bounds the
    * time range in BOTH directions, which is what lets the engine
    * evict buffered state: a side's row is dropped once the other
    * side's watermark passes its reach (Spark's stream-stream
    * inner-join state cleanup). Without the two-sided bound the state
    * store grows without limit. Columns are prefixed left_/right_ so
    * self-joins (same source twice) stay unambiguous.
    *
    * Applied to BATCH frames the same plan is a plain time-range join
    * (`withWatermark` is a no-op outside streaming) — that batch twin
    * is what the `ew_interval_join` query oracle-checks, and
    * StreamSpec asserts the streaming run emits exactly the batch
    * rows.
    *
    * @param tsCol event-time column name, present on both inputs
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   lowerBound: String, upperBound: String,
                   watermark: String, tsCol: String = "ts"): DataFrame = {
    require(left.columns.contains(tsCol) && right.columns.contains(tsCol),
      s"both inputs need the event-time column '$tsCol'")
    require(!(left.columns ++ right.columns)
        .exists(c => c.startsWith("left_") || c.startsWith("right_")),
      "inputs must not already carry left_/right_ prefixed columns " +
        "(reserved by intervalJoin's disambiguation)")
    val l = left.columns.foldLeft(left)((d, c) =>
      d.withColumnRenamed(c, s"left_$c")).withWatermark(s"left_$tsCol",
      watermark)
    val r = right.columns.foldLeft(right)((d, c) =>
      d.withColumnRenamed(c, s"right_$c")).withWatermark(s"right_$tsCol",
      watermark)
    l.join(r,
      col(s"left_$key") === col(s"right_$key") &&
        col(s"right_$tsCol") >= col(s"left_$tsCol") +
          expr(s"INTERVAL $lowerBound") &&
        col(s"right_$tsCol") <= col(s"left_$tsCol") +
          expr(s"INTERVAL $upperBound"))
  }

  /** Streaming exact dedup bounded by the watermark horizon — the
    * streaming form of DedupOps.exact: state for a key is dropped
    * once the watermark guarantees no more duplicates can arrive.
    */
  def dedupWithinWatermark(events: DataFrame, watermark: String,
                           keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty,
      "dedupWithinWatermark needs at least one key column — an empty " +
        "key list has no identity to dedup on")
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
  }

  case class BandedDoc(doc_id: Long, simhash: Long, band: Int, key: Long)
  case class NearDup(doc_id: Long, dup_of: Long, band: Int, hamming: Int)

  /** Streaming near-duplicate candidates — the streaming twin of
    * DedupOps.simhashBandPairs: each arriving doc's simhash is banded
    * into `bands` bucket keys, and within each (band, key) bucket the
    * signature is compared against the bucket's remembered signatures
    * (keyed state = the streaming form of the batch band self-join).
    * Emits (doc_id, dup_of, band, hamming) for every match with
    * Hamming ≤ maxHamming against an EARLIER doc; a pair matching in
    * several bands emits once per band (exactly like the batch join
    * before its distinct) — deduplicate downstream if needed.
    *
    * State is one (id, sig) list per bucket, partitioned by bucket
    * key across the cluster like the batch shuffle. `maxPerBucket`
    * caps state (oldest signatures evicted): the blocking argument —
    * bands wide enough that buckets stay small — is exactly what
    * keeps this cap un-hit; a saturated bucket means the band width,
    * not the cap, needs raising. Worst-case retention without a TTL is
    * bands·2^bitsPerBand buckets × maxPerBucket (id, sig) entries;
    * `idleBucketTtl` bounds it in wall-clock too — a bucket no new doc
    * has landed in for that long is dropped (processing-time timeout),
    * trading recall against unbounded state on long-running streams.
    * Run TTL'd queries with a real ProcessingTime trigger: processing-
    * time timeouts make the engine keep planning timer-evaluation
    * batches, so the default run-as-fast-as-possible trigger spins
    * empty micro-batches and `processAllAvailable` never settles —
    * Spark's timeout semantics, not a defect of this operator.
    *
    * Within one micro-batch the group iterator has no arrival order,
    * so rows are paired in ascending doc_id order: same-batch pairs
    * deterministically orient (higher id, dup_of = lower id) no matter
    * how the batch was partitioned. The sort buffers ONE bucket's rows
    * of ONE micro-batch in the task (stored state stays capped at
    * maxPerBucket) — the trigger interval bounds that buffer; size
    * triggers accordingly if a single bucket can receive millions of
    * rows per batch.
    */
  def simhashNearDupCandidates(docs: DataFrame, bands: Int = 4,
                               bitsPerBand: Int = 15,
                               maxHamming: Int = 3,
                               maxPerBucket: Int = 1024,
                               idleBucketTtl: Option[String] = None,
                               bits: Int = 60): Dataset[NearDup] = {
    // the batch twin's geometry guard (DedupOps.simhashBandPairs):
    // bands that don't tile the signature leave its top bits out of
    // every bucket key, silently losing near-dup recall
    require(bands * bitsPerBand == bits,
      s"bands ($bands) x bitsPerBand ($bitsPerBand) must tile the " +
        s"$bits-bit signature exactly — a partial tiling drops the " +
        "top bits from blocking and silently loses recall")
    require(maxPerBucket >= 1,
      s"maxPerBucket ($maxPerBucket) must be at least 1 — 0 is NOT " +
        "the batch twin's unlimited sentinel here: it would remember " +
        "no signatures and emit no pairs while running healthy")
    import docs.sparkSession.implicits._
    val mask = (1L << bitsPerBand) - 1
    val sigMask = if (bits >= 64) -1L else (1L << bits) - 1
    val keys = array((0 until bands).map(b =>
      shiftright(col("simhash"), b * bitsPerBand).bitwiseAND(lit(mask))): _*)
    val timeout = ttlTimeout(idleBucketTtl)
    docs.select(col("doc_id"), col("simhash"),
        posexplode(keys).as(Seq("band", "key")))
      .as[BandedDoc]
      .groupByKey(d => (d.band, d.key))
      .flatMapGroupsWithState[List[(Long, Long)], NearDup](
        OutputMode.Append, timeout) {
        (_, rows, state) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var seen = state.getOption.getOrElse(Nil)
            val out = List.newBuilder[NearDup]
            rows.toSeq.sortBy(_.doc_id).foreach { d =>
              // at-least-once sources replay rows: a doc already
              // remembered in this bucket emitted its pairs on first
              // delivery, and every doc that arrived since paired
              // against it on THEIR arrival — re-pairing a replayed
              // doc would re-emit its NearDup rows (plus reversed-
              // orientation duplicates against the docs in between),
              // so known docs are skipped whole, making pair output
              // replay-idempotent like the ewma/funnel twins — WHILE
              // the doc remains remembered: a doc evicted by the
              // maxPerBucket cap (or a TTL-removed bucket) is
              // forgotten, so an at-least-once redelivery after
              // eviction re-pairs it (duplicate rows, possibly
              // reversed orientation). Size the cap to the source's
              // redelivery horizon if exact once-per-pair matters
              if (!seen.exists(_._1 == d.doc_id)) {
                seen.foreach { case (id0, sig0) =>
                  // Hamming over the SIGNATURE bits only (the batch
                  // twin's hammingDistance(a, b, bits) mask): a
                  // 64-bit value whose low `bits` match a neighbor
                  // must not be rejected for garbage above the
                  // signature — the bands only ever read the low
                  // bits, so unmasked verification silently loses
                  // exactly the pairs the blocking found
                  val h = java.lang.Long.bitCount(
                    (sig0 ^ d.simhash) & sigMask)
                  if (h <= maxHamming)
                    out += NearDup(d.doc_id, id0, d.band, h)
                }
                seen = ((d.doc_id, d.simhash) :: seen).take(maxPerBucket)
              }
            }
            state.update(seen)
            idleBucketTtl.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }

  /** Streaming twin of the MULTIMODAL image near-dup pass
    * (`mm_ahash_pairs`): decode each arriving (doc_id, blob) image
    * payload to its 60-bit aHash MAP-SIDE — the per-row byte codecs
    * are stateless, so [[graft.ext.Multimodal.aHashImages]] runs
    * unchanged on a streaming frame — then feed the SAME banded
    * keyed-state candidate machinery as the text simhash twin: one
    * operator family, three signature sources (text simhash, image
    * aHash, audio fingerprint). Defaults mirror the batch band join
    * (4 bands × 15 bits over the 60-bit signature, Hamming ≤ 3);
    * state shape, replay idempotency, TTL and ordering caveats are
    * [[simhashNearDupCandidates]]'s verbatim, since this IS that
    * operator behind a decode projection.
    */
  def aHashNearDupCandidates(blobs: DataFrame, bands: Int = 4,
                             bitsPerBand: Int = 15,
                             maxHamming: Int = 3,
                             maxPerBucket: Int = 1024,
                             idleBucketTtl: Option[String] = None)
      : Dataset[NearDup] =
    // POISON-PILL NOTE (all five decode wrappers): the map-side
    // decode inherits the batch codecs' throw-on-undecodable-blob
    // contract, and in a stream that throw is worse than a failed
    // job — the restarted query replays the same offset range from
    // the checkpoint, hits the same blob, and wedges until the input
    // is fixed (the failure mode bitmapDistinctStream's RANGE
    // CONTRACT spells out). Gate a stream of untrusted blobs with a
    // validity filter upstream (the curate_* queries' census shape)
    // rather than feeding raw bytes straight in.
    simhashNearDupCandidates(
      graft.ext.Multimodal.aHashImages(blobs, col("doc_id"),
          col("blob"))
        .select(col("id").as("doc_id"), col("ahash").as("simhash")),
      bands, bitsPerBand, maxHamming, maxPerBucket, idleBucketTtl)

  /** Streaming twin of the GRADIENT-hash image near-dup pass
    * (`mm_dhash_pairs`): map-side decode to the 54-bit dHash, then
    * the shared banded machinery at the batch row's geometry
    * (3 bands × 18 bits, Hamming ≤ 2). See
    * [[aHashNearDupCandidates]] — same operator, the
    * brightness-invariant signature.
    */
  def dHashNearDupCandidates(blobs: DataFrame, bands: Int = 3,
                             bitsPerBand: Int = 18,
                             maxHamming: Int = 2,
                             maxPerBucket: Int = 1024,
                             idleBucketTtl: Option[String] = None)
      : Dataset[NearDup] =
    simhashNearDupCandidates(
      graft.ext.Multimodal.dHashImages(blobs, col("doc_id"),
          col("blob"))
        .select(col("id").as("doc_id"), col("dhash").as("simhash")),
      bands, bitsPerBand, maxHamming, maxPerBucket, idleBucketTtl,
      bits = 54)

  /** Streaming twin of the DCT perceptual-hash near-dup pass
    * (`mm_phash_pairs`): map-side decode to the 63-bit pHash, then
    * the shared banded machinery at the batch row's geometry
    * (3 bands × 21 bits, Hamming ≤ 2). See
    * [[aHashNearDupCandidates]].
    */
  def pHashNearDupCandidates(blobs: DataFrame, bands: Int = 3,
                             bitsPerBand: Int = 21,
                             maxHamming: Int = 2,
                             maxPerBucket: Int = 1024,
                             idleBucketTtl: Option[String] = None)
      : Dataset[NearDup] =
    simhashNearDupCandidates(
      graft.ext.Multimodal.pHashImages(blobs, col("doc_id"),
          col("blob"))
        .select(col("id").as("doc_id"), col("phash").as("simhash")),
      bands, bitsPerBand, maxHamming, maxPerBucket, idleBucketTtl,
      bits = 63)

  /** Streaming twin of the audio near-dup pass
    * (`mm_audio_fingerprint`): RIFF-walk + 60-window energy
    * fingerprint per arriving (doc_id, blob) WAV, then the shared
    * banded machinery. See [[aHashNearDupCandidates]].
    */
  def audioNearDupCandidates(blobs: DataFrame, bands: Int = 4,
                             bitsPerBand: Int = 15,
                             maxHamming: Int = 3,
                             maxPerBucket: Int = 1024,
                             idleBucketTtl: Option[String] = None)
      : Dataset[NearDup] =
    simhashNearDupCandidates(
      graft.ext.Multimodal.audioFingerprints(blobs, col("doc_id"),
          col("blob"))
        .select(col("id").as("doc_id"), col("afp").as("simhash")),
      bands, bitsPerBand, maxHamming, maxPerBucket, idleBucketTtl)

  /** Streaming twin of the VIDEO keyframe near-dup pass
    * (`mm_video_dup_pairs`): per arriving (doc_id, blob) MJPEG-AVI
    * clip, decode ONLY the first sampled frame into the 10×6 aHash
    * ([[graft.ext.Multimodal.videoKeyframeAHash]]), then the shared
    * banded machinery at the batch geometry. Completes the near-dup
    * family's stream coverage: text, image (3 hashes), audio, video.
    */
  def videoNearDupCandidates(blobs: DataFrame, stride: Int = 4,
                             bands: Int = 4,
                             bitsPerBand: Int = 15,
                             maxHamming: Int = 3,
                             maxPerBucket: Int = 1024,
                             idleBucketTtl: Option[String] = None)
      : Dataset[NearDup] =
    simhashNearDupCandidates(
      graft.ext.Multimodal.videoKeyframeAHash(blobs, col("doc_id"),
          col("blob"), stride)
        .select(col("id").as("doc_id"), col("vhash").as("simhash")),
      bands, bitsPerBand, maxHamming, maxPerBucket, idleBucketTtl)

  case class FunnelEvent(key: Long, ts: java.sql.Timestamp, tie: Long,
                         etype: String)
  case class FunnelHit(key: Long, tie: Long, ts: java.sql.Timestamp,
                       prev_ts: java.sql.Timestamp)
  /** Per-key funnel state: the greedy-latest chain timestamps plus
    * the (ts, tie) of the newest emitted hit — the replay guard that
    * keeps emission idempotent under at-least-once delivery.
    */
  case class FunnelState(chain: Map[Int, Long], emTs: Long, emTie: Long)

  /** Streaming funnel detection — the continuous twin of
    * EventWindows.funnel: per-key state is one greedy-latest
    * timestamp per prefix step (O(steps) longs), updated as events
    * arrive; a final-step event emits the moment its chain check
    * passes — the real-time conversion tracker. Chain semantics are
    * the batch operator's exactly: a step extends the chain iff the
    * previous step's greedy-latest timestamp is within `withinMicros`.
    * Within a micro-batch rows process in (ts, tie) order; for
    * in-order arrival per key the emitted set equals the batch
    * funnel's rows (pinned in StreamSpec). Late events update state
    * when they arrive (arrival-order semantics) — bound lateness
    * upstream with a watermark if exact replay parity matters. The
    * chain check requires the predecessor to PRECEDE the event
    * (p ≤ t), matching the batch window's strictly-preceding frame —
    * a late final step cannot complete against a chain mate from its
    * own future.
    *
    * REPLAY GUARD: state remembers the newest emitted hit's (ts, tie)
    * per key, and a final-step event at or below that mark never
    * re-emits — so an at-least-once source redelivering a batch
    * produces no duplicate FunnelHits (chain updates were already
    * idempotent via max). The flip side of the guard is that a
    * genuinely LATE final step ordered before an already-emitted hit
    * is suppressed too (the two are indistinguishable at the
    * operator): bound lateness upstream with a watermark if late
    * final-step conversions must still count.
    * `idleKeyTtl` bounds state on unbounded key spaces
    * (users/sessions): a key with no events for that long drops its
    * chain (processing-time timeout, same contract and trigger
    * caveats as [[simhashNearDupCandidates]]'s idleBucketTtl).
    */
  def funnelStream(events: DataFrame, steps: Seq[String],
                   withinMicros: Long,
                   idleKeyTtl: Option[String] = None): Dataset[FunnelHit] = {
    require(steps.size >= 2 && steps.distinct.size == steps.size,
      "need >= 2 distinct steps")
    import events.sparkSession.implicits._
    val idx = steps.zipWithIndex.toMap
    val last = steps.size - 1
    val timeout = ttlTimeout(idleKeyTtl)
    events
      // NULL guard BEFORE the typed encoder (batch parity + poison
      // pill): the batch funnel lets a NULL-ts row flow through
      // harmlessly (when(valid, ts) yields NULL, the windows skip
      // it), but here micros(e.ts) would NPE, fail the micro-batch,
      // and checkpoint replay re-hits the same row forever. NULL
      // key/tie would crash the primitive-field encoder the same
      // way; the batch op's NULL-key group has no streaming
      // equivalent (state keys are concrete), a documented
      // divergence.
      .filter(col("key").isNotNull && col("ts").isNotNull &&
        col("tie").isNotNull)
      .select(col("key").cast("long").as("key"), col("ts"),
        col("tie").cast("long").as("tie"), col("etype"))
      .as[FunnelEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState[FunnelState, FunnelHit](
        OutputMode.Append, timeout) {
        (_, rows, state) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val st0 = state.getOption.getOrElse(
              FunnelState(Map.empty, Long.MinValue, Long.MinValue))
            var chain = st0.chain
            var emTs = st0.emTs
            var emTie = st0.emTie
            val out = List.newBuilder[FunnelHit]
            rows.toSeq.sortBy(e => (micros(e.ts), e.tie)).foreach { e =>
              idx.get(e.etype).foreach { i =>
                val t = micros(e.ts)
                // p <= t: the predecessor must precede the event in
                // event time (batch parity for late arrivals)
                if (i == last) {
                  // replay guard: only emit strictly past the newest
                  // emitted (ts, tie) — redelivered final steps no-op
                  if (t > emTs || (t == emTs && e.tie > emTie))
                    chain.get(last - 1)
                      .filter(p => p <= t && t <= p + withinMicros)
                      .foreach { p =>
                        out += FunnelHit(e.key, e.tie, e.ts, fromMicros(p))
                        emTs = t; emTie = e.tie
                      }
                } else if (i == 0 ||
                    chain.get(i - 1)
                      .exists(p => p <= t && t <= p + withinMicros)) {
                  chain = chain.updated(i,
                    math.max(t, chain.getOrElse(i, Long.MinValue)))
                }
              }
            }
            state.update(FunnelState(chain, emTs, emTie))
            idleKeyTtl.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }

  case class PackIn(doc_id: Long, chunk_idx: Int, n_tokens: Long,
                    shard: Long)
  case class PackOut(doc_id: Long, chunk_idx: Int, n_tokens: Long,
                     shard: Long, seq_id: Long, seq_offset: Long)

  /** Streaming sequence packer — the continuous form of
    * TextAnalysis.packSequences: chunks are sharded by the SAME salted
    * doc-id hash as the batch packer, and each shard's keyed state is
    * one Long (the running token count), so a chunk's training
    * sequence is assigned the moment it arrives — the
    * pack-as-you-ingest shape of a streaming pretraining pipeline.
    * State per key is O(1) and never grows; shards partition across
    * the cluster like the batch window's exchange.
    *
    * Chunks pack in ARRIVAL order (the streaming semantics); within a
    * micro-batch rows are ordered by (doc_id, chunk_idx) so a batch's
    * assignment is deterministic under any partitioning. When a
    * shard's chunks arrive in (doc_id, chunk_idx) order the output
    * equals the batch packer's row for row (pinned in StreamSpec).
    *
    * LATE-ARRIVAL CONTRACT (read before pointing an out-of-order
    * source at this): there is NO reordering buffer — state is one
    * running token count, so a chunk that arrives in a later
    * micro-batch than its (doc_id, chunk_idx) order implies is packed
    * at its ARRIVAL position, diverging from the batch packer's
    * assignment for that chunk and every chunk after it in the shard.
    * Token accounting stays exact (offsets within each sequence are
    * still gapless and every chunk is packed exactly once — pinned in
    * StreamSpec's shuffled-batch test); only the chunk→sequence
    * mapping differs. If batch/stream assignment parity matters,
    * deliver per-shard in order (e.g. partition the upstream by the
    * same salted hash) or re-pack with the batch operator after
    * landing. This is the same tradeoff every streaming packer makes:
    * buffering for reorder would hold unbounded state on a gap that
    * never fills.
    *
    * DELIVERY CONTRACT (the [[runningUserCounts]] discipline): chunks
    * pack once per DELIVERY. Checkpoint-recovery replays are safe —
    * the running count rolls back atomically with the source offsets,
    * so a re-executed micro-batch reproduces its original output —
    * but a SOURCE-level duplicate (a producer retry emitting the same
    * (doc_id, chunk_idx) in a new batch) packs again and shifts every
    * later assignment in its shard. State here is deliberately one
    * Long per shard; a full identity guard would grow with the corpus.
    * On an at-least-once producer, dedup upstream — chunks carry
    * exactly the identity [[dedupWithinWatermark]] needs
    * ((doc_id, chunk_idx)).
    */
  def packSequencesStream(chunks: DataFrame, capacity: Int, shards: Int,
                          salt: String): Dataset[PackOut] = {
    require(capacity >= 1 && shards >= 1,
      "capacity and shards must be positive")
    import chunks.sparkSession.implicits._
    chunks
      .select(col("doc_id").cast("long").as("doc_id"),
        col("chunk_idx").cast("int").as("chunk_idx"),
        col("n_tokens").cast("long").as("n_tokens"),
        (graft.ext.PortableHash.md5PrefixLong(
          concat(lit(salt), col("doc_id").cast("string")), 7)
          % shards).as("shard"))
      .as[PackIn]
      .groupByKey(_.shard)
      .flatMapGroupsWithState[Long, PackOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, rows, state) =>
          var cum = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(c => (c.doc_id, c.chunk_idx))
            .map { c =>
              val r = PackOut(c.doc_id, c.chunk_idx, c.n_tokens, c.shard,
                cum / capacity, cum % capacity)
              cum += c.n_tokens
              r
            }
          state.update(cum)
          out.iterator
      }
  }

  case class UserEvent(user_id: Long, ts: java.sql.Timestamp,
                       event_type: String)
  case class UserAgg(user_id: Long, n_events: Long,
                     last_ts: java.sql.Timestamp)

  /** Custom keyed state via flatMapGroupsWithState: running per-user
    * event count + last-seen timestamp, emitted on every update. The
    * KeyValueGroupedDataset shape is the Spark-native replacement for
    * hand-rolled per-key accumulators: state lives in the state store,
    * partitioned by key, checkpointed, and recoverable.
    *
    * COUNTING CONTRACT: n_events counts DELIVERIES — an
    * at-least-once source that redelivers a micro-batch counts it
    * again (there is no per-event identity here to dedup on, and the
    * order-safe siblings' (ts, tie) high-water guard cannot apply:
    * distinct events may legitimately share a timestamp). For
    * exactly-once distinct counting, key events by id and use
    * [[bitmapDistinctStream]], whose set union is replay-idempotent.
    */
  def runningUserCounts(events: Dataset[UserEvent]): Dataset[UserAgg] = {
    import events.sparkSession.implicits._
    // full-resolution order key: maxBy(getTime) alone ties at the
    // MILLISECOND, keeping whichever event the iterator yields first
    // — a partition-dependent last_ts for same-ms events
    def tsKey(t: java.sql.Timestamp): (Long, Int) = (t.getTime, t.getNanos)
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserAgg, UserAgg](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[UserEvent], state: GroupState[UserAgg]) =>
          val evs = rows.toSeq
          // no epoch-0 sentinel: a key whose events are all pre-1970
          // must report its true max, not 1970-01-01
          val batchMax = evs.map(_.ts).maxBy(tsKey)
          val lastTs = state.getOption match {
            case Some(p) if Ordering[(Long, Int)]
              .gt(tsKey(p.last_ts), tsKey(batchMax)) => p.last_ts
            case _ => batchMax
          }
          val next = UserAgg(user,
            state.getOption.map(_.n_events).getOrElse(0L) + evs.size,
            lastTs)
          state.update(next)
          Iterator.single(next)
      }
  }

  case class SeriesEvent(key: Long, ts: java.sql.Timestamp, tie: Long,
                         value: Double)
  case class EwmaPoint(key: Long, ts: java.sql.Timestamp, tie: Long,
                       n_events: Long, ewma_micros: Long)
  /** O(1) per-key EWMA state: the integer accumulator plus the
    * (ts, tie) high-water mark that makes the fold order-safe and
    * replay-idempotent.
    */
  case class EwmaState(acc: Long, n: Long, hwTs: Long, hwTie: Long)

  /** Streaming twin of [[graft.ext.TimeSeries.ewmaFixed]]: the per-key
    * integer EWMA recursion `acc ← (acc + x) div 2` applied as events
    * arrive, emitting the updated point per fold step — the real-time
    * feature value a serving layer reads.
    *
    * Order discipline: within a micro-batch rows fold in (ts, tie)
    * order; across batches the state's (ts, tie) HIGH-WATER MARK
    * drops any event at or below the newest folded event. That one
    * rule buys both batch parity and replay idempotency: for in-order
    * delivery per key the final point per key is exactly the batch
    * `ewmaFixed` row, and an at-least-once source redelivering a
    * batch re-folds nothing (every redelivered event sits at or below
    * the mark). The flip side is that a genuinely LATE event is
    * dropped rather than retro-folded — an order-sensitive recursion
    * cannot re-run its past without unbounded event retention; bound
    * lateness upstream with a watermark and sort within it if late
    * events must count.
    *
    * State is O(1) longs per key (contrast: the funnel's O(steps)),
    * partitioned by the same key the batch groupBy shuffles on.
    * `idleKeyTtl` bounds the key space exactly as
    * [[funnelStream]]'s guard does.
    */
  def ewmaStream(events: DataFrame,
                 idleKeyTtl: Option[String] = None): Dataset[EwmaPoint] = {
    import events.sparkSession.implicits._
    val timeout = ttlTimeout(idleKeyTtl)
    events
      // the batch twin's documented policy (ewmaFixed filters NULL
      // ts/value before the fold) — and a poison-pill guard: a NULL
      // in any of these hits SeriesEvent's primitive fields (encoder
      // error) or micros() (NPE), failing every replay of the same
      // checkpointed offsets. NULL keys are dropped too (state keys
      // are concrete — the batch NULL-key group has no streaming
      // equivalent; documented divergence).
      .filter(col("key").isNotNull && col("ts").isNotNull &&
        col("tie").isNotNull && col("value").isNotNull)
      .select(col("key").cast("long").as("key"), col("ts"),
        col("tie").cast("long").as("tie"),
        col("value").cast("double").as("value"))
      .as[SeriesEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState[EwmaState, EwmaPoint](
        OutputMode.Append, timeout) {
        (key, rows, state) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(
              EwmaState(0L, 0L, Long.MinValue, Long.MinValue))
            val out = List.newBuilder[EwmaPoint]
            rows.toSeq.sortBy(e => (micros(e.ts), e.tie)).foreach { e =>
              val t = micros(e.ts)
              if (t > st.hwTs || (t == st.hwTs && e.tie > st.hwTie)) {
                // batch parity: floor() then SQL `div` truncation —
                // Scala / on Long truncates identically
                val x = math.floor(e.value * 1e6).toLong
                val acc = if (st.n == 0L) x else (st.acc + x) / 2
                st = EwmaState(acc, st.n + 1, t, e.tie)
                out += EwmaPoint(key, e.ts, e.tie, st.n, acc)
              }
            }
            state.update(st)
            idleKeyTtl.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }

  case class TrendPoint(key: Long, ts: java.sql.Timestamp, tie: Long,
                        n: Long, slope_micro: Option[Long],
                        mean_centi: Long)
  /** O(1) per-key OLS state: five integer moments over (x seconds
    * re-based to the key's FIRST event, y centi-units) plus the
    * (ts, tie) high-water mark and the re-base origin. */
  case class TrendState(x0Micros: Long, n: Long, sx: Long, sy: Long,
                        sxy: Long, sxx: Long, hwTs: Long, hwTie: Long)

  /** Streaming twin of [[graft.ext.TimeSeries.linearTrendMicro]]: the
    * per-key OLS drift updated as events arrive — the live "is this
    * metric rising" signal, with O(1) longs of state per key where a
    * naive approach would retain the key's whole history.
    *
    * Exactness across re-base origins: the batch op re-bases x to the
    * key's global MIN timestamp, this twin to the FIRST event it
    * folds — but num = nΣxy − ΣxΣy and den = nΣxx − (Σx)² are exactly
    * shift-invariant in integer arithmetic (the c-terms cancel
    * algebraically, not approximately), so for in-order delivery the
    * final num/den — and hence slope_micro and mean_centi — are
    * bit-identical to the batch row. The same (ts, tie) high-water
    * rule as [[ewmaStream]] buys at-least-once replay idempotency;
    * late events are dropped, not retro-folded.
    *
    * Numeric contract: moments live in LONGS, so n·span² must stay
    * below 2⁶³ (span in seconds from the key's first event) — years
    * of per-key span at millions of events. The batch op's
    * decimal(38,0) sums are the unbounded-exact form; use it for
    * offline backfills.
    */
  def trendStream(events: DataFrame,
                  idleKeyTtl: Option[String] = None): Dataset[TrendPoint] = {
    import events.sparkSession.implicits._
    val timeout = ttlTimeout(idleKeyTtl)
    events
      // same NULL policy + poison-pill guard as ewmaStream (the
      // batch linearTrendMicro filters NULL ts/value so n describes
      // the rows the moments summed)
      .filter(col("key").isNotNull && col("ts").isNotNull &&
        col("tie").isNotNull && col("value").isNotNull)
      .select(col("key").cast("long").as("key"), col("ts"),
        col("tie").cast("long").as("tie"),
        col("value").cast("double").as("value"))
      .as[SeriesEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState[TrendState, TrendPoint](
        OutputMode.Append, timeout) {
        (key, rows, state) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(
              TrendState(0L, 0L, 0L, 0L, 0L, 0L,
                Long.MinValue, Long.MinValue))
            val out = List.newBuilder[TrendPoint]
            rows.toSeq.sortBy(e => (micros(e.ts), e.tie)).foreach { e =>
              val t = micros(e.ts)
              if (t > st.hwTs || (t == st.hwTs && e.tie > st.hwTie)) {
                val x0 = if (st.n == 0L) t else st.x0Micros
                // seconds since the key's first event — nonnegative
                // for in-order delivery, so / IS floor, matching the
                // batch op's div-of-nonnegative
                val x = (t - x0) / 1000000L
                val y = math.floor(e.value * 100).toLong
                // exact-or-loud: the batch twin accumulates these
                // moments in decimal(38,0); Scala Long arithmetic
                // would silently WRAP instead (sxx ~ x² per event — a
                // multi-year span at second resolution wraps within a
                // few hundred events) and emit confidently wrong
                // slopes, so every accumulation is the checked form
                st = try {
                  import java.lang.Math.{addExact, multiplyExact}
                  TrendState(x0, st.n + 1, addExact(st.sx, x),
                    addExact(st.sy, y),
                    addExact(st.sxy, multiplyExact(x, y)),
                    addExact(st.sxx, multiplyExact(x, x)), t, e.tie)
                } catch {
                  case _: ArithmeticException =>
                    throw new IllegalArgumentException(
                      s"StreamOps.trendStream: key $key moment sums " +
                        s"exceed the long range at n=${st.n + 1}, " +
                        s"x=${x}s since the key's first event — " +
                        "window the series or rescale; the batch " +
                        "twin's decimal(38,0) sums have no such bound")
                }
                // the same finish as the batch op: exact integer
                // num/den, one IEEE divide (BigInt keeps the products
                // exact; toDouble is correctly rounded like Spark's
                // decimal→double cast)
                val num = BigInt(st.n) * st.sxy - BigInt(st.sx) * st.sy
                val den = BigInt(st.n) * st.sxx - BigInt(st.sx) * st.sx
                val slope = if (den > 0)
                  Some(math.floor(
                    num.toDouble / den.toDouble * 1000000.0).toLong)
                else None
                out += TrendPoint(key, e.ts, e.tie, st.n, slope,
                  st.sy / st.n)
              }
            }
            state.update(st)
            idleKeyTtl.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }

  /** Streaming twin of [[graft.ext.TimeSeries.ohlcBars]]: watermarked
    * tumbling OHLC bars as a NATIVE windowed aggregation — no custom
    * state function. The six aggregates (min_by/max_by over the
    * shared packed (ts, tie) Decimal(38,0) order, min/max/sum/count
    * over micro-unit longs) are declarative, so the state store
    * holds one fixed-width buffer per live (key, bucket) and merges
    * partial buffers exactly like the batch HashAggregate — the
    * same ordering definition and aggregation list as the batch op
    * (one implementation, two runtimes), hence bar-for-bar batch
    * equivalence for events inside the watermark, which StreamSpec
    * pins under shuffled micro-batch delivery.
    *
    * Append-mode ready: a bar finalizes (and its state evicts) when
    * the watermark passes its window end — the archival-rollup
    * lifecycle. Input columns: `key`, `ts`, `value`, `tie`.
    */
  def ohlcStream(events: DataFrame, watermark: String,
                 bucket: String): DataFrame =
    graft.ext.TimeSeries.requireIntegralTie(
      events
        // batch parity (ohlcBars drops NULL ts/value): unfiltered, a
        // NULL value makes a half-populated bar (open/close NULL via
        // the skipped packed order, volume real) and a NULL ts makes
        // a NULL-window group append mode can never finalize
        .filter(col("ts").isNotNull && col("value").isNotNull)
        .withWatermark("ts", watermark)
        .withColumn("__tie", col("tie")), "StreamOps.ohlcStream")
      .select(col("key"), window(col("ts"), bucket).as("__w"),
        graft.ext.TimeSeries.microValue.as("__v"),
        graft.ext.TimeSeries.packedTsTieOrder.as("__o"))
      .groupBy(col("key"), col("__w"))
      .agg(graft.ext.TimeSeries.ohlcAggs.head,
        graft.ext.TimeSeries.ohlcAggs.tail: _*)
      .select(col("key"), col("__w.start").as("bucket"),
        col("open_micros"), col("high_micros"), col("low_micros"),
        col("close_micros"), col("volume_micros"), col("n"))

  case class FreqItem(shard: Int, item: String)
  case class FreqSummary(shard: Int, item: String, est: Long,
                         shard_n: Long)
  /** ≤ k Misra–Gries counters plus the shard's exact stream length
    * (the denominator of the n/(k+1) guarantee).
    */
  case class FreqState(counters: Map[String, Long], n: Long)

  /** Streaming twin of [[graft.ext.FreqItemsAggregator]]: per-shard
    * Misra–Gries counters maintained as items arrive, re-emitting the
    * shard's summary after each micro-batch that touches it — the
    * live trending-items / hot-keys monitor.
    *
    * Sharding discipline: the item HASH picks the shard, so every
    * occurrence of an item folds into the same ≤ k-counter state and
    * the per-shard guarantee (est ≤ exact; exact − est ≤
    * shard_n/(k+1)) holds independently per shard — strictly tighter
    * than one global sketch, and the union of shard summaries is the
    * serving surface with no merge step. State is O(shards · k)
    * TOTAL, fixed at deployment: the stream can run forever without
    * state growth (`idleKeyTtl` is still available for bursty shard
    * spaces).
    *
    * The fold step IS the batch aggregator's `reduce` (one
    * implementation, two runtimes). Within a micro-batch rows fold in
    * item-sorted order (the sibling operators' determinism
    * discipline): Misra–Gries is order-dependent when counters are
    * full, and the raw group iterator concatenates shuffle-map
    * outputs in nondeterministic fetch order — unsorted, a task retry
    * over the identical input could surface a DIFFERENT summary. The
    * theorem bounds hold under any order; sorting pins WHICH valid
    * summary is produced. A single-shard stream whose batches arrive
    * item-sorted (or one item per batch) reproduces the sequential
    * batch fold exactly — StreamSpec pins that equivalence and the
    * theorem bounds under multi-batch delivery.
    */
  def freqItemsStream(items: DataFrame, k: Int, shards: Int,
                      idleKeyTtl: Option[String] = None)
      : Dataset[FreqSummary] = {
    import items.sparkSession.implicits._
    require(k >= 1 && shards >= 1, "k and shards must be positive")
    val mg = new graft.ext.FreqItemsAggregator(k)
    val timeout = ttlTimeout(idleKeyTtl)
    items
      .select(pmod(hash(col("item")), lit(shards)).cast("int")
          .as("shard"),
        col("item").cast("string").as("item"))
      .as[FreqItem]
      .groupByKey(_.shard)
      // Update, not Append: each emission REPLACES the shard's prior
      // summary (the patchApply/bitmapDistinct emit-latest-state
      // shape) — an append sink would accumulate every generation of
      // est per (shard, item) and never retract an item that fell
      // out of the counters; update-capable sinks upsert correctly
      // and readers of append-only sinks at least see the declared
      // semantics
      .flatMapGroupsWithState[FreqState, FreqSummary](
        OutputMode.Update, timeout) {
        (shard, rows, state) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(FreqState(Map.empty, 0L))
            // nulls first, then item order — any FIXED order works;
            // Option ordering avoids the NPE a raw string sort has
            rows.toSeq.sortBy(r => Option(r.item)).foreach { r =>
              st = FreqState(mg.reduce(st.counters, r.item),
                if (r.item == null) st.n else st.n + 1)
            }
            state.update(st)
            idleKeyTtl.foreach(state.setTimeoutDuration)
            st.counters.toSeq.sortBy(_._1).iterator.map {
              case (item, est) => FreqSummary(shard, item, est, st.n)
            }
          }
      }
  }

  case class PatchEvent(key: Long, seq: Long,
                        patch: Map[String, String])
  case class PatchRow(key: Long, values: Map[String, String],
                      max_seq: Long)
  /** Per-column (winning seq, value) plus the key's seq high mark —
    * O(columns) per key.
    */
  case class PatchState(seqs: Map[String, Long],
                        vals: Map[String, String], maxSeq: Long)

  /** Streaming twin of [[graft.ops.Relational.patchApply]]'s LWW
    * fold: per key, each column keeps the value of the HIGHEST-seq
    * patch that set it (`patch` map absence = column untouched),
    * re-emitting the key's materialized row after every micro-batch
    * that touches it — the live serving-table view of a sparse CDC
    * changelog.
    *
    * Unlike [[ewmaStream]]'s order-sensitive recursion, per-column
    * LWW is a CRDT — max over the (seq, value) PAIR, ties on seq
    * breaking to the greater value, the same LWW-register rule as
    * the batch fold (commutative, associative AND idempotent, which
    * a bare max-by-seq is NOT under duplicate seqs) — so this twin
    * needs NO high-water-mark drop
    * rule: out-of-order delivery, duplicate redelivery, and any
    * micro-batch partitioning all converge to the same state — late
    * events retro-apply correctly instead of being dropped, and an
    * at-least-once source costs nothing. StreamSpec pins exactly
    * that: shuffled + redelivered changelogs match the batch
    * `patchApply` fold row for row.
    *
    * State is O(columns) per live key, partitioned on the same key
    * the batch groupBy shuffles on; `idleKeyTtl` evicts idle keys
    * for unbounded key spaces (a re-appearing key then restarts
    * empty — size the TTL to the key's update horizon).
    */
  def patchApplyStream(patches: Dataset[PatchEvent],
                       idleKeyTtl: Option[String] = None)
      : Dataset[PatchRow] = {
    import patches.sparkSession.implicits._
    val timeout = ttlTimeout(idleKeyTtl)
    patches
      .groupByKey(_.key)
      .flatMapGroupsWithState[PatchState, PatchRow](
        OutputMode.Update, timeout) {
        (key, rows, state) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption
              .getOrElse(PatchState(Map.empty, Map.empty, Long.MinValue))
            rows.foreach { r =>
              var seqs = st.seqs
              var vals = st.vals
              r.patch.foreach { case (c, v) =>
                // LWW-register merge on the (seq, value) PAIR — the
                // same tie rule as the batch fold: a bare
                // seq-strictly-greater test would make tied-seq
                // writes from two producers land in iterator
                // (= partitioning) order, breaking the CRDT claim.
                // Value ties compare UTF-8 BYTES (Spark's UTF8String
                // / DuckDB VARCHAR order), not String.compareTo's
                // UTF-16 units — the two disagree when supplementary-
                // plane chars mix with U+E000–U+FFFF, and a UTF-16
                // tie-break here would diverge from the batch max_by
                val wins = v != null && (seqs.get(c) match {
                  case None => true
                  case Some(s) => s < r.seq ||
                    (s == r.seq && vals.get(c).forall(prev =>
                      java.util.Arrays.compareUnsigned(
                        prev.getBytes(
                          java.nio.charset.StandardCharsets.UTF_8),
                        v.getBytes(
                          java.nio.charset.StandardCharsets.UTF_8)) < 0))
                })
                if (wins) {
                  seqs += (c -> r.seq)
                  vals += (c -> v)
                }
              }
              st = PatchState(seqs, vals, math.max(st.maxSeq, r.seq))
            }
            state.update(st)
            idleKeyTtl.foreach(state.setTimeoutDuration)
            Iterator.single(PatchRow(key, st.vals, st.maxSeq))
          }
      }
  }

  case class DistinctEvent(key: Long, value: Long)
  case class DistinctCount(key: Long, n_distinct: Long)

  /** Streaming twin of [[graft.ext.BitmapDistinct]]: per key, the
    * roaring-style compressed set unions in values as they arrive,
    * re-emitting the key's EXACT distinct count per micro-batch — the
    * live unique-users counter where approximate (HLL) is not
    * acceptable. Set union is a CRDT like [[patchApplyStream]]'s LWW
    * merge (idempotent, commutative), so duplicates, replays and any
    * delivery order converge with no high-water-mark rule. State is
    * the compressed set per key — O(distinct) but at the bitmap's
    * ≤2 B/value (8 KiB/64Ki-value container ceiling), the standard
    * cost of exact streaming distinct; `idleKeyTtl` evicts idle keys.
    *
    * RANGE CONTRACT (from [[graft.ext.BitmapDistinct]], restated here
    * because in a STREAM the failure mode is worse): values must be
    * in [0, 2^32). An out-of-range value fails the state function —
    * and since restart replays the same checkpointed offset range, a
    * single bad event is a poison pill that wedges the query until
    * the input is fixed. Map 64-bit/negative ids into range UPSTREAM
    * (e.g. a 32-bit hash, accepting collision-approximate counts, or
    * a dictionary) — the guard here names the key and value so the
    * pill is findable, but it cannot be skipped silently: dropping
    * events would corrupt the "exact distinct" contract.
    */
  def bitmapDistinctStream(events: Dataset[DistinctEvent],
                           idleKeyTtl: Option[String] = None)
      : Dataset[DistinctCount] = {
    import events.sparkSession.implicits._
    val timeout = ttlTimeout(idleKeyTtl)
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[Array[Byte], DistinctCount](
        OutputMode.Update, timeout) {
        (key, rows, state) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val vs = rows.map(_.value).toSeq
            vs.find(v => v < 0L || v > 0xffffffffL).foreach(v =>
              throw new IllegalArgumentException(
                s"StreamOps.bitmapDistinctStream: key $key value $v " +
                  "is outside [0, 2^32) — map ids into range upstream " +
                  "(see the RANGE CONTRACT scaladoc); this event will " +
                  "poison-pill the query on every replay until fixed"))
            val batch = graft.ext.BitmapDistinct.build(vs)
            val merged = graft.ext.BitmapDistinct.union(
              state.getOption.getOrElse(Array.emptyByteArray), batch)
            state.update(merged)
            idleKeyTtl.foreach(state.setTimeoutDuration)
            Iterator.single(DistinctCount(key,
              graft.ext.BitmapDistinct.cardinality(merged)))
          }
      }
  }

  /** Idempotent write of one micro-batch under `path/batch_id=<id>` —
    * the unit the exactly-once sink replays safely:
    *   - a batch id whose partition already COMMITTED (_SUCCESS
    *     present) is skipped whole, so an at-least-once redelivery
    *     after a sink-side success writes nothing;
    *   - a partition without _SUCCESS (crash mid-write) is rewritten
    *     with mode=overwrite, so a half-written attempt is replaced,
    *     never appended to.
    * Returns true when this call performed the write.
    *
    * Duplicate deliveries of the same id are serialized IN-JVM on an
    * interned per-batch-dir monitor: without it, two concurrent
    * redeliveries (a retried foreachBatch racing a stalled first
    * attempt, or two queries misconfigured onto one output path)
    * interleave their `overwrite` passes — both see no _SUCCESS,
    * both delete-then-write, and the surviving dir can hold part
    * files from BOTH payloads (their task UUIDs differ, so nothing
    * collides). The chaos spec pins exactly-one-winner. CROSS-process
    * duplicates (a zombie driver racing its replacement on one
    * checkpoint) are out of this sink's scope — same single-driver
    * assumption as Spark's own file sink, where fencing belongs to
    * the checkpointed offset log, not the sink.
    */
  def writeBatchIdempotent(batch: DataFrame, path: String,
                           batchId: Long): Boolean = {
    // Hadoop Path/FileSystem, NOT java.io.File: the sink must work on
    // the filesystems a streaming cluster actually writes (hdfs://,
    // s3a://, …) — java.io.File would normalize "s3a://bucket" to
    // "s3a:/bucket" (authority lost) and its _SUCCESS probe always
    // answers false on a remote FS, so the skip-committed-batch leg
    // of the idempotency contract would never engage exactly where
    // replays happen
    val dir = new org.apache.hadoop.fs.Path(path, s"batch_id=$batchId")
    val fs = dir.getFileSystem(
      batch.sparkSession.sessionState.newHadoopConf())
    // uriToString (not the raw caller path) so "p" and "./p" and
    // "file:/abs/p" intern to one monitor for one physical dir
    fs.makeQualified(dir).toString.intern.synchronized {
      if (fs.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS"))) false
      else {
        batch.write.mode("overwrite").parquet(dir.toString)
        true
      }
    }
  }

  /** End-to-end exactly-once parquet sink: Structured Streaming's
    * checkpointed offset log makes batch ids DETERMINISTIC per input
    * range, and [[writeBatchIdempotent]] makes each id's write
    * replay-safe — replayable source + deterministic batches +
    * idempotent sink is exactly Spark's documented recipe for
    * end-to-end exactly-once without a transactional store. The
    * output is a `batch_id`-partitioned parquet table readers load
    * with partition pruning; downstream compaction (layout_compaction)
    * folds the per-batch files once the partition goes cold.
    *
    * Returns the started query (caller owns its lifecycle).
    */
  def exactlyOnceParquetSink(ds: DataFrame, path: String,
                             checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    ds.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeBatchIdempotent(batch, path, id): Unit
      }
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .start()
}
