package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming counterparts of the batch event analytics
  * (graft.ops.EventOps): the same logical results, computed incrementally
  * over an unbounded stream (`readStream` → transform → `writeStream`).
  *
  * The reference is batch-only (no streaming anywhere in its 651 LoC —
  * SURVEY.md §1), so this is extension surface: the shape a training-data
  * ingest pipeline needs when events arrive continuously.
  *
  * Scale notes:
  *  - the windowed rollup is a streaming hash aggregation with watermark-
  *    driven state eviction — state per (window, event_type) key only, no
  *    unbounded growth; late events beyond the watermark are dropped
  *    deterministically.
  *  - sessionization uses flatMapGroupsWithState with event-time timeout:
  *    state is one small struct per ACTIVE user (not per event), emitted and
  *    cleared when the gap timeout fires. This is the O(active-users) state
  *    pattern that survives 100 TB/day ingest; a window-function approach
  *    (the batch path) needs the full history and cannot stream.
  */
object StreamOps {

  /** Reused per-thread MD5 instance for state-update hot paths —
    * `MessageDigest.getInstance` per token is allocation + provider
    * lookup the kmv stream pays once per distinct-key probe. */
  private[streaming] val md5Local: ThreadLocal[java.security.MessageDigest] =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** Tumbling 1-hour event-time rollup per event_type with a watermark.
    * Input schema: (ts: Timestamp, event_type: String, value: Double, ...).
    * Emits (window, event_type, n, total_value); append-complete once the
    * watermark passes window end. */
  def hourlyRollup(events: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(F.window(F.col("ts"), "1 hour"), F.col("event_type"))
      .agg(F.count(F.lit(1)).as("n"), F.sum("value").as("total_value"))
      .select(
        F.date_format(F.col("window.start"), "yyyy-MM-dd HH").as("hour"),
        F.col("event_type"), F.col("n"), F.col("total_value"))

  /** Streaming distinct-cardinality estimate per tumbling window: the
    * [[graft.ops.Sketches]] HLL registers as a WATERMARKED streaming
    * aggregation — state per window is ≤ 2^p (window, bucket, max-rho)
    * rows, NOT the distinct key set, so "distinct users per hour" over an
    * unbounded stream holds O(2^p) memory per open window and evicts
    * whole windows once the watermark passes (an exact streaming
    * `approx_count_distinct` would also work per-batch, but its sketch
    * state is opaque; these registers are the same rows the batch op
    * emits, so batch and stream sketches MERGE by max — the
    * lambda-architecture reconciliation). Estimate the counts from the
    * emitted registers with [[graft.ops.Sketches.hllEstimate]] on the
    * sink side (grouping by the window column). Input needs (`tsCol`:
    * Timestamp, `key`). */
  def hllWindowedRegisters(df: DataFrame, key: org.apache.spark.sql.Column,
                           tsCol: String = "ts",
                           window: String = "1 hour",
                           watermarkDelay: String = "1 hour",
                           p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16 && p % 4 == 0,
      s"p must be a multiple of 4 in [4,16], got $p")
    val hx = F.md5(F.coalesce(key.cast("string"), F.lit("")))
    val bucket = F.conv(F.substring(hx, 1, p / 4), 16, 10).cast("long")
    val v = F.conv(F.substring(hx, p / 4 + 1, 13), 16, 10).cast("long")
    val rho = F.when(v === 0L, F.lit(53))
      .otherwise(F.lit(53) - F.length(F.ltrim(F.bin(v), "0")))
    df.withWatermark(tsCol, watermarkDelay)
      .select(F.col(tsCol), bucket.as("bucket"), rho.as("rho"))
      .groupBy(F.window(F.col(tsCol), window), F.col("bucket"))
      .agg(F.max("rho").as("m"))
      .select(F.date_format(F.col("window.start"), "yyyy-MM-dd HH").as("hour"),
        F.col("bucket"), F.col("m"))
  }

  /** Streaming exact dedup: drop rows whose content fingerprint was already
    * seen, with state bounded by the watermark — the ingest-side gate of a
    * training-data pipeline (batch analogue: graft.ops.Dedup.exact). State
    * is one (fingerprint, ts) entry per distinct doc inside the watermark
    * horizon; Spark evicts entries older than the watermark, so memory is
    * O(docs per horizon), not O(corpus). Input needs (`tsCol`: Timestamp,
    * `textCol`: String). */
  def dedupStream(docs: DataFrame, textCol: String, tsCol: String = "ts",
                  watermarkDelay: String = "1 hour"): DataFrame =
    docs
      .withColumn("__fp", F.md5(F.regexp_replace(F.lower(F.col(textCol)), "\\s+", " ")))
      .withWatermark(tsCol, watermarkDelay)
      // dropDuplicatesWithinWatermark, NOT dropDuplicates: plain
      // dropDuplicates only evicts state when the event-time column is part
      // of the key, so its state would grow O(all docs ever seen); the
      // within-watermark variant evicts fingerprints once the watermark
      // passes, giving the documented O(docs per horizon) bound
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Streaming incremental dedup against a FROZEN corpus (batch analogue:
    * graft.ops.Dedup.dedupDelta): arriving documents are dropped when their
    * fingerprint already exists in the static corpus, then deduped within
    * the stream by [[dedupStream]]'s watermark-bounded state.
    *
    * Scale shape: the corpus side is a stream-static LEFT ANTI join on the
    * 16-byte fingerprint — Spark keeps NO state for the static side (each
    * micro-batch probes it like a batch join, broadcast when the corpus fp
    * relation is small, shuffled-probe otherwise); streaming state is only
    * the within-horizon fingerprint set. Input needs (`tsCol`: Timestamp,
    * `textCol`: String). */
  def dedupDeltaStream(corpus: DataFrame, docs: DataFrame, textCol: String,
                       tsCol: String = "ts",
                       watermarkDelay: String = "1 hour"): DataFrame = {
    val fp = F.md5(F.regexp_replace(F.lower(F.col(textCol)), "\\s+", " "))
    val corpusFps = corpus.select(fp.as("__fp")).distinct()
    docs
      .withColumn("__fp", fp)
      .join(corpusFps, Seq("__fp"), "left_anti")
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
  }

  /** Streaming NEAR-duplicate dedup against a growing accepted store — the
    * online form of the batch minhash pipeline (x02/x57/x35), for an
    * ingest pipeline that must admit-or-drop crawl documents continuously.
    *
    * Pattern: `foreachBatch` + the batch delta operators, NOT a stateful
    * streaming operator. Near-dup needs "drop the doc if ANY of its LSH
    * band buckets collides with anything accepted so far"; expressing that
    * with in-executor streaming state would need a per-band stateful op
    * FOLLOWED by a per-doc all-bands vote — a multi-stateful topology
    * Structured Streaming restricts — and worse, the accepted-corpus state
    * would live in executor memory, unbounded by any watermark (a real
    * corpus admits documents forever; horizon eviction would re-admit
    * year-old boilerplate). The store-on-disk form keeps state where a
    * 100 TB pipeline wants it: a parquet relation, probed per micro-batch
    * with the same bounded broadcast semi-join as [[graft.ops.Dedup
    * .minhashPairsDelta]] (the petabyte store never shuffles; only
    * batch-colliding band buckets are read), and appended transactionally
    * per batch.
    *
    * Per micro-batch, serially (foreachBatch guarantees order):
    *  1. within-batch near-dup keep-first ([[graft.ops.Dedup.minhashPairs]]
    *     → [[graft.ops.Components.dedupByPairs]] — canonical component
    *     survivor, the x35 semantics);
    *  2. survivors near-dupping the ACCEPTED STORE are dropped
    *     (minhashPairsDelta: store-side signatures probed only in the
    *     batch's band buckets, batch side broadcast);
    *  3. the remainder appends to the store.
    *
    * Replay idempotency: appended rows are stamped with the foreachBatch
    * `batchId` (`__batch` column); a replayed batch whose id already
    * exists in the store is skipped wholesale. foreachBatch replays a
    * batch only after a crash BETWEEN the parquet append and the
    * checkpoint commit — without the stamp the replayed docs would
    * self-collide with their own stored copies and be silently dropped
    * (store content stayed correct, but keep-order could shift); with it,
    * replay is a no-op, matching what a transactional table format would
    * give. The stamp check is one pushed-filter probe of the store per
    * micro-batch (parquet row-group stats skip almost everything). */
  def nearDupStream(docs: DataFrame, idCol: String, textCol: String,
                    storePath: String, checkpointPath: String,
                    threshold: Double = 0.5)
                   : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointPath)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        nearDupBatch(batch.toDF(), batchId, idCol, textCol, storePath, threshold)
      }
      .start()

  /** One [[nearDupStream]] micro-batch, exposed so the replay-idempotency
    * property is directly testable: applying the same (batch, batchId)
    * twice must leave the store byte-identical. */
  def nearDupBatch(batch: DataFrame, batchId: Long, idCol: String,
                   textCol: String, storePath: String,
                   threshold: Double = 0.5): Unit = {
    import graft.ops.{Components, Dedup}
    val spark = batch.sparkSession
    val storeP = new org.apache.hadoop.fs.Path(storePath)
    val fs = storeP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a COMMITTED store, not a bare directory: a crash between the
    // committer creating storePath and committing part files leaves
    // an unreadable directory (only _temporary inside) — existence
    // alone would then poison every replay with an unreadable-store
    // error. _SUCCESS appears atomically at job commit; the part-
    // file scan covers stores written with the marker disabled.
    val storeReadable = fs.exists(storeP) && {
      val ls = fs.listStatus(storeP)
      ls.exists(_.getPath.getName == "_SUCCESS") ||
        ls.exists(_.getPath.getName.endsWith(".parquet"))
    }
    val store = if (storeReadable) Some(spark.read.parquet(storePath)) else None
    val alreadyApplied = store.exists(s =>
      s.schema.fieldNames.contains("__batch") &&
        !s.filter(F.col("__batch") === batchId).isEmpty)
    if (!alreadyApplied) {
      val cached = batch.persist()
      try {
        if (!cached.isEmpty) {
          val withinPairs = Dedup.minhashPairs(cached, idCol, textCol,
            threshold = threshold)
          val kept = Components.dedupByPairs(cached, idCol, withinPairs)
          val fresh = store match {
            case Some(st) =>
              val dupIds = Dedup.minhashPairsDelta(st, kept, idCol, textCol,
                  threshold = threshold)
                .select(F.col("b").as(idCol)).distinct()
              kept.join(dupIds, Seq(idCol), "left_anti")
            case None => kept
          }
          fresh.withColumn("__batch", F.lit(batchId))
            .write.mode("append").parquet(storePath)
        }
      } finally cached.unpersist()
    }
  }

  final case class Event(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, total: Double)
  final case class SessionOut(user_id: Long, n_events: Long, total_value: Double,
                              duration_sec: Double)

  /** Gap-based streaming sessionization: one state struct per active user;
    * a session closes (and is emitted) when no event arrives within
    * `gapMinutes` of event time — enforced via event-time timeout against
    * the watermark, so results are deterministic under reordering within
    * the watermark delay. */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30,
                 watermarkDelay: String = "10 minutes")(implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    val gapMs = gapMinutes.toLong * 60L * 1000L

    def update(userId: Long, evs: Iterator[Event],
               state: GroupState[SessionState]): Iterator[SessionOut] = {
      val out = Vector.newBuilder[SessionOut]
      if (state.hasTimedOut) {
        // gap elapsed with no new events: close and emit the session
        val s = state.get
        out += SessionOut(userId, s.n, s.total, (s.last - s.start) / 1000.0)
        state.remove()
      } else {
        val sorted = evs.toVector.sortBy(_.ts.getTime)
        var cur = state.getOption
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.last > gapMs =>
              out += SessionOut(userId, s.n, s.total, (s.last - s.start) / 1000.0)
              cur = Some(SessionState(t, t, 1L, e.value))
            case Some(s) =>
              cur = Some(s.copy(last = math.max(s.last, t), n = s.n + 1, total = s.total + e.value))
            case None =>
              cur = Some(SessionState(t, t, 1L, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.last + gapMs)
        }
      }
      out.result().iterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  final case class TypedEvent(user_id: Long, ts: Timestamp, event_type: String)
  final case class LastEvent(lastTs: Long, lastType: String)
  final case class Transition(user_id: Long, prev_type: String, next_type: String)

  /** Streaming first-order transitions — the incremental feed of
    * [[graft.ops.EventOps.transitionMatrix]]: per user, O(1) state (the
    * last seen event) emits one (prev → next) adjacency per arriving
    * event after the first. Downstream a plain streaming aggregation
    * counts pairs into the live matrix.
    *
    * Within a micro-batch events sort by event time, so in-batch disorder
    * is absorbed; across batches the emitted adjacency follows arrival
    * order (an event older than the stored state does NOT rewrite history
    * — it is folded in timestamp order against the current state, the
    * at-watermark approximation every O(1)-state sequence summary makes).
    * State is one tiny struct per active user; production deployments add
    * a timeout to expire dormant users, exactly as [[sessionize]] does.
    */
  def transitionStream(events: Dataset[TypedEvent],
                       watermarkDelay: String = "10 minutes")(
      implicit spark: SparkSession): Dataset[Transition] = {
    import spark.implicits._

    def update(userId: Long, evs: Iterator[TypedEvent],
               state: GroupState[LastEvent]): Iterator[Transition] = {
      val out = Vector.newBuilder[Transition]
      val sorted = evs.toVector.sortBy(e => (e.ts.getTime, e.event_type))
      var cur = state.getOption
      sorted.foreach { e =>
        cur.foreach(s => out += Transition(userId, s.lastType, e.event_type))
        cur = Some(LastEvent(e.ts.getTime, e.event_type))
      }
      cur.foreach(state.update)
      out.result().iterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }

  final case class ArrivalEvent(user_id: Long, ts: Timestamp,
                                arrival_id: Long)
  final case class MaxSeen(maxTs: Long)
  final case class LateOut(user_id: Long, arrival_id: Long, late: Boolean,
                           lateness_ms: Long)

  /** STREAMING event-time disorder monitor — the live feed of
    * [[graft.ops.EventOps.disorderCensus]]: per user, O(1) state (ONE
    * long — the max event time seen) flags each arriving event as late
    * when some earlier-arriving event of the same user already carried
    * a larger event time, with the gap as its lateness. Downstream a
    * plain streaming aggregation rolls the flags into the live
    * late-share / lateness-quantile readout that watches whether the
    * deployed `withWatermark` delay still covers the stream's actual
    * disorder.
    *
    * Within a micro-batch events sort by `arrival_id` (the ingest-order
    * proxy — the SAME tie column the batch census orders by), so the
    * flags EQUAL the batch op's whenever arrival ids are consistent
    * with batch arrival order (the normal monotone-ingest case;
    * cross-batch, state carries the max forward in arrival order).
    * Lateness here is ms-grain (`Timestamp.getTime`) vs the batch op's
    * µs — equal at ms-grain timestamps, truncated below that (the
    * pageHinkleyStream-style precision caveat, stated not hidden).
    * State is one long per active user; production deployments add a
    * timeout to expire dormant users, exactly as [[sessionize]] does.
    */
  def lateEventStream(events: Dataset[ArrivalEvent],
                      watermarkDelay: String = "10 minutes")(
      implicit spark: SparkSession): Dataset[LateOut] = {
    import spark.implicits._

    def update(userId: Long, evs: Iterator[ArrivalEvent],
               state: GroupState[MaxSeen]): Iterator[LateOut] = {
      val out = Vector.newBuilder[LateOut]
      val sorted = evs.toVector.sortBy(_.arrival_id)
      var mx = state.getOption.map(_.maxTs)
      sorted.foreach { e =>
        val t = e.ts.getTime
        val late = mx.exists(t < _)
        out += LateOut(userId, e.arrival_id, late,
          if (late) mx.get - t else 0L)
        mx = Some(mx.fold(t)(math.max(_, t)))
      }
      mx.foreach(m => state.update(MaxSeen(m)))
      out.result().iterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** STREAM-STREAM interval join: attribute each live conversion to the
    * same user's touches within the trailing window — the continuous
    * feed of the batch last-touch census. This is Structured Streaming's
    * stream-stream inner join: BOTH sides watermarked, and the join
    * condition carries the event-time bound `conv.ts − window ≤ touch.ts
    * ≤ conv.ts`, which is what lets the engine EVICT touch state once the
    * conversion-side watermark passes it — an unbounded-condition
    * stream-stream join would accumulate state forever.
    *
    * Emits one row per (touch, conversion) pair in the window; downstream
    * aggregation (count per touch type, pick latest) composes as normal
    * streaming ops.
    */
  def attributionStream(touches: Dataset[TypedEvent],
                        conversions: Dataset[TypedEvent],
                        windowMinutes: Int = 60,
                        watermarkDelay: String = "10 minutes"): DataFrame = {
    require(windowMinutes > 0, s"windowMinutes must be positive, got $windowMinutes")
    val t = touches.toDF("t_user", "t_ts", "t_type")
      .withWatermark("t_ts", watermarkDelay)
    val c = conversions.toDF("c_user", "c_ts", "c_type")
      .withWatermark("c_ts", watermarkDelay)
    c.join(t,
      F.col("t_user") === F.col("c_user") &&
        F.col("t_ts") <= F.col("c_ts") &&
        F.col("t_ts") >= F.col("c_ts") - F.expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(F.col("c_user").as("user_id"), F.col("t_type").as("touch_type"),
        F.col("t_ts").as("touch_ts"), F.col("c_ts").as("conv_ts"))
  }

  final case class Metric(key: String, ts: Timestamp, value: Long)
  final case class CusumState(p: Long, minP: Long)
  final case class CusumOut(key: String, ts: Timestamp, value: Long, cusum: Long)

  /** Streaming one-sided CUSUM drift alarm — the incremental feed of the
    * batch [[graft.ops.EventOps.cusumDrift]]: per key the state is TWO
    * LONGS (running sum of `v − K` and its running min — the closed form
    * s_t = P_t − min(0, min P_j)), so a million metric keys cost a few MB
    * of store. In-batch disorder is absorbed by an event-time sort (the
    * [[transitionStream]] convention); cross-batch order is the arrival
    * order, which is the streaming contract. Emits one scored row per
    * observation.
    */
  def cusumStream(metrics: Dataset[Metric], k: Long,
                  watermarkDelay: String = "10 minutes")(
      implicit spark: SparkSession): Dataset[CusumOut] = {
    import spark.implicits._

    def update(key: String, ms: Iterator[Metric],
               state: GroupState[CusumState]): Iterator[CusumOut] = {
      val out = Vector.newBuilder[CusumOut]
      val sorted = ms.toVector.sortBy(m => (m.ts.getTime, m.value))
      var cur = state.getOption.getOrElse(CusumState(0L, 0L))
      sorted.foreach { m =>
        val p = cur.p + (m.value - k)
        val mp = math.min(cur.minP, p)
        cur = CusumState(p, mp)
        out += CusumOut(key, m.ts, m.value, p - math.min(0L, mp))
      }
      state.update(cur)
      out.result().iterator
    }

    metrics
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }

  final case class PhState(t: Long, sumX: Long, mNano: Long,
                           maxMNano: Long)
  final case class PhOut(key: String, ts: Timestamp, value: Long,
                         mt: Double, ph: Double, alarm: Boolean)

  /** Streaming Page-Hinkley drift alarm — the incremental feed of the
    * batch [[graft.ops.EventOps.pageHinkley]]: per key the state is
    * FOUR LONGS (observation count, value sum for the running mean,
    * and the PH accumulator + its running max as NANO-scaled longs —
    * each 9-dp-rounded deviation term becomes an exact integer, so fed
    * the SAME series the batch op scores (its per-day counts), the
    * stream replays the batch DECIMAL accumulation bit-for-bit instead
    * of drifting a double per micro-batch; note the batch op scores
    * daily event counts while this scores each observation it is fed,
    * and the float `floor(x·1e9 + 0.5)` half-up here can differ from
    * Spark's BigDecimal-based `F.round` by one last-9-dp-grid step in
    * rare exact-halfway cases — the ckaFrob-style FP-vs-BigDecimal
    * caveat). In-batch disorder is
    * absorbed by an event-time sort (the [[cusumStream]] convention);
    * cross-batch order is arrival order, the streaming contract.
    * Emits one scored row per observation; `alarm` is PH > λ, strict,
    * matching the batch op's boundary behavior.
    */
  def pageHinkleyStream(metrics: Dataset[Metric], delta: Double = 0.0,
                        lambda: Double = 50.0,
                        watermarkDelay: String = "10 minutes")(
      implicit spark: SparkSession): Dataset[PhOut] = {
    require(lambda > 0.0, s"lambda must be positive, got $lambda")
    import spark.implicits._

    def r9nano(x: Double): Long =
      if (x >= 0) math.floor(x * 1e9 + 0.5).toLong
      else -math.floor(-x * 1e9 + 0.5).toLong

    def update(key: String, ms: Iterator[Metric],
               state: GroupState[PhState]): Iterator[PhOut] = {
      val out = Vector.newBuilder[PhOut]
      val sorted = ms.toVector.sortBy(m => (m.ts.getTime, m.value))
      var cur = state.getOption.getOrElse(PhState(0L, 0L, 0L, 0L))
      sorted.foreach { m =>
        val t = cur.t + 1
        val sx = cur.sumX + m.value
        val mean = sx.toDouble / t.toDouble
        val mNano = cur.mNano + r9nano(m.value.toDouble - mean + delta)
        val maxM = math.max(if (cur.t == 0L) mNano else cur.maxMNano,
          mNano)
        cur = PhState(t, sx, mNano, maxM)
        val phNano = maxM - mNano
        // HALF-UP like the batch F.round (rint would round half-even),
        // and + 0.0 so a negative term can never emit -0.0
        def r6(nano: Long): Double = {
          val v = nano / 1e9
          (if (v >= 0) math.floor(v * 1e6 + 0.5)
           else -math.floor(-v * 1e6 + 0.5)) / 1e6 + 0.0
        }
        out += PhOut(key, m.ts, m.value, r6(mNano), r6(phNano),
          phNano / 1e9 > lambda)
      }
      state.update(cur)
      out.result().iterator
    }

    metrics
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }

  /** Streaming score-drift monitor: windowed PSI of an incoming score
    * stream against a STATIC baseline histogram — the model-monitoring
    * alarm ([[graft.ops.Stats.psi]]'s streaming sibling) that pages when
    * an upstream change shifts the quality-score distribution mid-ingest.
    *
    * Structured Streaming allows ONE aggregation per query, and PSI needs
    * two (bin counts, then the per-window normalization/term sum) — so
    * the stream side does the single watermarked (window, bin) count and
    * [[psiOfBinCounts]] finishes the arithmetic per micro-batch (the
    * [[nearDupStream]] foreachBatch pattern; it is also directly
    * callable on any batch of bin counts, which is how the spec pins it).
    * State is (windows × nBins) rows, watermark-evicted.
    */
  def scoreDriftBins(scores: DataFrame, scoreCol: org.apache.spark.sql.Column,
                     tsCol: String, windowDur: String,
                     watermarkDelay: String, nBins: Int = 10): DataFrame =
    scores
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(F.window(F.col(tsCol), windowDur).as("win"),
        // clamp BOTH ends: scores outside [0,1) land in the edge bins
        // instead of producing out-of-range bin ids that psiOfBinCounts'
        // dense grid would count in __tot but in no per-bin sum
        F.greatest(F.lit(0L),
          F.least(F.floor(scoreCol.cast("double") * nBins),
            F.lit(nBins - 1L))).as("bin"))
      .agg(F.count(F.lit(1)).as("n"))

  /** Per-window PSI from (win, bin, n) rows against a baseline of
    * (bin, p) shares: add-ε smoothing on BOTH sides, 9-dp terms, 6-dp
    * PSI — the same arithmetic as the batch [[graft.ops.Stats.psi]].
    * Bins absent from a window contribute the ε-vs-baseline term via the
    * dense baseline grid (a missing bin IS drift). */
  def psiOfBinCounts(binCounts: DataFrame, baseline: DataFrame,
                     nBins: Int = 10, eps: Double = 1e-4): DataFrame = {
    // ONE aggregation + a literal unpivot (no self-join: joining a
    // watermark-tagged streaming sink table back to itself trips
    // conflicting-reference resolution) — missing bins surface as 0s
    val binned = (0 until nBins).map(b =>
      F.sum(F.when(F.col("bin") === b, F.col("n")).otherwise(0L))
        .as(s"__b$b"))
    val perWin = binCounts.groupBy("win")
      .agg(binned.head, (binned.tail :+ F.sum("n").as("__tot")): _*)
    val cells = perWin.select(F.col("win"), F.col("__tot"),
        F.explode(F.array((0 until nBins).map(b => F.struct(
          F.lit(b.toLong).as("bin"), F.col(s"__b$b").as("n"))): _*))
          .as("__e"))
      .select(F.col("win"), F.col("__tot"),
        F.col("__e.bin").as("bin"), F.col("__e.n").as("n"))
    cells.join(F.broadcast(baseline.select(F.col("bin"),
        F.col("p").as("__p"))), Seq("bin"), "left")
      .na.fill(0.0, Seq("__p"))
      .withColumn("__q", F.round(F.col("n").cast("double") /
        F.col("__tot") + eps, 9))
      .withColumn("__pp", F.round(F.col("__p") + eps, 9))
      .withColumn("__term", F.round(
        (F.col("__pp") - F.col("__q")) *
          F.log(F.col("__pp") / F.col("__q")), 9))
      .groupBy("win")
      .agg(F.round(F.sum("__term"), 6).as("psi"),
        F.max("__tot").as("n"))
      .orderBy("win")
  }

  /** Streaming value histogram per event-time window — the mergeable
    * bin-count rollup under [[quantilesOfValueBins]] (latency p95/p99,
    * payload sizes, queue depths): values land in fixed-width bins, so
    * the per-window state is (window × bins) counters no matter the
    * event volume, and late data folds in until the watermark closes.
    * Negative values clamp to bin 0 (the psiOfBinCounts edge rule:
    * out-of-range must COUNT, not vanish); `maxBins` caps runaway
    * domains (values past the cap land in the top bin, preserving
    * totals — a visible saturation, not a silent drop).
    */
  def valueHistogramStream(values: DataFrame,
                           valueCol: org.apache.spark.sql.Column,
                           tsCol: String, windowDur: String,
                           watermarkDelay: String, binWidth: Double,
                           maxBins: Int = 1000): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    values
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(F.window(F.col(tsCol), windowDur).as("win"),
        F.greatest(F.lit(0L),
          F.least(F.floor(valueCol.cast("double") / binWidth),
            F.lit(maxBins - 1L))).as("bin"))
      .agg(F.count(F.lit(1)).as("n"))
  }

  /** Per-window quantiles from [[valueHistogramStream]]'s (win, bin, n)
    * rows — the batch readout: for each probability p, the answer is
    * the first bin whose cumulative count reaches ⌈p·n⌉, reported as
    * the bin's [lo, hi) bounds. Error is bounded by `binWidth` BY
    * CONSTRUCTION — the t-digest trade made distributable with plain
    * integer counters (exact counts, mergeable across windows/shards,
    * no per-value state).
    *
    * Scale shape: bins-per-window-bounded cum windows keyed by win;
    * nothing subject-level survives the stream rollup.
    *
    * @return per (win, p): (win, n, p, bin, lo, hi) ordered by win, p
    */
  def quantilesOfValueBins(binCounts: DataFrame, binWidth: Double,
                           probs: Seq[Double] = Seq(0.5, 0.95, 0.99))
      : DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1),
      s"probs must be in (0,1], got $probs")
    val w = Window.partitionBy("win").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy("win")
    val cum = binCounts
      .withColumn("__cum", F.sum("n").over(w))
      .withColumn("__n", F.sum("n").over(tot))
    val probed = cum.withColumn("p",
        F.explode(F.array(probs.map(F.lit): _*)))
      .withColumn("__target",
        F.ceil(F.col("p") * F.col("__n").cast("double")))
      .filter(F.col("__cum") >= F.col("__target"))
      .groupBy("win", "p")
      .agg(F.min("bin").as("bin"), F.max("__n").as("n"))
    probed.select(F.col("win"), F.col("n"), F.col("p"), F.col("bin"),
        (F.col("bin").cast("double") * binWidth).as("lo"),
        ((F.col("bin") + 1L).cast("double") * binWidth).as("hi"))
      .orderBy("win", "p")
  }

  final case class Tok(ts: Timestamp, token: String)
  final case class SpaceSavingState(counts: Map[String, (Long, Long)])
  final case class HeavyHitter(shard: Int, token: String, count: Long,
                               err: Long)

  /** Streaming heavy hitters via SHARDED Space-Saving (Metwally et al.
    * 2005) — "which tokens/URLs/keys dominate the live stream", in
    * bounded state that a count-everything rollup cannot promise: each of
    * `nShards` keyed state groups holds at most `capacity` counters
    * (token → (count, overestimate)), evicting the minimum on overflow
    * and inheriting its count as the new entry's error bound. Guarantee
    * per shard: stored − err ≤ true ≤ stored, and any token whose true
    * count exceeds streamLength/capacity is PRESENT.
    *
    * Scale shape: state is nShards × capacity × (token, 2 longs) — fixed
    * bytes regardless of stream length or vocabulary; tokens hash-route
    * to shards so the work parallelizes and no shard sees the whole
    * stream. Each micro-batch APPENDS its shard's current summary (the
    * [[cusumStream]] emission convention: the latest emission per shard
    * is the current state of the world).
    */
  def heavyHittersStream(tokens: Dataset[Tok], capacity: Int = 8,
                         nShards: Int = 4,
                         watermarkDelay: String = "10 minutes")(
      implicit spark: SparkSession): Dataset[HeavyHitter] = {
    import spark.implicits._
    require(capacity >= 2, s"capacity must be >= 2, got $capacity")
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")

    def update(shard: Int, ts: Iterator[Tok],
               state: GroupState[SpaceSavingState]): Iterator[HeavyHitter] = {
      var m = state.getOption.map(_.counts).getOrElse(Map.empty[String, (Long, Long)])
      ts.foreach { t =>
        m.get(t.token) match {
          case Some((c, e)) => m = m.updated(t.token, (c + 1L, e))
          case None if m.size < capacity =>
            m = m.updated(t.token, (1L, 0L))
          case None =>
            // deterministic eviction: min count, token as tie-break
            val (minTok, (minC, _)) =
              m.minBy { case (tok, (c, _)) => (c, tok) }
            m = (m - minTok).updated(t.token, (minC + 1L, minC))
        }
      }
      state.update(SpaceSavingState(m))
      m.toSeq.sortBy { case (tok, (c, _)) => (-c, tok) }
        .map { case (tok, (c, e)) => HeavyHitter(shard, tok, c, e) }
        .iterator
    }

    tokens
      .withWatermark("ts", watermarkDelay)
      .groupByKey(t => math.floorMod(t.token.hashCode, nShards))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  final case class KmvState(bottom: Vector[(Long, String)])
  final case class KmvRow(shard: Int, key: String, hash: Long, rank: Int,
                          n_seen: Long, est_shard: Double)

  /** Streaming KMV bottom-k distinct sample — the third leg of the
    * streaming-sketch stool: [[hllWindowedRegisters]] COUNTS the
    * distinct keys, [[heavyHittersStream]] finds the dominant ones, this
    * keeps a UNIFORM SAMPLE of them (the k smallest key-hashes — exactly
    * the batch KMV/bottom-k construction, so the sample is mergeable and
    * depends only on the distinct key SET, never on repetition counts).
    * Each emission also carries the shard's KMV cardinality estimate
    * {{{
    *   N̂ = (k − 1) / u_(k)        (u_(k) = k-th smallest hash in [0,1))
    * }}}
    * (exact count while the shard has seen < k distinct keys). Shard
    * estimates ADD — keys hash-route disjointly — so Σ est_shard
    * estimates the global distinct count.
    *
    * Scale shape: state is nShards × k (hash, key) pairs — fixed bytes
    * regardless of stream length or key cardinality; a hot key costs
    * one membership probe per occurrence and never grows state.
    */
  def kmvSampleStream(keys: Dataset[Tok], k: Int = 64, nShards: Int = 4,
                      watermarkDelay: String = "10 minutes")(
      implicit spark: SparkSession): Dataset[KmvRow] = {
    import spark.implicits._
    require(k >= 2, s"k must be >= 2, got $k")
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")

    // 52-bit md5-prefix hash — EXACTLY Sketches.kmvDistinct's batch
    // construction (conv(substring(md5(key),1,13),16,10)), so streaming
    // and batch bottom-k samples hash the same key to the same value and
    // are genuinely mergeable/comparable. The previous two-correlated-
    // Murmur32 compose (advisor r12) had well under 64 bits of entropy
    // (identical halves on palindromes) and matched nothing batch-side.
    // the 52-bit value = first 13 hex chars = the 56 bits of bytes 0..6
    // shifted off their low nibble; bit arithmetic on a reused digest
    // instance, not per-token hex formatting + parseLong (advisor r13:
    // the format-string encode was a large constant factor in the
    // per-occurrence hot path)
    def h64(s: String): Long = {
      val md = StreamOps.md5Local.get()
      md.reset()
      val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var v = 0L
      var i = 0
      while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
      v >>> 4
    }

    def update(shard: Int, ts: Iterator[Tok],
               state: GroupState[KmvState]): Iterator[KmvRow] = {
      val st = state.getOption.getOrElse(KmvState(Vector.empty))
      var bottom = st.bottom
      var seen = bottom.map(_._2).toSet
      ts.foreach { t =>
        if (!seen.contains(t.token)) {
          val hv = h64(t.token)
          if (bottom.size < k) {
            bottom = (bottom :+ (hv, t.token)).sortBy(identity)
            seen += t.token
          } else if (hv < bottom.last._1) {
            seen -= bottom.last._2
            bottom = (bottom.init :+ (hv, t.token)).sortBy(identity)
            seen += t.token
          }
          // hv >= current max with a full sketch: provably outside the
          // bottom-k of the distinct set — drop
        }
      }
      state.update(KmvState(bottom))
      val est =
        if (bottom.size < k) bottom.size.toDouble
        else {
          // normalize the 52-bit hash into [0, 1) — same 2^52 scale as
          // Sketches.kmvDistinct's Kmv1 constant
          val uK = bottom.last._1.toDouble / 4503599627370496.0
          (k - 1).toDouble / math.max(uK, Double.MinPositiveValue)
        }
      bottom.iterator.zipWithIndex.map { case ((hv, key), i) =>
        KmvRow(shard, key, hv, i + 1, bottom.size.toLong, est)
      }
    }

    keys
      .withWatermark("ts", watermarkDelay)
      .groupByKey(t => math.floorMod(t.token.hashCode, nShards))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }
}
