package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.streaming.StreamOps
import graft.streaming.StreamOps.Event

/** Drives the streaming operators end-to-end with MemoryStream sources and
  * memory sinks — micro-batch execution, watermarks, and state timeouts all
  * exercised for real (not just plan construction).
  */
class StreamOpsSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  test("streaming hourly rollup matches the batch aggregation once watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val events = in.toDF().toDF("ts", "event_type", "value")

    val q = StreamOps.hourlyRollup(events, watermarkDelay = "5 minutes")
      .writeStream.format("memory").queryName("rollup")
      .outputMode("append").start()
    try {
      // hour 10: two clicks, one view; hour 11: one click
      in.addData((ts(5), "click", 1.0), (ts(10), "click", 2.0), (ts(20), "view", 5.0))
      q.processAllAvailable()
      in.addData((ts(65), "click", 7.0))    // moves watermark past hour-10 end? not yet (65+? )
      q.processAllAvailable()
      in.addData((ts(130), "view", 1.0))    // 12:10 − 5 min watermark closes hours 10 and 11
      q.processAllAvailable()
      val got = spark.table("rollup")
        .select("hour", "event_type", "n", "total_value")
        .as[(String, String, Long, Double)].collect().toSet
      assert(got.contains(("2026-01-01 10", "click", 2L, 3.0)))
      assert(got.contains(("2026-01-01 10", "view", 1L, 5.0)))
      assert(got.contains(("2026-01-01 11", "click", 1L, 7.0)))
    } finally q.stop()
  }

  test("streaming HLL registers equal the batch sketch per closed window") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val events = in.toDF().toDF("ts", "user")

    val q = StreamOps.hllWindowedRegisters(events, F.col("user"),
        watermarkDelay = "5 minutes")
      .writeStream.format("memory").queryName("hllreg")
      .outputMode("append").start()
    try {
      // hour 10: users a,b,c (a twice — duplicates must not add registers);
      // hour 11: user d
      in.addData((ts(5), "a"), (ts(10), "b"), (ts(20), "a"), (ts(30), "c"))
      q.processAllAvailable()
      in.addData((ts(65), "d"))
      q.processAllAvailable()
      in.addData((ts(130), "e")) // watermark closes hours 10 and 11
      q.processAllAvailable()
      val got = spark.table("hllreg")
        .as[(String, Long, Int)].collect().toSet
      // the batch op over the same hour-10/11 slices yields IDENTICAL
      // registers — the lambda-architecture merge contract
      val batch = Seq(("2026-01-01 10", "a"), ("2026-01-01 10", "b"),
          ("2026-01-01 10", "a"), ("2026-01-01 10", "c"), ("2026-01-01 11", "d"))
        .toDF("hour", "user")
      val want = graft.ops.Sketches
        .hllRegisters(batch, Seq("hour"), F.col("user"))
        .as[(String, Long, Int)].collect().toSet
      assert(got == want, s"stream registers $got != batch $want")
      // and the estimate over the emitted registers is near-exact here
      val est = graft.ops.Sketches.hllEstimate(
          spark.table("hllreg"), Seq("hour"))
        .as[(String, Double)].collect().toMap
      assert(math.abs(est("2026-01-01 10") - 3.0) < 0.2, est.toString)
      assert(math.abs(est("2026-01-01 11") - 1.0) < 0.1, est.toString)
    } finally q.stop()
  }

  test("streaming dedup drops repeated content across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val q = StreamOps.dedupStream(in.toDF().toDF("ts", "text"), "text",
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      in.addData((ts(0), "hello world"), (ts(1), "HELLO   world"), (ts(2), "other doc"))
      q.processAllAvailable()
      in.addData((ts(3), "hello world")) // dup arriving in a later batch
      q.processAllAvailable()
      val texts = spark.table("dedup").select("text")
        .as[String].collect().toSeq.sorted
      assert(texts == Seq("hello world", "other doc"),
        s"normalized dups must be dropped, got $texts")
    } finally q.stop()
  }

  test("streaming delta dedup drops corpus dups AND within-stream dups") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val corpus = Seq((1L, "seen text one"), (2L, "seen text two")).toDF("doc_id", "text")
    val in = MemoryStream[(Timestamp, String)]
    val q = StreamOps.dedupDeltaStream(corpus, in.toDF().toDF("ts", "text"), "text",
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("deltadedup").outputMode("append").start()
    try {
      in.addData(
        (ts(0), "seen text one"),    // exact corpus dup -> dropped
        (ts(1), "SEEN   text two"),  // corpus dup after normalization -> dropped
        (ts(2), "brand new text"))   // novel -> kept
      q.processAllAvailable()
      in.addData(
        (ts(3), "brand new text"),   // within-stream dup across batches -> dropped
        (ts(4), "another novel"))    // novel -> kept
      q.processAllAvailable()
      val texts = spark.table("deltadedup").select("text")
        .as[String].collect().toSeq.sorted
      assert(texts == Seq("another novel", "brand new text"),
        s"corpus + stream dups must be dropped, got $texts")
    } finally q.stop()
  }

  test("late event older than the watermark is DROPPED from the rollup (not re-emitted)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val q = StreamOps.hourlyRollup(in.toDF().toDF("ts", "event_type", "value"),
        watermarkDelay = "5 minutes")
      .writeStream.format("memory").queryName("rollup_late")
      .outputMode("append").start()
    try {
      in.addData((ts(5), "click", 1.0))
      q.processAllAvailable()
      in.addData((ts(130), "view", 1.0)) // 12:10 → watermark 12:05 closes hour 10
      q.processAllAvailable()
      // a click INSIDE already-closed hour 10 arrives late — must be dropped
      // deterministically (the documented semantics), not aggregated anew
      in.addData((ts(30), "click", 100.0))
      q.processAllAvailable()
      in.addData((ts(200), "view", 1.0)) // advance again so any state would flush
      q.processAllAvailable()
      val clicks = spark.table("rollup_late")
        .filter($"hour" === "2026-01-01 10" && $"event_type" === "click")
        .select("n", "total_value").as[(Long, Double)].collect().toSeq
      assert(clicks == Seq((1L, 1.0)),
        s"hour-10 clicks must stay (n=1, 1.0) — late row dropped, got $clicks")
    } finally q.stop()
  }

  test("session is emitted by the event-time TIMEOUT alone, across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val in = MemoryStream[Event]
    val q = StreamOps.sessionize(in.toDS(), gapMinutes = 30, watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("sessions_timeout")
      .outputMode("append").start()
    try {
      // user 5's session (10:00–10:05) must close ONLY when OTHER traffic
      // pushes the watermark past last + gap = 10:35 — user 5 never speaks again
      in.addData(Event(5L, ts(0), 2.0), Event(5L, ts(5), 3.0))
      q.processAllAvailable()
      assert(spark.table("sessions_timeout").isEmpty, "nothing may close in batch 1")
      in.addData(Event(6L, ts(20), 1.0)) // watermark 10:19 < 10:35: too early
      q.processAllAvailable()
      assert(spark.table("sessions_timeout").isEmpty,
        "timeout must NOT fire before watermark passes last+gap")
      // ts(45) keeps user 6's own session open (25 min gap < 30) while the
      // watermark 10:44 passes user 5's 10:35 deadline — ONLY the timeout fires
      in.addData(Event(6L, ts(45), 1.0))
      q.processAllAvailable()
      val got = spark.table("sessions_timeout").as[StreamOps.SessionOut].collect().toSet
      assert(got == Set(StreamOps.SessionOut(5L, 2L, 5.0, 300.0)),
        s"exactly user 5's session via timeout, got $got")
    } finally q.stop()
  }

  test("streaming sessionization emits closed sessions with correct stats") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val in = MemoryStream[Event]

    val q = StreamOps.sessionize(in.toDS(), gapMinutes = 30, watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: events at 10:00,10:10,10:20 (one session), then 11:30 (new session)
      in.addData(Event(1L, ts(0), 1.0), Event(1L, ts(10), 2.0), Event(1L, ts(20), 3.0))
      q.processAllAvailable()
      in.addData(Event(1L, ts(90), 4.0)) // gap 70 min > 30 → closes session 1
      q.processAllAvailable()
      in.addData(Event(2L, ts(300), 9.0)) // push watermark far ahead → times out user 1 session 2
      q.processAllAvailable()
      in.addData(Event(2L, ts(600), 1.0)) // and further, to time out user 2's first
      q.processAllAvailable()
      val got = spark.table("sessions")
        .as[StreamOps.SessionOut].collect().toSet
      assert(got.contains(StreamOps.SessionOut(1L, 3L, 6.0, 1200.0)),
        s"first session of user 1 (20 min, 3 events): $got")
      assert(got.contains(StreamOps.SessionOut(1L, 1L, 4.0, 0.0)),
        s"singleton second session of user 1: $got")
    } finally q.stop()
  }

  test("stateless curation ops (quality gate, hash sample, redact) run unchanged on a stream") {
    import org.apache.spark.sql.{functions => F}
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    // the same Column-level operators used in batch compose on a streaming
    // DataFrame with no code changes — they are pure projections/filters
    val curated = graft.ops.Sampling.splitAssign(
        graft.ops.Sampling.hashSample(
          docs.filter(graft.ops.TextOps.tokenCount(F.col("text")) >= 3), F.col("text"), 0.5),
        F.col("text"), Seq("train" -> 0.9, "val" -> 0.1))
      .select(F.col("doc_id"), graft.ops.TextOps.redact(F.col("text")).as("text"),
        F.col("split"),
        // canonicalUrl is a pure projection too — composes on-stream
        graft.ops.TextOps.canonicalUrl(
          F.concat(F.lit("HTTP://Ex.COM:80/d?utm_source=s&i="),
            F.col("doc_id").cast("string"))).as("canon"))
    val q = curated.writeStream.format("memory").queryName("stream_curate")
      .outputMode("append").start()
    try {
      val rows = (1L to 200L).map(i => (i, s"document body number $i reach me@x.example.org"))
      in.addData(rows: _*)
      in.addData((900L, "tiny"))   // fails the 3-token gate
      q.processAllAvailable()
      val got = spark.table("stream_curate")
        .as[(Long, String, String, String)].collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
      assert(!got.contains(900L), "token gate must drop the short doc")
      assert(got.forall { case (id, (_, _, canon)) =>
        canon == s"http://ex.com/d?i=$id" }, "URL canonicalization applied on-stream")
      // sampling decisions are IDENTICAL to the batch operator on the same text
      val batch = graft.ops.Sampling.hashSample(
          rows.toDF("doc_id", "text"), F.col("text"), 0.5)
        .select("doc_id").as[Long].collect().toSet
      assert(got.keySet == batch, "stream and batch must select the same rows")
      assert(got.values.forall(_._1.contains("<EMAIL>")), "redaction applied on-stream")
      // split assignment is the same deterministic decision on-stream
      val splits = graft.ops.Sampling.splitAssign(rows.toDF("doc_id", "text"),
          F.col("text"), Seq("train" -> 0.9, "val" -> 0.1))
        .select("doc_id", "split").as[(Long, String)].collect().toMap
      assert(got.forall { case (id, (_, s, _)) => splits(id) == s },
        "stream and batch must assign the same splits")
    } finally q.stop()
  }

  test("c4Filter streams identically to batch; knBigramNll batch operator " +
    "is deterministic (foreachBatch contract)") {
    import org.apache.spark.sql.{functions => F}
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    // c4Filter is a pure projection — composes on-stream unchanged;
    // knBigramNll joins the stream's transition stream against STATIC
    // model tables (stream-static joins, re-planned per micro-batch)
    val train = Seq((100L, "the cat sat on the mat"),
      (101L, "the cat ran on the mat")).toDF("doc_id", "text")
    val scored = graft.ops.Curation.c4Filter(docs, "doc_id", "text")
      .select("doc_id", "n_kept", "c4_keep")
    val q = scored.writeStream.format("memory").queryName("stream_c4")
      .outputMode("append").start()
    try {
      val rows = Seq(
        (1L, "This sentence has the needed words inside.\nAnd another fine sentence lands right here.\nA third one closes out the page."),
        (2L, "short { page"))
      in.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("stream_c4")
        .as[(Long, Int, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      val batch = graft.ops.Curation.c4Filter(rows.toDF("doc_id", "text"),
          "doc_id", "text")
        .select("doc_id", "n_kept", "c4_keep")
        .as[(Long, Int, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      assert(got == batch, "stream and batch C4 decisions must be identical")
      assert(got(1L)._2 && !got(2L)._2)
    } finally q.stop()
    // knBigramNll: aggregation-under-join makes it a complete-mode shape;
    // the supported streaming form is scoring a micro-BATCH via
    // foreachBatch with the batch operator — assert the batch operator is
    // deterministic across two invocations (what a foreachBatch replay
    // relies on), same rule as nearDupBatch idempotence
    val s1 = graft.ops.TextOps.knBigramNll(rows2DF, train, "doc_id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val s2 = graft.ops.TextOps.knBigramNll(rows2DF, train, "doc_id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(s1 == s2 && s1.nonEmpty)
  }

  private lazy val rows2DF = {
    import spark.implicits._
    Seq((1L, "the cat sat on the mat"), (2L, "dog runs fast")).toDF("doc_id", "text")
  }

  test("upsample (mixture resampling) emits the same copies on-stream as in batch") {
    import org.apache.spark.sql.{functions => F}
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, String)]
    val docs = in.toDF().toDF("doc_id", "source", "text")
    // stateless projection + explode: runs per-row on a stream, no state,
    // no watermark — the content-hash copy decision is batch-identical
    val up = graft.ops.Sampling.upsampleByGroup(docs, F.col("source"),
      F.col("text"), factors = Map("web" -> 2.5, "junk" -> 0.0), defaultFactor = 1.0)
    val q = up.writeStream.format("memory").queryName("stream_upsample")
      .outputMode("append").start()
    try {
      val rows = (1L to 100L).map { i =>
        val src = if (i % 2 == 0) "web" else if (i % 5 == 0) "junk" else "books"
        (i, src, s"document body number $i")
      }
      in.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("stream_upsample")
        .select("doc_id", "rep").as[(Long, Long)].collect().toSet
      val batch = graft.ops.Sampling.upsampleByGroup(
          rows.toDF("doc_id", "source", "text"), F.col("source"), F.col("text"),
          factors = Map("web" -> 2.5, "junk" -> 0.0), defaultFactor = 1.0)
        .select("doc_id", "rep").as[(Long, Long)].collect().toSet
      assert(batch.nonEmpty && got == batch,
        "stream and batch must emit identical copy sets")
      assert(!got.exists { case (id, _) => id % 2 == 1 && id % 5 == 0 },
        "junk source must be dropped on-stream")
    } finally q.stop()
  }

  test("nearDupStream admits first occurrences, drops near-dups within batch AND vs the store") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-neardup-stream")
    val store = dir.resolve("store").toString
    val ckpt = dir.resolve("ckpt").toString
    val base = "the quick brown fox jumps over the lazy dog while the cat " +
      "watches quietly from the warm windowsill in the afternoon sun near the garden"
    val other = "completely different subject matter entirely numbers statistics " +
      "spreadsheets quarterly revenue margins forecasts audits compliance filings"
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    val q = StreamOps.nearDupStream(docs, "doc_id", "text", store, ckpt)
    try {
      // batch 1: 1 and 3 are near-copies -> keep-first (1); 2 unrelated
      in.addData((1L, base), (2L, other), (3L, base + " today"))
      q.processAllAvailable()
      val after1 = spark.read.parquet(store).select("doc_id")
        .as[Long].collect().toSet
      assert(after1 == Set(1L, 2L), s"got $after1")
      // batch 2: 4 near-dups the STORE (doc 1, accepted a batch ago);
      // 5 is genuinely new
      in.addData((4L, base + " again"),
        (5L, "fresh unrelated prose about mountain weather patterns and " +
          "alpine climbing routes with rope techniques and glacier safety"))
      q.processAllAvailable()
      val after2 = spark.read.parquet(store).select("doc_id")
        .as[Long].collect().toSet
      assert(after2 == Set(1L, 2L, 5L), s"got $after2")
    } finally q.stop()
  }

  test("nearDupBatch replay is a no-op: same batchId applied twice leaves the store unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft-neardup-replay")
    val store = dir.resolve("store").toString
    val mk = (rows: Seq[(Long, String)]) => rows.toDF("doc_id", "text")
    val b0 = mk(Seq(
      (1L, "the quick brown fox jumps over the lazy dog while the cat " +
        "watches quietly from the warm windowsill in the afternoon sun"),
      (2L, "completely different subject matter entirely numbers statistics " +
        "spreadsheets quarterly revenue margins forecasts audits compliance")))
    StreamOps.nearDupBatch(b0, 0L, "doc_id", "text", store)
    val once = spark.read.parquet(store).select("doc_id", "__batch")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(once.map(_._1) == Seq(1L, 2L) && once.forall(_._2 == 0L), s"got $once")
    // crash-between-append-and-commit replay: foreachBatch re-runs batch 0.
    // Without the stamp, docs 1 and 2 would self-collide with their stored
    // copies (dropped, but ALSO re-appended by a naive guard); with it the
    // second application must not touch the store at all.
    StreamOps.nearDupBatch(b0, 0L, "doc_id", "text", store)
    val twice = spark.read.parquet(store).select("doc_id", "__batch")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(twice == once, s"replay changed the store: $once -> $twice")
    // a genuinely NEW batch with the next id still appends normally
    StreamOps.nearDupBatch(mk(Seq((5L, "fresh unrelated prose about mountain " +
      "weather patterns and alpine climbing routes with rope techniques"))),
      1L, "doc_id", "text", store)
    val after = spark.read.parquet(store).select("doc_id")
      .as[Long].collect().toSet
    assert(after == Set(1L, 2L, 5L), s"got $after")
  }

  test("streaming late-event monitor matches the batch disorder flags " +
      "across micro-batches, in-batch disorder absorbed by arrival sort") {
    implicit val sqlCtx = spark.sqlContext
    implicit val sp = spark
    val in = MemoryStream[StreamOps.ArrivalEvent]
    val q = StreamOps.lateEventStream(in.toDS())
      .writeStream.format("memory").queryName("lates")
      .outputMode("append").start()
    try {
      // user 1 arrival order 1..4, event times 10, 20, 15, 30 min:
      // arrival 3 is late by 5 min. Split ACROSS batches after arrival
      // 2 — the one-long state carries max(ts) over the boundary.
      // Fed out of arrival order WITHIN batch 1 (2 before 1) — the
      // arrival_id sort absorbs it.
      in.addData(
        StreamOps.ArrivalEvent(1L, ts(20), 2L),
        StreamOps.ArrivalEvent(1L, ts(10), 1L))
      q.processAllAvailable()
      in.addData(
        StreamOps.ArrivalEvent(1L, ts(15), 3L),
        StreamOps.ArrivalEvent(1L, ts(30), 4L))
      q.processAllAvailable()
      val got = spark.table("lates")
        .as[StreamOps.LateOut].collect().sortBy(_.arrival_id).toSeq
      assert(got == Seq(
        StreamOps.LateOut(1L, 1L, late = false, 0L),
        StreamOps.LateOut(1L, 2L, late = false, 0L),
        StreamOps.LateOut(1L, 3L, late = true, 5L * 60L * 1000L),
        StreamOps.LateOut(1L, 4L, late = false, 0L)), got)
      // parity with the batch census on the same rows: one late event,
      // lateness 5 min = 300_000_000 us
      val batch = Seq((1L, ts(10), 1L, "t"), (1L, ts(20), 2L, "t"),
        (1L, ts(15), 3L, "t"), (1L, ts(30), 4L, "t"))
        .toDF("user_id", "ts", "arrival_id", "event_type")
      val census = graft.ops.EventOps.disorderCensus(batch,
        tieCol = "arrival_id").collect()(0)
      assert(census.getLong(2) == 1L &&
        census.getLong(4) == 300000000L, census)
    } finally q.stop()
  }

  test("streaming transitions match the batch matrix counts across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    implicit val sp = spark
    val in = MemoryStream[StreamOps.TypedEvent]
    val q = StreamOps.transitionStream(in.toDS())
      .writeStream.format("memory").queryName("trans")
      .outputMode("append").start()
    try {
      // user 1: a -> b (batch 1), then b -> a ACROSS the batch boundary —
      // the O(1) state carries the last event over; user 2: single event,
      // no transition
      in.addData(
        StreamOps.TypedEvent(1L, ts(1), "a"),
        StreamOps.TypedEvent(1L, ts(2), "b"),
        StreamOps.TypedEvent(2L, ts(1), "a"))
      q.processAllAvailable()
      in.addData(StreamOps.TypedEvent(1L, ts(10), "a"))
      q.processAllAvailable()
      val got = spark.table("trans")
        .groupBy("prev_type", "next_type").agg(F.count(F.lit(1)).as("n"))
        .as[(String, String, Long)].collect().toSet
      assert(got == Set(("a", "b", 1L), ("b", "a", 1L)), got.toString)
      // within-batch disorder is absorbed by the event-time sort
      in.addData(
        StreamOps.TypedEvent(3L, ts(21), "y"),
        StreamOps.TypedEvent(3L, ts(20), "x"))
      q.processAllAvailable()
      val u3 = spark.table("trans").filter(F.col("user_id") === 3L)
        .as[StreamOps.Transition].collect().toSeq
      assert(u3 == Seq(StreamOps.Transition(3L, "x", "y")), u3.toString)
    } finally q.stop()
  }

  test("stream-stream attribution join pairs touches with in-window conversions only") {
    implicit val sqlCtx = spark.sqlContext
    val touches = MemoryStream[StreamOps.TypedEvent]
    val convs = MemoryStream[StreamOps.TypedEvent]
    val q = StreamOps.attributionStream(touches.toDS(), convs.toDS(),
      windowMinutes = 60)
      .writeStream.format("memory").queryName("attr")
      .outputMode("append").start()
    try {
      // u1: click 10 min before purchase -> pair; u2: touch > 1 h before
      // -> no pair; u3: touch AFTER the conversion -> no pair
      touches.addData(
        StreamOps.TypedEvent(1L, ts(10), "click"),
        StreamOps.TypedEvent(2L, ts(0), "view"),
        StreamOps.TypedEvent(3L, ts(83), "click"))
      convs.addData(
        StreamOps.TypedEvent(1L, ts(20), "purchase"),
        StreamOps.TypedEvent(2L, ts(130), "purchase"),
        StreamOps.TypedEvent(3L, ts(66), "purchase"))
      q.processAllAvailable()
      val got = spark.table("attr")
        .as[(Long, String, Timestamp, Timestamp)].collect()
        .map(t => (t._1, t._2)).toSet
      assert(got == Set((1L, "click")), got.toString)
    } finally q.stop()
  }

  test("streaming CUSUM carries the two-long state across batches and matches the closed form") {
    implicit val sqlCtx = spark.sqlContext
    implicit val sp = spark
    val in = MemoryStream[StreamOps.Metric]
    val q = StreamOps.cusumStream(in.toDS(), k = 10L)
      .writeStream.format("memory").queryName("cusum")
      .outputMode("append").start()
    try {
      // K = 10; x = [12, 8, 15] in batch 1, [5, 20] in batch 2 — the same
      // series OpsSpec pins for the batch closed form: s = [2, 0, 5, 0, 10]
      in.addData(StreamOps.Metric("m", ts(1), 12L),
        StreamOps.Metric("m", ts(2), 8L), StreamOps.Metric("m", ts(3), 15L))
      q.processAllAvailable()
      in.addData(StreamOps.Metric("m", ts(4), 5L),
        StreamOps.Metric("m", ts(5), 20L))
      q.processAllAvailable()
      val got = spark.table("cusum").orderBy("ts")
        .as[StreamOps.CusumOut].collect().map(_.cusum).toSeq
      assert(got == Seq(2L, 0L, 5L, 0L, 10L), got.toString)
      // in-batch disorder absorbed by the event-time sort
      in.addData(StreamOps.Metric("d", ts(11), 30L),
        StreamOps.Metric("d", ts(10), 5L))
      q.processAllAvailable()
      val d = spark.table("cusum").filter(F.col("key") === "d")
        .orderBy("ts").as[StreamOps.CusumOut].collect().map(_.cusum).toSeq
      assert(d == Seq(0L, 20L), d.toString) // 5-10 floors at 0, then +20
    } finally q.stop()
  }

  test("streaming PSI drift: the on-baseline window stays quiet, the shifted one alarms") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Double)]
    val scores = in.toDF().toDF("ts", "score")
    // uniform baseline over the 10 bins
    val baseline = (0L to 9L).map(b => (b, 0.1)).toDF("bin", "p")

    val q = StreamOps.scoreDriftBins(scores, F.col("score"), "ts",
        windowDur = "10 minutes", watermarkDelay = "2 minutes")
      .writeStream.format("memory").queryName("driftbins")
      .outputMode("append").start()
    try {
      // window 1 (10:00-10:10): one score per bin — matches the baseline
      in.addData((0 until 10).map(b => (ts(b % 10), b / 10.0 + 0.05)): _*)
      // window 2 (10:10-10:20): everything in the top bin — hard drift
      in.addData((0 until 10).map(i => (ts(10 + i % 10), 0.95)): _*)
      q.processAllAvailable()
      in.addData((ts(40), 0.5)) // watermark closes both windows
      q.processAllAvailable()
      val psi = StreamOps.psiOfBinCounts(spark.table("driftbins"), baseline)
        .select(F.col("win.start").cast("string"), F.col("psi"))
        .as[(String, Double)].collect().toMap
      val quiet = psi("2026-01-01 10:00:00")
      val loud = psi("2026-01-01 10:10:00")
      assert(quiet == 0.0, s"on-baseline window must read 0, got $quiet")
      assert(loud > 1.0, s"shifted window must alarm, got $loud")
    } finally q.stop()
  }

  test("streaming histogram quantiles: bin-exact p50/p95, late row folds " +
      "in before the watermark closes") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Double)]
    val vals = in.toDF().toDF("ts", "v")
    val q = StreamOps.valueHistogramStream(vals, F.col("v"), "ts",
        windowDur = "10 minutes", watermarkDelay = "2 minutes",
        binWidth = 10.0)
      .writeStream.format("memory").queryName("vbins")
      .outputMode("append").start()
    try {
      // window 1: values 0..98 in-order, then 99 LATE (same window,
      // inside the watermark) — counts must still read 10 per bin
      in.addData((0 until 99).map(i => (ts(i % 10), i.toDouble)): _*)
      q.processAllAvailable()
      in.addData((ts(9), 99.0))
      q.processAllAvailable()
      in.addData((ts(40), 5.0)) // closes window 1
      q.processAllAvailable()
      val got = StreamOps.quantilesOfValueBins(
          spark.table("vbins").filter(
            F.col("win.start").cast("string") === "2026-01-01 10:00:00"),
          binWidth = 10.0)
        .select("n", "p", "bin", "lo", "hi")
        .as[(Long, Double, Long, Double, Double)].collect().toSeq
      // 10 per bin over 0..99: p50 → bin 4 [40,50); p95/p99 → bin 9
      assert(got == Seq((100L, 0.5, 4L, 40.0, 50.0),
        (100L, 0.95, 9L, 90.0, 100.0),
        (100L, 0.99, 9L, 90.0, 100.0)), got)
    } finally q.stop()
  }

  test("streaming space-saving: hot token survives with valid bounds, " +
      "cold ones evict, state stays capacity-bounded") {
    implicit val sqlCtx = spark.sqlContext
    implicit val ss = spark
    val in = MemoryStream[StreamOps.Tok]
    // ONE shard so capacity pressure is deterministic in the test
    val q = StreamOps.heavyHittersStream(in.toDS(), capacity = 3,
        nShards = 1)
      .writeStream.format("memory").queryName("hh")
      .outputMode("append").start()
    try {
      in.addData((1 to 10).map(i => StreamOps.Tok(ts(i), "hot")) ++
        Seq(StreamOps.Tok(ts(11), "warm"), StreamOps.Tok(ts(12), "warm"),
          StreamOps.Tok(ts(13), "cold1")))
      q.processAllAvailable()
      // batch 2: a flood of singletons churns the third slot; hot/warm
      // must survive and keep exact counts (err 0)
      in.addData(Seq(StreamOps.Tok(ts(20), "hot")) ++
        (1 to 4).map(i => StreamOps.Tok(ts(20 + i), s"one$i")))
      q.processAllAvailable()
      import spark.implicits._
      // the LAST emission per shard is the current summary: rows from the
      // final batch only
      val all = spark.table("hh")
        .as[StreamOps.HeavyHitter].collect()
      val last = all.groupBy(_.token).map { case (_, v) => v.maxBy(_.count) }
      val byTok = last.map(h => h.token -> h).toMap
      assert(byTok("hot").count == 11L && byTok("hot").err == 0L, byTok)
      assert(byTok("warm").count == 2L && byTok("warm").err == 0L, byTok)
      // space-saving bound: stored - err <= true; singles inherited the
      // evicted minimum's count so err > 0 on churned slots
      val churned = last.filter(h => h.token.startsWith("one"))
      assert(churned.forall(h => h.count - h.err <= 1L), churned.toSeq)
      // capacity bound: the final batch emitted at most 3 counters
      val lastBatchRows = all.count(_.token == "one4") // survivor of churn
      assert(lastBatchRows >= 1, all.toSeq.toString)
    } finally q.stop()
  }

  test("kmvSampleStream: exact bottom-k of the distinct set, repetition-" +
      "invariant; estimate is exact below k and sane above") {
    implicit val sqlCtx = spark.sqlContext
    implicit val ss = spark
    // the operator's hash, re-derived for the expected bottom-k: the
    // batch construction (md5 hex prefix, 52 bits) shared with
    // Sketches.kmvDistinct since the advisor-r12 fix
    def h64(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.lang.Long.parseLong(
        d.take(7).map(b => f"$b%02x").mkString.substring(0, 13), 16)
    }
    val in = MemoryStream[StreamOps.Tok]
    val q = StreamOps.kmvSampleStream(in.toDS(), k = 4, nShards = 1)
      .writeStream.format("memory").queryName("kmv")
      .outputMode("append").start()
    try {
      val uniq = Seq("a", "b", "c", "d", "e", "f")
      in.addData(uniq.zipWithIndex.map { case (s, i) =>
        StreamOps.Tok(ts(i), s) } ++
        (1 to 20).map(i => StreamOps.Tok(ts(20 + i), "hot")))
      q.processAllAvailable()
      // a flood of repeats + the same uniques again: state must not move
      in.addData((1 to 50).map(i => StreamOps.Tok(ts(100 + i), "hot")) ++
        uniq.map(s => StreamOps.Tok(ts(200), s)))
      q.processAllAvailable()
      val all = spark.table("kmv").as[StreamOps.KmvRow].collect()
      val expect = (uniq :+ "hot").map(s => (h64(s), s)).sorted.take(4)
      // every emission (both batches) is the SAME exact bottom-4
      val emitted = all.groupBy(_.rank).toSeq
      assert(all.map(r => (r.hash, r.key)).toSet == expect.toSet,
        s"got ${all.toSeq} want $expect")
      assert(all.forall(_.n_seen == 4L), all.toSeq.toString)
      assert(emitted.forall(_._2.map(_.key).distinct.size == 1),
        "bottom-k changed across repetition-only batches")
    } finally q.stop()

    // below-k regime: the estimate is the exact distinct count
    val in2 = MemoryStream[StreamOps.Tok]
    val q2 = StreamOps.kmvSampleStream(in2.toDS(), k = 8, nShards = 1)
      .writeStream.format("memory").queryName("kmv2")
      .outputMode("append").start()
    try {
      in2.addData(Seq(StreamOps.Tok(ts(1), "x"), StreamOps.Tok(ts(2), "y"),
        StreamOps.Tok(ts(3), "z"), StreamOps.Tok(ts(4), "x")))
      q2.processAllAvailable()
      val r = spark.table("kmv2").as[StreamOps.KmvRow].collect()
      assert(r.length == 3 && r.forall(_.est_shard == 3.0), r.toSeq)
    } finally q2.stop()

    // above-k regime: 400 distinct keys, k=32 -> KMV within +-40%
    val in3 = MemoryStream[StreamOps.Tok]
    val q3 = StreamOps.kmvSampleStream(in3.toDS(), k = 32, nShards = 1)
      .writeStream.format("memory").queryName("kmv3")
      .outputMode("append").start()
    try {
      in3.addData((1 to 400).map(i => StreamOps.Tok(ts(i % 50), s"u$i")))
      q3.processAllAvailable()
      val est = spark.table("kmv3").as[StreamOps.KmvRow].collect()
        .map(_.est_shard).max
      assert(est > 240.0 && est < 560.0, s"KMV estimate $est for 400")
    } finally q3.stop()
  }

  test("streaming Page-Hinkley carries the four-long state across " +
      "batches and matches the batch closed form") {
    implicit val sqlCtx = spark.sqlContext
    implicit val sp = spark
    val in = MemoryStream[StreamOps.Metric]
    val q = StreamOps.pageHinkleyStream(in.toDS(), delta = 0.0,
        lambda = 6.0)
      .writeStream.format("memory").queryName("ph")
      .outputMode("append").start()
    try {
      // daily counts [10, 10, 10] then [2, 2] — the same series the
      // batch OpsSpec pins: mt = 0,0,0,-6,-10.8; ph = 0,0,0,6,10.8;
      // alarm strictly > 6 fires on the LAST row only
      in.addData(StreamOps.Metric("m", ts(1), 10L),
        StreamOps.Metric("m", ts(2), 10L),
        StreamOps.Metric("m", ts(3), 10L))
      q.processAllAvailable()
      in.addData(StreamOps.Metric("m", ts(4), 2L),
        StreamOps.Metric("m", ts(5), 2L))
      q.processAllAvailable()
      val got = spark.table("ph").orderBy("ts")
        .as[StreamOps.PhOut].collect()
        .map(o => (o.mt, o.ph, o.alarm)).toSeq
      assert(got == Seq((0.0, 0.0, false), (0.0, 0.0, false),
        (0.0, 0.0, false), (-6.0, 6.0, false), (-10.8, 10.8, true)),
        got.toString)
      // in-batch disorder: event-time sort absorbs it
      in.addData(StreamOps.Metric("d", ts(11), 2L),
        StreamOps.Metric("d", ts(10), 10L))
      q.processAllAvailable()
      val d = spark.table("ph").filter(F.col("key") === "d")
        .orderBy("ts").as[StreamOps.PhOut].collect()
        .map(o => (o.value, o.ph)).toSeq
      // sorted: 10 (mean 10, term 0) then 2 (mean 6, term -4) -> ph 4
      assert(d == Seq((10L, 0.0), (2L, 4.0)), d.toString)
    } finally q.stop()
  }
}
