package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries ns timestamps; Spark is µs-native (SURVEY §1)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    // ERROR, not WARN: the PRQL whole-relation windows (q09 et al) emit a
    // WindowExec warning per run, and sbt flushes forked stderr late — in
    // rounds 2-4 those lines landed AFTER the summary JSON and pushed it out
    // of the driver's 2000-char tail window (BENCH_r0{2,3,4} parsed:null).
    spark.sparkContext.setLogLevel("ERROR")
    // Warm the session (codegen, JIT, parquet footers, AQE machinery) so
    // per-query timings reflect steady state rather than whichever query
    // happens to run first absorbing JVM startup. Count EVERY table the
    // suite reads — with only lineitem+documents warmed, the first
    // orders/events/embeddings query in sort order absorbed the cold
    // parquet read and drifted between rounds as the suite grew.
    try {
      Seq("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")
        .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
      SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => }
    // SPARK_GRAFT_ONLY=x04_...,x16_... limits the run (scale-stress a few
    // heavy queries on a bigger SF without paying for the whole suite)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).toSet).filter(_.nonEmpty)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    // JVM-health instrumentation so a future reader can adjudicate wall-time
    // outliers: per-query GC delta separates allocation pressure from plan
    // cost, and executor run/cpu time separates "the query did more work"
    // from "the host was contended" (task_ms flat + wall up = contention;
    // cpu_ms ≪ task_ms = threads starved or blocked on I/O).
    val taskMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val taskCpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) { taskMs.addAndGet(m.executorRunTime); taskCpuNs.addAndGet(m.executorCpuTime) }
      }
    })
    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    // total JIT code-cache occupancy (all CodeHeap segments) — sampled
    // around every query so the recurring interpreted-execution anomaly
    // (r8/r11/r13: cpu≈run at 3-17x the ledger envelope on untouched code)
    // adjudicates mechanically from bench_detail.json: an outlier whose
    // ch_used sits near the reserve, or whose ch_delta is strongly
    // negative (a flush just evicted compiled methods), is JVM state, not
    // a plan regression.
    def chUsed: Long = java.lang.management.ManagementFactory
      .getMemoryPoolMXBeans.asScala
      .filter(_.getName.startsWith("CodeHeap")).map(_.getUsage.getUsed).sum
    // JIT-state telemetry (r15, the r8/r11/r13/r14 warm-JVM anomaly —
    // code-cache occupancy alone did NOT explain r14's outliers, so name
    // the remaining HotSpot mechanism per query): jit_ms is the JVM's
    // cumulative compiler-thread time (a query that triggers a
    // recompilation storm shows a large delta on unchanged code), and the
    // hsperf counters sun.ci.totalBailouts / sun.ci.totalInvalidates
    // count compile bailouts and nmethod invalidations (the
    // deopt→reprofile→recompile cycle that, past
    // PerMethodRecompilationCutoff, makes a method PERMANENTLY
    // not-compilable — the leading theory for cpu≈wall outliers late in a
    // 460-query JVM). Counters are read via jvmstat self-attach,
    // reflectively: no compile-time module dependency, silent null where
    // the module isn't exported (build.sbt adds it for forked runs).
    def jitMs: Long = {
      val c = java.lang.management.ManagementFactory.getCompilationMXBean
      if (c != null && c.isCompilationTimeMonitoringSupported)
        c.getTotalCompilationTime else -1L
    }
    // reflection resolves every member on the EXPORTED types
    // (MonitoredHost/MonitoredVm/Monitor) — resolving on the runtime impl
    // classes (sun.jvmstat.perfdata.*, unexported) throws
    // InaccessibleObjectException and would silently zero the telemetry
    val ciState: Option[(Class[_], Any, Any)] = try {
      val mhC = Class.forName("sun.jvmstat.monitor.MonitoredHost")
      val mvC = Class.forName("sun.jvmstat.monitor.MonitoredVm")
      val monC = Class.forName("sun.jvmstat.monitor.Monitor")
      val idC = Class.forName("sun.jvmstat.monitor.VmIdentifier")
      val pid = java.lang.ProcessHandle.current().pid()
      val vmId = idC.getConstructor(classOf[String]).newInstance(pid.toString)
      val host = mhC.getMethod("getMonitoredHost", idC).invoke(null, vmId)
      val vm = mhC.getMethod("getMonitoredVm", idC).invoke(host, vmId)
      val find = mvC.getMethod("findByName", classOf[String])
      val bail = find.invoke(vm, "sun.ci.totalBailouts")
      val inval = find.invoke(vm, "sun.ci.totalInvalidates")
      if (bail != null && inval != null) Some((monC, bail, inval)) else None
    } catch { case e: Throwable =>
      System.err.println(s"[bench] jvmstat counters unavailable " +
        s"(ci_* will report -1): ${e.getClass.getSimpleName}: ${e.getMessage}")
      None
    }
    def ciValue(monC: Class[_], m: Any): Long = try {
      monC.getMethod("getValue").invoke(m) match {
        case l: java.lang.Long => l.longValue; case _ => -1L }
    } catch { case _: Throwable => -1L }
    val ciMonitors: Option[(Any, Any)] = ciState.map(s => (s._2, s._3))
    def ciRead(m: Any): Long =
      ciState.map(s => ciValue(s._1, m)).getOrElse(-1L)
    def ciBailouts: Long = ciMonitors.map(m => ciRead(m._1)).getOrElse(-1L)
    def ciInvalidates: Long = ciMonitors.map(m => ciRead(m._2)).getOrElse(-1L)
    // JIT compile-QUEUE depth (r15, the run that killed the deopt theory:
    // a reproduced anomaly band showed ci_invalidates=0, ci_bailouts=0,
    // normal per-query jit_ms — but jit_total_ms ~2/3 of the run's wall,
    // i.e. compiler threads saturated). HotSpot's tiered compile
    // THRESHOLDS scale UP with queue length per compiler thread
    // (advancedThresholdPolicy): under a deep C2 queue a short-lived
    // generated method never qualifies and runs interpreted for its whole
    // life — cpu≈wall at 5-25x on untouched code, exactly the signature.
    // Bracket every query with the queue depth so an outlier's row names
    // the mechanism (hot + cq_pre high = threshold-scaled/starved;
    // hot + cq≈0 = genuinely slower plan).
    val dcmdTarget: Option[(javax.management.MBeanServer,
        javax.management.ObjectName)] = try {
      Some((java.lang.management.ManagementFactory.getPlatformMBeanServer,
        new javax.management.ObjectName(
          "com.sun.management:type=DiagnosticCommand")))
    } catch { case _: Throwable => None }
    def compileQueueDepth: Int = dcmdTarget.map { case (srv, on) =>
      try {
        val out = srv.invoke(on, "compilerQueue",
          Array[AnyRef](null), Array("[Ljava.lang.String;"))
          .asInstanceOf[String]
        // one "sig::method (n bytes)" line per queued/in-flight compile
        out.split('\n').count(_.contains("::"))
      } catch { case _: Throwable => -1 }
    }.getOrElse(-1)
    // Memory-system telemetry (r15 run 3 killed the queue theory too: an
    // anomalous x43 read cpu≈wall at 6x with an EMPTY compile queue,
    // normal jit_ms, zero invalidations). getThreadCpuTime counts cycles
    // on-CPU including stall cycles and kernel time — a query can read
    // 17x "CPU" while executing the same compiled instructions if the
    // process is fighting page faults or THP/compaction (host memory
    // state, invisible to every JIT counter). /proc/self/stat minflt(10)
    // majflt(12) stime(15, ticks) deltas name that mechanism per query:
    // a hot row with a fault/kernel-time spike is host memory state, a
    // hot row with flat faults and flat jit is a genuine plan cost.
    // USER_HZ measured, not assumed (ADVICE r15): `getconf CLK_TCK` once,
    // fall back to the Linux-universal 100 if the exec fails
    val userHz: Long = try {
      val p = new ProcessBuilder("getconf", "CLK_TCK").start()
      val out = new String(p.getInputStream.readAllBytes()).trim
      p.waitFor()
      val v = out.toLong
      if (v > 0) v else 100L
    } catch { case _: Throwable => 100L }
    def procStat: (Long, Long, Long) = try {
      val s = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/self/stat")))
      // field 2 is "(comm)" which may contain spaces — split after ')'
      val rest = s.substring(s.lastIndexOf(')') + 2).split(" ")
      // rest(0) is field 3 (state); minflt=field 10 -> rest(7),
      // majflt=field 12 -> rest(9), stime=field 15 -> rest(12)
      (rest(7).toLong, rest(9).toLong,
        rest(12).toLong * 1000L / userHz) // stime ticks -> ms
    } catch { case _: Throwable => (-1L, -1L, -1L) }
    // Effective-CPU-speed probe (r15: THP/compaction ruled out on this
    // host — THP=madvise, compact_stall=0, zero memory pressure — and the
    // run-1 anomaly band was TEMPORALLY CONTIGUOUS in execution order,
    // which is the signature of a host-level CPU-speed window: frequency
    // throttling or hypervisor interference inflates ON-CPU seconds for
    // the same instructions, with cpu≈wall and every JVM counter clean).
    // Time a fixed pure-ALU xorshift loop before each query: the probe's
    // nanoseconds are a direct per-query index of effective CPU speed —
    // a hot query whose spin_ns also inflated is host CPU state, named
    // mechanically; a hot query at nominal spin_ns is genuinely doing
    // more work. ~2-4 ms per probe, ~1.5 s per 476-query suite.
    val spinSink = new java.util.concurrent.atomic.AtomicLong(0L)
    def spinProbeNs: Long = {
      var x = 0x9E3779B97F4A7C15L
      val t0 = System.nanoTime()
      var i = 0
      while (i < 4000000) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        i += 1
      }
      spinSink.addAndGet(x) // defeat dead-code elimination
      System.nanoTime() - t0
    }
    def stealTicks: Long = try {
      val first = scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu ")).getOrElse("")
      val f = first.trim.split("\\s+")
      if (f.length > 8) f(8).toLong else -1L // field: steal
    } catch { case _: Throwable => -1L }
    final case class QStat(sec: Double, gcMs: Long, taskMs: Long,
                           taskCpuMs: Long, chUsed: Long, chDelta: Long,
                           jitMs: Long, bailDelta: Long, invalDelta: Long,
                           cqPre: Int, cqPost: Int, pfMinor: Long,
                           pfMajor: Long, sysMs: Long, spinNs: Long,
                           stealDelta: Long)
    // compile the probe loop itself before measuring with it
    locally { (1 to 3).foreach(_ => spinProbeNs) }
    val results = selected.map { case (name, fn) =>
      org.apache.spark.GraftListeners.drain(spark.sparkContext)
      val (gc0, tk0, cp0, ch0) = (gcMs, taskMs.get, taskCpuNs.get, chUsed)
      val (jit0, bail0, inv0) = (jitMs, ciBailouts, ciInvalidates)
      val cq0 = compileQueueDepth
      val (mnf0, mjf0, sys0) = procStat
      val steal0 = stealTicks
      val spin0 = spinProbeNs
      val t0 = System.nanoTime()
      // noop sink materializes every column (count() would let Spark prune
      // projections and under-report the real work)
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        // A broken query must surface as a failure, not masquerade as a
        // fast timing (a bench-only regression like an sf0.1 OOM would
        // otherwise read as a speedup).
        failed += name
        System.err.println(s"[bench] FAILED $name: ${e.getMessage}")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftListeners.drain(spark.sparkContext)
      val ch1 = chUsed
      val invalDelta = if (inv0 < 0) -1L else ciInvalidates - inv0
      // an invalidation burst on one query = the deopt→recompile cycle
      // ran hot RIGHT HERE; say so loudly instead of leaving a mystery
      // wall-time outlier for the ledger reader
      if (invalDelta > 20)
        System.err.println(s"[bench] WARNING: $name saw $invalDelta nmethod " +
          "invalidations (deopt storm) — its wall time reflects JVM state, " +
          "not plan cost")
      val stealNow = if (steal0 < 0) -1L else stealTicks - steal0
      // a steal burst = the hypervisor ran a co-tenant on our vCPUs
      // during THIS query (run 10: steal>100 ⇒ median 1.70× ledger) —
      // name it so the wall outlier self-adjudicates as host state
      if (stealNow > 200)
        System.err.println(f"[bench] WARNING: $name saw $stealNow steal " +
          f"ticks (${stealNow.toDouble / userHz}%.1f s of stolen vCPU) — " +
          "its wall time reflects hypervisor interference, not plan cost")
      val (mnf1, mjf1, sys1) = procStat
      name -> QStat(sec, gcMs - gc0, taskMs.get - tk0,
        (taskCpuNs.get - cp0) / 1000000L, ch1, ch1 - ch0,
        if (jit0 < 0) -1L else jitMs - jit0,
        if (bail0 < 0) -1L else ciBailouts - bail0,
        invalDelta, cq0, compileQueueDepth,
        if (mnf0 < 0) -1L else mnf1 - mnf0,
        if (mjf0 < 0) -1L else mjf1 - mjf0,
        if (sys0 < 0) -1L else sys1 - sys0,
        spin0, stealNow)
    }
    // The driver keeps only the LAST 2000 chars of output, and the one-line
    // JSON outgrew that window at 78 full-name ns-precision entries
    // (BENCH_r02/r03 both recorded parsed:null). Print short ids (the
    // unique qNN/xNN prefix) at ms precision — ~13 chars/query keeps ~140
    // queries inside the window alongside sbt's trailing lines — and write
    // the full-name, full-precision map to bench_detail.json for the
    // BASELINE.md ledger.
    def s3(v: Double): String = f"$v%.3f"
    def shortId(name: String): String = name.takeWhile(_ != '_')
    // Round-10 follow-up: at 197 queries even the short-id map is ~2.5k
    // chars — past the window again. Print only the TOP-60 slowest (the
    // rows a perf reader actually looks at, ~800 chars) plus an explicit
    // omission count; the FULL map always lands in bench_detail.json and
    // the BASELINE.md ledger.
    val topN = 60
    val slowest = results.sortBy(-_._2.sec).take(topN)
    val qs = slowest.map { case (k, v) => s"\"" + shortId(k) + "\":" + s3(v.sec) }
      .mkString("{", ",", "}")
    val omitted = math.max(0, results.size - topN)
    val total = results.map(_._2.sec).sum
    // Oracle-math twins exist to VERIFY selection math via DuckDB-replayable
    // primitives (per-gram md5 + fixed constants); their xxhash64 siblings
    // (x02/x16/x03/x07/x04/x71) are the production surface. production_total
    // is the gate number for that surface — the twins' md5 tax is a
    // verification cost, not an engine cost.
    val oracleTwins = Set("x22_ngram_jaccard_fixed", "x42_winnow_fixed",
      "x43_minhash_fixed", "x44_simhash_fixed", "x45_lsh_bucket",
      "x70_dsir_weights", "x431_chunk_minhash_fixed",
      "x442_compress_census_fixed", "x478_media_neardup_verify")
    val prodTotal = results.filterNot(r => oracleTwins(r._1)).map(_._2.sec).sum
    // Steal-defending rerun (r15 verdict ask #4): the headline BENCH json
    // is ONE run, and a hypervisor steal window can read a query at 3-25x
    // its clean ledger (r15: x424 164 s wall with 355 s kernel time vs a
    // 2.9 s clean median) — 4x over gate on a contended host while clean
    // runs sit AT gate. Mechanically self-defend: re-run (once, same warm
    // JVM) every query whose wall exceeded 3x the suite's median per-query
    // wall AND that saw steal (>100 ticks) during its window, then report
    // value_rerun_min = Σ min(first, rerun) beside the raw value. A
    // genuine plan cost reproduces on the rerun (min ≈ first); a steal
    // artifact collapses to the clean time.
    val medSec = {
      val s = results.map(_._2.sec).sorted
      if (s.isEmpty) 0.0 else s(s.length / 2)
    }
    val rerunCandidates = results.filter { case (_, v) =>
      v.sec > 3.0 * medSec && v.stealDelta > 100 }
    val rerunCap = 80 // bound the worst case (a whole-suite steal storm)
    val toRerun = rerunCandidates.sortBy(-_._2.sec).take(rerunCap)
    if (rerunCandidates.size > toRerun.size)
      System.err.println(s"[bench] rerun capped at $rerunCap of " +
        s"${rerunCandidates.size} steal-hit queries (slowest first)")
    // A failed rerun must NOT contribute its (near-zero, fail-fast)
    // elapsed time: min(first, broken-rerun) would deflate the headline
    // and make a genuinely slow-or-broken query look clean. Only
    // reruns that COMPLETED enter the map; failures log and fall back
    // to the first-run timing.
    val rerunSecs: Map[String, Double] = toRerun.flatMap { case (name, _) =>
      val t0 = System.nanoTime()
      val ok =
        try {
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          true
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] rerun $name FAILED " +
              s"(${e.getClass.getSimpleName}: ${e.getMessage}) — " +
              "keeping first-run timing")
            false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      if (ok) {
        System.err.println(f"[bench] rerun $name: $sec%.3f s")
        Some(name -> sec)
      } else None
    }.toMap
    def minSec(k: String, v: QStat): Double =
      math.min(v.sec, rerunSecs.getOrElse(k, v.sec))
    val totalRerunMin = results.map { case (k, v) => minSec(k, v) }.sum
    val prodRerunMin = results.filterNot(r => oracleTwins(r._1))
      .map { case (k, v) => minSec(k, v) }.sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Run-level contention indicator: parallelism = Σ executor task time /
    // wall. On an otherwise-idle local[cpus] host heavy queries should push
    // well past 1; a run whose wall doubled while parallelism (and per-query
    // task_ms) held steady was co-scheduled with something, not regressed.
    val sumTaskMs = results.map(_._2.taskMs).sum
    val sumGcMs = results.map(_._2.gcMs).sum
    val par = if (total > 0) sumTaskMs / 1000.0 / total else 0.0
    // JIT code-cache health: when the cache fills, HotSpot silently stops
    // compiling and trivial plans run interpreted at 20-60x real-CPU cost
    // (q26's 61 s on a 1k-row projection in BENCH_r08 — VERDICT r8). Report
    // per-CodeHeap occupancy so a future outlier self-adjudicates, and
    // warn loudly when any segment is effectively full.
    val codeHeaps = java.lang.management.ManagementFactory.getMemoryPoolMXBeans
      .asScala.filter(_.getName.startsWith("CodeHeap")).map { p =>
        val u = p.getUsage
        (p.getName, u.getUsed, u.getMax)
      }.toSeq
    codeHeaps.foreach { case (n, used, max) =>
      if (max > 0 && used.toDouble / max > 0.9)
        System.err.println(f"[bench] WARNING: JIT code cache segment '$n' is " +
          f"${used.toDouble / max * 100}%.0f%% full ($used/$max bytes) — " +
          "HotSpot may have stopped compiling; timings in this run are suspect")
    }
    val codeCacheJson = codeHeaps.map { case (n, used, max) =>
      s"""{"pool":"${n.replace("'", "")}","used":$used,"max":$max}"""
    }.mkString("[", ",", "]")
    try {
      val full = results.map { case (k, v) =>
        val rerun = rerunSecs.get(k).map(r => s""","rerun_sec":$r""").getOrElse("")
        s"\"" + k + "\":" + s"""{"sec":${v.sec},"gc_ms":${v.gcMs},"task_ms":${v.taskMs},"task_cpu_ms":${v.taskCpuMs},"ch_used":${v.chUsed},"ch_delta":${v.chDelta},"jit_ms":${v.jitMs},"ci_bailouts":${v.bailDelta},"ci_invalidates":${v.invalDelta},"cq_pre":${v.cqPre},"cq_post":${v.cqPost},"pf_minor":${v.pfMinor},"pf_major":${v.pfMajor},"sys_ms":${v.sysMs},"spin_ns":${v.spinNs},"steal_ticks":${v.stealDelta}$rerun}"""
      }.mkString("{", ",", "}")
      // the twin list rides along so downstream tooling (scripts/ledger.py)
      // reads ONE source of truth — a twin added here but not there would
      // otherwise silently skew production sums between the two ledgers
      val twinsJson = oracleTwins.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
      val sumJit = results.map(_._2.jitMs).filter(_ >= 0).sum
      val sumInval = results.map(_._2.invalDelta).filter(_ >= 0).sum
      val sumBail = results.map(_._2.bailDelta).filter(_ >= 0).sum
      val maxCq = (results.map(_._2.cqPre) ++ results.map(_._2.cqPost))
        .foldLeft(-1)(math.max)
      val stealSum = results.map(_._2.stealDelta).filter(_ >= 0).sum
      val spinSorted = results.map(_._2.spinNs).sorted
      val spinMed = if (spinSorted.isEmpty) -1L
        else spinSorted(spinSorted.length / 2)
      val w = new java.io.PrintWriter("bench_detail.json")
      try w.println(s"""{"total":$total,"total_rerun_min":$totalRerunMin,"production_total":$prodTotal,"production_rerun_min":$prodRerunMin,"reruns":${rerunSecs.size},"gc_total_ms":$sumGcMs,"task_total_ms":$sumTaskMs,"jit_total_ms":$sumJit,"ci_invalidates_total":$sumInval,"ci_bailouts_total":$sumBail,"cq_max":$maxCq,"steal_ticks_total":$stealSum,"spin_ns_median":$spinMed,"parallelism":${f"$par%.2f"},"cpus":$cpus,"code_cache":$codeCacheJson,"oracle_twins":$twinsJson,"queries":$full,"failed":$failedJson,"sf":"$sfDir"}""")
      finally w.close()
    } catch { case _: Throwable => }
    // Stop Spark BEFORE printing the summary so no executor/stage log line
    // can land after it — the JSON must be the last stdout line for the
    // driver's tail-window parse.
    spark.stop()
    // steal_sec rides the driver-visible summary so a slow round total
    // self-adjudicates as hypervisor interference without opening the
    // detail file (run 10: 1475-tick bursts inside single queries)
    val stealSec =
      results.map(_._2.stealDelta).filter(_ >= 0).sum.toDouble / userHz
    // Per-query steal for the printed top-60 (r18 verdict ask #7,
    // ADDITIVE-only: "queries" stays the same name→sec map): a top-60 row
    // whose steal_q entry is large self-adjudicates as host interference
    // without the detail file. Bounded to the 20 largest entries above 50
    // ticks so the one-line JSON stays inside the driver's 2000-char tail
    // window even in a whole-suite steal storm.
    val stealQ = slowest.filter(_._2.stealDelta > 50)
      .sortBy(-_._2.stealDelta).take(20)
      .map { case (k, v) => "\"" + shortId(k) + "\":" + v.stealDelta }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${s3(total)},"unit":"sec","value_rerun_min":${s3(totalRerunMin)},"production_total":${s3(prodTotal)},"production_rerun_min":${s3(prodRerunMin)},"reruns":${rerunSecs.size},"gc_sec":${s3(sumGcMs / 1000.0)},"steal_sec":${s3(stealSec)},"parallelism":${f"$par%.2f"},"n_queries":${results.size},"queries":$qs,"steal_q":$stealQ,"queries_omitted":$omitted,"failed":$failedJson,"sf":"$sfDir"}""")
    System.out.flush()
  }
}
