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
    val results = selected.map { case (name, fn) =>
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
      name -> (System.nanoTime() - t0) / 1e9
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
    val qs = results.map { case (k, v) => s"\"" + shortId(k) + "\":" + s3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    try {
      val full = results.map { case (k, v) => s"\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val w = new java.io.PrintWriter("bench_detail.json")
      try w.println(s"""{"total":$total,"queries":$full,"failed":$failedJson,"sf":"$sfDir"}""")
      finally w.close()
    } catch { case _: Throwable => }
    // Stop Spark BEFORE printing the summary so no executor/stage log line
    // can land after it — the JSON must be the last stdout line for the
    // driver's tail-window parse.
    spark.stop()
    println(s"""{"metric":"total","value":${s3(total)},"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    System.out.flush()
  }
}
