package graft.tools
import org.apache.spark.sql.{SparkSession, functions => F}
import graft.ops.Dedup

/** Ad-hoc stage-by-stage timing for the hot extension ops (dev tool, not
  * part of the driver contract). Run:
  * sbt 'runMain graft.tools.Profile /root/testdata/sf0.1'
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s, rows=$n")
    }
    time("sig_64")(Dedup.minhashSignatures(docs, "doc_id", "text", 5, 64).count())
    time("pairs_t03")(Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.3).count())
    val cands = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.3)
      .select("a", "b").cache()
    time("cands_cached")(cands.count())
    time("jaccard_on_cached")(
      Dedup.ngramJaccard(cands, docs, "doc_id", "text")
        .filter(F.col("jaccard") >= 0.3).count())
    cands.unpersist()
    time("x04_full")({
      val c = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.3)
      Dedup.ngramJaccard(c.select("a", "b"), docs, "doc_id", "text")
        .filter(F.col("jaccard") >= 0.3).count()
    })
    spark.stop()
  }
}
