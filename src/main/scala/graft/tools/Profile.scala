package graft.tools
import org.apache.spark.sql.{SparkSession, functions => F}
import graft.ops.Dedup
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name: ${(System.nanoTime()-t0)/1e9}%.2f s, rows=$n")
    }
    time("signatures")(Dedup.minhashSignatures(docs, "doc_id", "text", 5, 128).count())
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text", 5, 128).cache()
    time("signatures_cached")(sig.count())
    // banding
    val bands = 16; val rows = 128/bands
    val banded = sig.select(F.col("doc_id"), F.col("__sig"),
      F.explode(F.array((0 until bands).map { b =>
        F.struct(F.lit(b).as("band"), F.xxhash64(F.slice(F.col("__sig"), b*rows+1, rows)).as("bh"))
      }: _*)).as("__band"))
      .select(F.col("doc_id"), F.col("__sig"), F.col("__band.band"), F.col("__band.bh"))
    time("banded")(banded.count())
    val l = banded.select(F.col("band"), F.col("bh"), F.col("doc_id").as("a"))
    val r = banded.select(F.col("band"), F.col("bh"), F.col("doc_id").as("b"))
    time("join_pairs")(l.join(r, Seq("band","bh")).filter(F.col("a") < F.col("b")).count())
    time("full_minhashPairs")(Dedup.minhashPairs(docs, "doc_id", "text").count())
    spark.stop()
  }
}
