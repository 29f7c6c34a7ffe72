package graft

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{SqliteFile, SqliteV2}

/** Native SQLite file-format reader (graft.sources.SqliteFile / SqliteV2).
  *
  * Goldens come from two places: the reference repo's own chinook.sqlite
  * (read in place, like ChinookGoldenSpec does with the CSVs — values
  * cross-checked against the sqlite3 CLI), and purpose-built fixtures under
  * src/test/resources/sqlite/ (scripts/make_sqlite_fixtures.sh) covering
  * the format's corners: every serial-type width, rowid aliasing incl.
  * negative/gapped rowids, overflow-page payload chains, multi-level
  * b-trees over 512-byte pages, UTF-16 text encoding, ALTER TABLE short
  * records with DEFAULTs, WITHOUT ROWID rejection, hot-journal rejection.
  */
class SqliteSpec extends AnyFunSuite {
  private def res(name: String): String =
    getClass.getResource(s"/sqlite/$name").getPath
  private val chinook = "/root/reference/examples/chinook/sqlite/chinook.sqlite"

  test("chinook: attach-all registers every table with sqlite3-verified counts") {
    val spark = SparkTest.session
    val tables = SqliteV2.registerSqlite(spark, s"sqlite://$chinook", Nil)
    assert(tables.keySet == Set("albums", "artists", "customers", "employees",
      "genres", "invoice_items", "invoices", "media_types", "playlist_track",
      "playlists", "tracks"))
    val counts = Map("albums" -> 347L, "artists" -> 275L, "tracks" -> 3503L,
      "invoice_items" -> 2240L, "invoices" -> 412L, "playlist_track" -> 8715L,
      "employees" -> 8L, "customers" -> 59L, "genres" -> 25L,
      "media_types" -> 5L, "playlists" -> 18L)
    counts.foreach { case (t, n) => assert(tables(t).count() == n, t) }
    // spot values (sqlite3: artist_id 155 → Zeca Pagodinho; track 3500)
    assert(tables("artists").where(F.col("artist_id") === "155")
      .select("name").head().getString(0) == "Zeca Pagodinho")
    val t3500 = tables("tracks").where(F.col("track_id") === "3500")
      .select("composer", "unit_price").head()
    assert(t3500.getString(0) == "Franz Schubert" && t3500.getString(1) == "0.99")
  }

  test("chinook: albums⋈artists aggregate matches the sqlite3 CLI") {
    val spark = SparkTest.session
    SqliteV2.registerSqlite(spark, s"sqlite://$chinook", Nil)
    val top = spark.sql(
      """SELECT a.name, count(*) n FROM albums al
        |JOIN artists a ON al.artist_id = a.artist_id
        |GROUP BY a.name ORDER BY n DESC, a.name LIMIT 5""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(top == Seq("Iron Maiden" -> 21L, "Led Zeppelin" -> 14L,
      "Deep Purple" -> 11L, "Metallica" -> 10L, "U2" -> 10L))
  }

  test("chinook: CLI e2e — the reference README's own sqlite example (README.md:213)") {
    implicit val spark = SparkTest.session
    val out = java.nio.file.Files.createTempDirectory("sqlite-e2e")
      .resolve("o.csv").toString
    Cli.run(Cli.parseArgs(Array(
      "-d", s"sqlite://$chinook", "--to", out, "from albums | take 10")))
    val got = spark.read.option("header", "true").csv(out)
    assert(got.count() == 10)
    assert(got.columns.toSeq == Seq("album_id", "title", "artist_id"))
  }

  test("types.db: every serial-type width, rowid alias, overflow, defaults") {
    val spark = SparkTest.session
    val df = SqliteV2.read(spark, res("types.db"), "t")
    import org.apache.spark.sql.types._
    assert(df.schema.map(f => (f.name, f.dataType)) == Seq(
      "id" -> LongType, "i" -> LongType, "r" -> DoubleType, "s" -> StringType,
      "b" -> BinaryType, "n" -> DoubleType, "added" -> StringType))
    val rows = df.collect().map(r => (
      r.get(0), r.get(1), r.get(2), r.get(3),
      Option(r.get(4)).map(_.asInstanceOf[Array[Byte]].toSeq).orNull,
      r.get(5), r.get(6)))
      .sortBy(t => t._1.asInstanceOf[Long])
    assert(rows.length == 19)
    val byId = rows.map(t => t._1.asInstanceOf[Long] -> t).toMap
    // negative rowid through the 9-byte varint path
    assert(byId(-5L) == ((-5L, 5L, 5.5, "neg rowid", null, 5.0, "dflt")))
    // serial types 8/9 (const 0/1) and empty text/blob
    assert(byId(1L) == ((1L, 0L, 0.0, "", Seq.empty[Byte], 0.0, "dflt")))
    assert(byId(2L) == ((2L, 1L, 1.5, "one", Seq[Byte](1), 1.25, "dflt")))
    assert(byId(3L) == ((3L, -1L, -2.75, "minus",
      Seq(0xde, 0xad, 0xbe, 0xef).map(_.toByte), -3.0, "dflt")))
    assert(byId(4L)._4 == "café → 値") // multibyte UTF-8
    // int-width ladder: 1..8 byte twos-complement serial types
    Seq(5L -> 128L, 6L -> 32767L, 7L -> 32768L, 8L -> 8388607L,
      9L -> 8388608L, 10L -> 2147483647L, 11L -> 2147483648L,
      12L -> 140737488355327L, 13L -> 140737488355328L,
      14L -> Long.MaxValue, 15L -> Long.MinValue)
      .foreach { case (id, v) => assert(byId(id)._2 == v, s"id=$id") }
    assert(byId(7L)._3 == 1e300)
    // sqlite's own text→float conversion lands one ULP off the JVM's for
    // -1e-300; the reader is byte-faithful to what the file stores
    assert(math.abs(byId(8L)._3.asInstanceOf[Double] / -1e-300 - 1.0) < 1e-14)
    // overflow-page chain: 12,000-char text + 20,000-byte blob in one record
    val o = byId(16L)
    assert(o._4.asInstanceOf[String].length == 12000)
    assert(o._4.asInstanceOf[String].forall(c => c == 'a' || c == 'b'))
    assert(o._5.asInstanceOf[Seq[Byte]].length == 20000 &&
      o._5.asInstanceOf[Seq[Byte]].forall(_ == 0))
    // ALTER TABLE ADD COLUMN: short records take the literal DEFAULT,
    // post-ALTER rows their stored value
    assert(byId(16L)._7 == "dflt" && byId(17L)._7 == "explicit")
    assert(byId(1000000L)._4 == "rowid gap")
  }

  test("deep.db: multi-level b-tree fans out into parallel subtree partitions") {
    val spark = SparkTest.session
    val df = SqliteV2.read(spark, res("deep.db"), "big")
    // 512-byte pages / 40k rows → 3+ levels; the scan must split
    assert(df.rdd.getNumPartitions > 1, "expected parallel subtree splits")
    val agg = df.agg(F.count("*"), F.sum("w"), F.min("k"), F.max("k")).head()
    // sqlite3: count 34286 (every 7th row deleted → freelist pages), sum(w)
    // 2057177145, k in [1, 40000]
    assert((agg.getLong(0), agg.getLong(1), agg.getLong(2), agg.getLong(3)) ==
      ((34286L, 2057177145L, 1L, 40000L)))
    assert(df.where(F.col("k") === 8).select("v").head().getString(0) == "row-8")
    // deleted keys are really gone
    assert(df.where(F.col("k") % 7 === 0).count() == 0)
  }

  test("deep.db: column pruning reaches the scan's read schema") {
    val spark = SparkTest.session
    val df = SqliteV2.read(spark, res("deep.db"), "big").select("k")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("k") && !scan.contains("v"),
      s"scan should read only k: $scan")
  }

  test("deep.db: rowid-range pushdown prunes b-tree subtrees, not just rows") {
    val spark = SparkTest.session
    val df = SqliteV2.read(spark, res("deep.db"), "big")
      .where(F.col("k") >= 20000 && F.col("k") <= 20010)
    // correctness: 20000..20010 minus the deleted k%7==0 row (20006)
    val got = df.select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (20000L to 20010L).filterNot(_ % 7 == 0))
    // the pushed window must reach the scan (visible in the plan), and the
    // walk must touch a small corner of the ~2,500-page file, not all of it
    assert(df.queryExecution.executedPlan.toString.contains("rowid=[20000,20010]"))
    val f = new SqliteFile(res("deep.db"), new org.apache.hadoop.conf.Configuration())
    try {
      val root = f.table("big").rootPage
      f.tableCells(root).size // full walk
      val fullPages = f.pagesRead
      f.pagesRead = 0
      val n = f.tableCells(root, 20000L, 20010L).size
      assert(n == 10)
      assert(f.pagesRead < fullPages / 20,
        s"bounded walk read ${f.pagesRead} of $fullPages pages")
    } finally f.close()
  }

  test("utf16.db: UTF-16le text decodes") {
    val spark = SparkTest.session
    val df = SqliteV2.read(spark, res("utf16.db"), "u")
    val got = df.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got == Seq(1L -> "plain", 2L -> "çédille", 3L -> "値段😀"))
  }

  test("worowid.db: WITHOUT ROWID is rejected loudly, siblings still attach") {
    val spark = SparkTest.session
    val reg = SqliteV2.registerSqlite(spark, s"sqlite://${res("worowid.db")}", Nil)
    assert(reg.keySet == Set("ok")) // wr skipped with a warning
    assert(reg("ok").head().getString(1) == "fine")
    val e = intercept[Exception](SqliteV2.read(spark, res("worowid.db"), "wr").collect())
    assert(e.getMessage.contains("WITHOUT ROWID"))
  }

  test("virtual.db: CREATE VIRTUAL TABLE is skipped in attach-all; shadow + plain tables read") {
    val spark = SparkTest.session
    val reg = SqliteV2.registerSqlite(spark, s"sqlite://${res("virtual.db")}", Nil)
    // the fts4 'ft' row (type='table', rootpage 0) is skipped; its shadow
    // tables are ordinary rowid tables and attach fine
    assert(!reg.keySet.contains("ft"), reg.keySet.toString)
    assert(reg.keySet.contains("plain") && reg.keySet.contains("ft_content"))
    assert(reg("plain").head().getString(1) == "real")
    assert(reg("ft_content").count() == 2)
    val e = intercept[Exception](SqliteV2.read(spark, res("virtual.db"), "ft").collect())
    assert(e.getMessage.contains("virtual"), e.getMessage)
  }

  test("checkpointed WAL-mode db reads in place (header-only -wal present)") {
    // wal.db is CLI-produced: journal_mode=WAL, wal_checkpoint(TRUNCATE),
    // both files copied while the connection was open — readVersion 2 with
    // a 0-byte -wal sidecar, the common at-rest state. Reference parity:
    // duckdb.rs:75-83's sqlite_scanner reads it; so must we.
    val spark = SparkTest.session
    val rows = SqliteV2.read(spark, res("wal.db"), "w")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq(1L -> "alpha", 2L -> "beta", 3L -> "gamma"))
  }

  test("WAL with pending frames → loud torn-snapshot error") {
    val spark = SparkTest.session
    val e = intercept[SqliteFile.FormatError](
      SqliteV2.read(spark, res("hotwal.db"), "h").collect())
    assert(e.getMessage.contains("non-checkpointed WAL"), e.getMessage)
  }

  test("hot journal sidecar → loud snapshot error") {
    val spark = SparkTest.session
    val dir = java.nio.file.Files.createTempDirectory("sqlite-jrn")
    val db = dir.resolve("j.db")
    java.nio.file.Files.copy(java.nio.file.Paths.get(res("types.db")), db)
    java.nio.file.Files.write(dir.resolve("j.db-journal"), Array[Byte](1, 2, 3))
    val e = intercept[SqliteFile.FormatError](
      SqliteV2.registerSqlite(spark, s"sqlite://$db", Nil))
    assert(e.getMessage.contains("journal"))
  }

  test("format primitives: varint widths and header parse") {
    // 1-byte, 2-byte, and the 9-byte (negative) encodings
    assert(SqliteFile.varint(Array[Byte](0x7f), 0) == ((127L, 1)))
    assert(SqliteFile.varint(Array[Byte](0x81.toByte, 0x00), 0) == ((128L, 2)))
    val neg = Array.fill[Byte](8)(0xff.toByte) :+ 0xfb.toByte // -5
    assert(SqliteFile.varint(neg, 0) == ((-5L, 9)))
    val e = intercept[SqliteFile.FormatError](
      SqliteFile.parseHeader("not a database".getBytes.padTo(100, 0.toByte), 100))
    assert(e.getMessage.contains("magic"))
  }

  test("CREATE TABLE parse: quoting styles, table constraints, affinities") {
    import org.apache.spark.sql.types._
    val m = SqliteFile.parseCreate(
      """CREATE TABLE x ("a b" VARCHAR(30) NOT NULL, [c] NUMERIC(10,2),
        |`d` BIGINT, e, f DATETIME DEFAULT '2020-01-01', g BOOLEAN DEFAULT TRUE,
        |PRIMARY KEY (d), FOREIGN KEY (e) REFERENCES y(z))""".stripMargin)
    assert(m.columns.map(_.name) == Seq("a b", "c", "d", "e", "f", "g"))
    assert(m.columns.map(_.sparkType) == Seq(StringType, DoubleType, LongType,
      BinaryType, StringType, DoubleType))
    assert(!m.columns(2).rowidAlias) // BIGINT is not INTEGER: no alias
    assert(m.columns(4).default == "2020-01-01" && m.columns(5).default == 1L)
    // table-level single-column INTEGER pk DOES alias
    val m2 = SqliteFile.parseCreate(
      "CREATE TABLE y (id INTEGER, v TEXT, PRIMARY KEY (id))")
    assert(m2.columns.head.rowidAlias)
    // DESC defeats the alias (datatype3.html §ROWIDs)
    val m3 = SqliteFile.parseCreate(
      "CREATE TABLE z (id INTEGER PRIMARY KEY DESC, v TEXT)")
    assert(!m3.columns.head.rowidAlias)
  }
}
