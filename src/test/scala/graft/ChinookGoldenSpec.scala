package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import graft.prql.Graft
import graft.sources.Registrar
import graft.io.Writers

/** End-to-end goldens reproducing the reference README's own examples on its
  * vendored Chinook CSVs (reference examples/chinook/csv/ dir, expected
  * outputs at README.md:23-49, 151-159, 184-197). These are the strongest
  * parity fixtures the reference ships (it has no test suite — SURVEY §5).
  */
class ChinookGoldenSpec extends AnyFunSuite {

  val csvDir = "/root/reference/examples/chinook/csv"
  lazy val spark: SparkSession = SparkTest.session

  def load(specs: String*): Map[String, DataFrame] =
    Registrar.registerAll(spark, specs.map(s => s"$csvDir/$s".replace(s"$csvDir/", csvDir + "/")))

  test("README.md:23-32 — take 5 on albums.csv") {
    val tables = Registrar.registerAll(spark, Seq(s"$csvDir/albums.csv"))
    val rows = Graft.compile("from albums | take 5", tables)(spark)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2)))
    assert(rows.toSeq == Seq(
      (1, "For Those About To Rock We Salute You", 1),
      (2, "Balls to the Wall", 2),
      (3, "Restless and Wild", 2),
      (4, "Let There Be Rock", 1),
      (5, "Big Ones", 3)))
  }

  test("parquet-format chinook gives the same take-5 as csv (multi-format parity)") {
    val csv = Registrar.registerAll(spark, Seq(s"$csvDir/albums.csv"))
    val viaCsv = Graft.compile("from albums | take 5", csv)(spark).collect().map(_.toString).toSeq
    val pq = Registrar.registerAll(spark,
      Seq(s"pq_albums=/root/reference/examples/chinook/parquet/albums.parquet"))
    val viaParquet = Graft.compile("from pq_albums | take 5", pq)(spark)
      .collect().map(_.toString).toSeq
    assert(viaParquet == viaCsv)
  }

  test("README.md:34-49 — join + f-string derive + group by bare key + sort + take") {
    val tables = Registrar.registerAll(spark,
      Seq(s"i=$csvDir/invoices.csv", s"c=$csvDir/customers.csv"))
    // stage 1: join + derive name (README writes parquet; we exercise the
    // same Writers round-trip)
    val joined = Graft.compile(
      """from i
        |join c [customer_id]
        |derive [name = f"{first_name} {last_name}"]""".stripMargin, tables)(spark)
    val tmp = java.nio.file.Files.createTempDirectory("golden").toString + "/invoices_with_names.parquet"
    Writers.write(joined, Some(tmp), Writers.Parquet)
    // stage 2: group by the derived name (bare key form!), top spenders
    val t2 = Registrar.registerAll(spark, Seq(tmp))
    val out = Graft.compile(
      "from invoices_with_names | group name (aggregate [spend = sum total]) | sort [-spend] | take 10",
      t2)(spark).collect().map(r => (r.getString(0), r.getDouble(1)))
    val expected = Seq(
      ("Helena Holý", 49.620000000000005), ("Richard Cunningham", 47.620000000000005),
      ("Luis Rojas", 46.62), ("Hugh O'Reilly", 45.62), ("Ladislav Kovács", 45.62),
      ("Julia Barnett", 43.620000000000005), ("Fynn Zimmermann", 43.62),
      ("Frank Ralston", 43.62), ("Astrid Gruber", 42.62), ("Victor Stevens", 42.62))
    // spend values must match bit-for-bit (binary-float sums, FIXTURES.md);
    // order within equal spend is engine-dependent → compare as sets and
    // verify the spend column is non-increasing
    assert(out.map(_._2).sameElements(expected.map(_._2)))
    assert(out.toSet == expected.toSet)
  }

  test("README.md:151-159 — CSV schema inference incl. ns timestamps, quoting, UTF-8") {
    val tables = Registrar.registerAll(spark, Seq(s"$csvDir/invoices.csv"))
    val rows = Graft.compile("from invoices | take 5", tables)(spark).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4, 5))
    assert(rows(0).getString(3) == "Theodor-Heuss-Straße 34") // UTF-8
    assert(rows(0).getAs[java.sql.Timestamp]("invoice_date").toString == "2009-01-01 00:00:00.0")
    assert(rows(3).getString(5) == "AB") // billing_state present for row 4
    assert(rows(0).isNullAt(5)) // empty billing_state → null
    assert(rows.map(_.getDouble(8)).toSeq == Seq(1.98, 3.96, 5.94, 8.91, 13.86))
  }

  test("README.md:184-197 — customer_totals.prql verbatim via json round-trip") {
    val tables = Registrar.registerAll(spark, Seq(s"$csvDir/invoices.csv"))
    val prql = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/examples/queries/customer_totals.prql")))
    val totals = Graft.compile("from invoices | " + prql, tables)(spark)
    val tmp = java.nio.file.Files.createTempDirectory("golden").toString + "/customer_totals.json"
    Writers.write(totals, Some(tmp), Writers.Json)
    val t2 = Registrar.registerAll(spark, Seq(tmp))
    val out = Graft.compile("from customer_totals | sort [-customer_total] | take 10", t2)(spark)
      .collect().map(r => (r.getAs[Number]("customer_id").longValue, r.getDouble(1)))
    val expected = Seq(
      (6L, 49.620000000000005), (26L, 47.620000000000005), (57L, 46.62),
      (46L, 45.62), (45L, 45.62), (28L, 43.620000000000005), (37L, 43.62),
      (24L, 43.62), (7L, 42.62), (25L, 42.62))
    assert(out.map(_._2).sameElements(expected.map(_._2)))
    assert(out.toSet == expected.toSet)
  }

  test("invoice_totals.prql verbatim (the reference's flagship example)") {
    // README.md:167 registers the CSVs aliasless; the query's own
    // `from i=invoices` / `join ii=invoice_items` does the aliasing.
    val tables = Registrar.registerAll(spark,
      Seq(s"$csvDir/invoices.csv", s"$csvDir/invoice_items.csv"))
    val prql = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/examples/queries/invoice_totals.prql")))
    val got = Graft.compile(prql, tables)(spark)
    // oracle: the exact SQL the reference generates (README.md:105-129),
    // DuckDB STRFTIME translated to date_format, LAG frame dropped (Spark
    // rejects explicit frames on lag; result is identical)
    tables("invoices").createOrReplaceTempView("i")
    tables("invoice_items").createOrReplaceTempView("ii")
    val exp = spark.sql(
      """SELECT
        |  date_format(i.invoice_date, 'yyyy-MM') AS month,
        |  date_format(i.invoice_date, 'yyyy-MM-dd') AS day,
        |  COUNT(DISTINCT i.invoice_id) AS num_orders,
        |  SUM(ii.quantity) AS num_tracks,
        |  SUM(ii.unit_price * ii.quantity) AS total_price,
        |  SUM(SUM(ii.quantity)) OVER (
        |    PARTITION BY date_format(i.invoice_date, 'yyyy-MM')
        |    ORDER BY date_format(i.invoice_date, 'yyyy-MM-dd')
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_total_num_tracks,
        |  LAG(SUM(ii.quantity), 7) OVER (
        |    ORDER BY date_format(i.invoice_date, 'yyyy-MM-dd')) AS num_tracks_last_week
        |FROM i JOIN ii USING (invoice_id)
        |GROUP BY 1, 2
        |ORDER BY day""".stripMargin)
    assert(got.columns.toSeq == exp.columns.toSeq)
    val a = got.collect().map(_.toString).toSeq
    val b = exp.collect().map(_.toString).toSeq
    assert(a == b, s"mismatch:\n got ${a.take(3)}\n exp ${b.take(3)}")
  }
}
