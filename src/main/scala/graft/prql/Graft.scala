package graft.prql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Public compile API: PRQL text + registered tables → DataFrame.
  *
  * Mirrors the reference's architectural seam (SURVEY.md §3 EP3): sources
  * enter the *compiler environment* as named relation bindings
  * (/root/reference/src/backends/duckdb.rs:53-59), not the query string.
  */
object Graft {

  /** Compile and lower a PRQL query against the given table bindings. */
  def compile(prql: String, tables: Map[String, DataFrame])(implicit spark: SparkSession): DataFrame = {
    val q = Parser.parse(prql)
    Lowering.lowerQuery(q, Lowering.Env(spark, tables, Map.empty, Map.empty))
  }

  /** Convenience: compile against every parquet table in a testdata dir
    * (TESTDATA.md layout: `<dir>/<table>.parquet`). */
  def compileDir(prql: String, spark: SparkSession, dir: String): DataFrame =
    compile(prql, graft.sources.Registrar.loadParquetDir(spark, dir))(spark)

  /** `--no-exec` equivalent (main.rs:56-57): render the analyzed logical plan
    * instead of executing — our "generated SQL". */
  def explain(prql: String, tables: Map[String, DataFrame])(implicit spark: SparkSession): String =
    compile(prql, tables).queryExecution.analyzed.toString()
}
