package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Database connectors for `-d/--database` — the Spark mapping of the
  * reference's scanner-attach dispatch (/root/reference/src/backends/duckdb.rs:71-112).
  *
  * `postgres://` maps onto Spark's built-in JDBC source: each `--from`
  * source names a (schema-qualified) table, mirroring the reference's
  * per-source `postgres_scan('<uri>', '<schema>', '<table>')` CTE
  * (duckdb.rs:37-48). The `?currentSchema=` suffix is parsed with the same
  * shape as duckdb.rs:87-99. There is no PostgreSQL JDBC driver (and no
  * network) in this sandbox, so a real read fails loudly at connect time —
  * which is exactly the contract: URL parsing, table-name resolution and
  * option plumbing are the testable surface.
  *
  * `sqlite://` attaches via the native file-format DSv2 reader
  * ([[SqliteV2]]). `duckdb://` (the reference README's own example,
  * README.md:204: `pq --database duckdb://…/chinook.duckdb`) attaches a
  * DuckDB database file through the DuckDB JDBC driver on the classpath —
  * per-`--from` table reads, or attach-all from the live catalog with zero
  * sources, mirroring the reference's direct `duckdb.rs:108-111` open. The
  * file opens READ-ONLY (multiple JDBC partitions may each hold a
  * connection; DuckDB only allows concurrent opens of the same file in
  * read-only mode) and the path must exist — DuckDB would otherwise
  * CREATE an empty database at the given path and every query would fail
  * with "unknown table" instead of the truth.
  */
object Connectors {

  final case class ConnectorError(msg: String) extends RuntimeException(msg)

  final case class PostgresTarget(
      jdbcUrl: String,
      schema: String,
      user: Option[String],
      password: Option[String])

  /** Parse `postgres://[user[:pass]@]host[:port]/db[?currentSchema=s]` (the
    * reference regex `^(?P<uri>[^?]+)(?P<schema>\?currentSchema=.+)?$`,
    * duckdb.rs:87-99; schema defaults to `public`) into the JDBC form
    * `jdbc:postgresql://host[:port]/db` + credential properties. */
  def parsePostgres(database: String): PostgresTarget = {
    val (uri, schema) = database.indexOf("?currentSchema=") match {
      case -1 =>
        if (database.contains("?"))
          throw ConnectorError(
            s"unsupported postgres URL parameter in '$database' (only ?currentSchema= is recognized)")
        (database, "public")
      case i => (database.substring(0, i), database.substring(i + "?currentSchema=".length))
    }
    val rest = uri match {
      case u if u.startsWith("postgresql://") => u.stripPrefix("postgresql://")
      case u if u.startsWith("postgres://")   => u.stripPrefix("postgres://")
      case u => throw ConnectorError(s"not a postgres URL: '$u'")
    }
    val (authority, path) = rest.indexOf('/') match {
      case -1 => throw ConnectorError(s"postgres URL needs a /database path: '$database'")
      case i  => (rest.substring(0, i), rest.substring(i + 1))
    }
    if (path.isEmpty)
      throw ConnectorError(s"postgres URL needs a database name: '$database'")
    // last '@' splits credentials from host:port (passwords may contain '@';
    // hostnames may not)
    val (creds, hostPort) = authority.lastIndexOf('@') match {
      case -1 => (None, authority)
      case i  => (Some(authority.substring(0, i)), authority.substring(i + 1))
    }
    val (user, password) = creds match {
      case None => (None, None)
      case Some(c) => c.indexOf(':') match {
        case -1 => (Some(c), None)
        case i  => (Some(c.substring(0, i)), Some(c.substring(i + 1)))
      }
    }
    PostgresTarget(s"jdbc:postgresql://$hostPort/$path", schema, user, password)
  }

  /** Split a `--from` table spec into (schema, table) exactly like the
    * reference (duckdb.rs:37-48): unqualified tables default to `public`
    * (NOT the URL's currentSchema — that only scopes attach-all); for
    * deeper qualification the last two parts win. */
  def splitQualified(source: String): (String, String) = {
    val parts = source.split('.')
    if (parts.length == 1) ("public", parts(0))
    else (parts(parts.length - 2), parts(parts.length - 1))
  }

  /** JDBC reader options for one table spec — pure (testable without a live
    * server). `fetchsize` keeps cursor batches bounded; for genuinely large
    * tables callers should add `partitionColumn`/`lowerBound`/`upperBound`/
    * `numPartitions` or the read is a single executor-side cursor. */
  def jdbcOptions(t: PostgresTarget, source: String): Map[String, String] = {
    val (schema, table) = splitQualified(source)
    Map(
      "url" -> t.jdbcUrl,
      "dbtable" -> s""""$schema"."$table"""",
      "fetchsize" -> "10000",
      "driver" -> "org.postgresql.Driver") ++
      t.user.map("user" -> _) ++ t.password.map("password" -> _)
  }

  /** List every table of the target schema from the live JDBC catalog —
    * the attach-all half of the reference's `postgres_attach`
    * (duckdb.rs:104-106). Fails loudly (with the reference behavior named)
    * when no driver / no server is reachable, which is this sandbox's case;
    * with a driver on the classpath it returns the catalog's TABLE rows. */
  def listTables(target: PostgresTarget): Seq[String] = {
    val props = new java.util.Properties()
    target.user.foreach(props.setProperty("user", _))
    target.password.foreach(props.setProperty("password", _))
    val conn =
      try java.sql.DriverManager.getConnection(target.jdbcUrl, props)
      catch {
        case e: java.sql.SQLException =>
          throw ConnectorError(
            "attach-all (no --from) mirrors the reference's postgres_attach, " +
              s"which scans every table of schema '${target.schema}' from the live " +
              s"catalog; the catalog connection failed: ${e.getMessage}")
      }
    try {
      val rs = conn.getMetaData.getTables(null, target.schema, "%", Array("TABLE"))
      val b = Seq.newBuilder[String]
      while (rs.next()) b += rs.getString("TABLE_NAME")
      val tables = b.result()
      if (tables.isEmpty)
        throw ConnectorError(s"schema '${target.schema}' has no tables to attach")
      tables
    } finally conn.close()
  }

  /** Strip `duckdb://` and validate the database file exists — DuckDB
    * CREATES missing files on open, which would turn a typo'd path into
    * an empty database and "unknown table" errors downstream. */
  def parseDuckdb(database: String): String = {
    if (!database.startsWith("duckdb://"))
      throw ConnectorError(s"not a duckdb URL: '$database'")
    val path = database.stripPrefix("duckdb://")
    if (path.isEmpty)
      throw ConnectorError("duckdb:// URL needs a database file path")
    if (!new java.io.File(path).isFile)
      throw ConnectorError(
        s"duckdb database file '$path' does not exist (DuckDB would " +
          "silently create an empty database there; refusing)")
    path
  }

  /** JDBC reader options for one DuckDB table spec. Unqualified names
    * resolve in DuckDB's default `main` schema; qualified specs keep the
    * last two parts ([[splitQualified]] with a `main` default).
    * `duckdb.read_only` is the DuckDB JDBC property that permits several
    * concurrent connections (Spark opens one per JDBC partition) to one
    * database file. */
  def duckdbJdbcOptions(path: String, source: String): Map[String, String] = {
    val parts = source.split('.')
    val (schema, table) =
      if (parts.length == 1) ("main", parts(0))
      else (parts(parts.length - 2), parts(parts.length - 1))
    Map(
      "url" -> s"jdbc:duckdb:$path",
      "dbtable" -> s""""$schema"."$table"""",
      "driver" -> "org.duckdb.DuckDBDriver",
      "duckdb.read_only" -> "true")
  }

  /** Table list of the file's `main` schema from the live DuckDB catalog
    * — the attach-all half (zero `--from` sources), same contract as the
    * postgres [[listTables]]. */
  def listDuckdbTables(path: String): Seq[String] = {
    Class.forName("org.duckdb.DuckDBDriver")
    val props = new java.util.Properties()
    props.setProperty("duckdb.read_only", "true")
    val conn =
      try java.sql.DriverManager.getConnection(s"jdbc:duckdb:$path", props)
      catch {
        case e: java.sql.SQLException =>
          throw ConnectorError(
            s"could not open duckdb database '$path': ${e.getMessage}")
      }
    try {
      // types=null + a TABLE_TYPE filter: DuckDB's JDBC catalog reports
      // base tables as "BASE TABLE" (not the JDBC-conventional "TABLE"),
      // so a types=["TABLE"] filter silently matches nothing
      val rs = conn.getMetaData.getTables(null, "main", "%", null)
      val b = Seq.newBuilder[String]
      while (rs.next())
        if (rs.getString("TABLE_TYPE").contains("TABLE"))
          b += rs.getString("TABLE_NAME")
      val tables = b.result()
      if (tables.isEmpty)
        throw ConnectorError(s"duckdb database '$path' has no tables to attach")
      tables
    } finally conn.close()
  }

  /** Register each `--from` table spec against a DuckDB database file;
    * with zero sources, attach every `main`-schema table like the
    * reference's direct file open (duckdb.rs:108-111) — a user of the
    * README.md:204 example sees every table of the file by name. */
  def registerDuckdb(spark: SparkSession, database: String,
                     specs: Seq[String]): Map[String, DataFrame] = {
    val path = parseDuckdb(database)
    Class.forName("org.duckdb.DuckDBDriver")
    val effective =
      if (specs.nonEmpty) specs
      else listDuckdbTables(path).map(t => s"$t=$t")
    effective.map { spec =>
      val (name, source) = Registrar.standardiseSource(spec)
      val df = spark.read.format("jdbc")
        .options(duckdbJdbcOptions(path, source)).load()
      df.createOrReplaceTempView(name)
      name -> df
    }.toMap
  }

  /** Register each `--from` table spec against a postgres database; with
    * zero sources, attach every table of the URL's schema like the
    * reference's `postgres_attach` (duckdb.rs:104-106) — the table list
    * comes from the live JDBC catalog via [[listTables]]. */
  def registerPostgres(spark: SparkSession, database: String,
                       specs: Seq[String]): Map[String, DataFrame] = {
    val target = parsePostgres(database)
    val effective =
      if (specs.nonEmpty) specs
      // attach-all names are schema-qualified with the URL's currentSchema
      // (matching attach-all's scope); the view name is the bare table name
      else listTables(target).map(t => s"$t=${target.schema}.$t")
    effective.map { spec =>
      val (name, source) = Registrar.standardiseSource(spec)
      val df = spark.read.format("jdbc").options(jdbcOptions(target, source)).load()
      df.createOrReplaceTempView(name)
      name -> df
    }.toMap
  }
}
