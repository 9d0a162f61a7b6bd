package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Single ingest entry point, JDBC-shaped: the reference's actual
  * transport is a JDBC poll against the source database
  * (reference connectors/cdc-timescale-connector.json:4-8 —
  * `connection.url/user/password`, `table.whitelist`, driver class picked
  * by the connector runtime), so the facade takes the same configuration
  * surface and switches the physical source on it — the mirror image of
  * [[graft.sink.TopicSink]] on the delivery side:
  *
  *   - `url = Some("jdbc:postgresql://…")` → Spark's `format("jdbc")`
  *     relation. Fails FAST with an actionable message when no suitable
  *     JDBC driver class is loadable (honest classpath detection — the
  *     zero-egress build ships no Postgres driver, and a misconfiguration
  *     must not surface as an opaque DataSource error at action time).
  *   - `url = None` → the parquet relation registry
  *     (`registryDir/<table>.parquet`, via [[graft.Tables.load]] so the
  *     events nanos contract holds) — the brokerless deployment and the
  *     test stand-in, exactly like TopicSink's file mode.
  *
  * Everything downstream is source-agnostic: the frame this returns feeds
  * [[graft.poll.IncrementalPoller.poll]] (the connector's
  * `timestamp+incrementing` mode) and the capture/delivery chain
  * unchanged, so a user moves a parquet-registry pipeline onto a live
  * database by setting one option.
  *
  * Scale shape: Spark's JDBC relation pushes filters and projections to
  * the remote database (the poll predicate `ts > :t OR (ts = :t AND
  * event_id > :i)` becomes the connector's btree index scan, not a table
  * dump — pinned against a live embedded Derby in JdbcDerbySpec, which
  * asserts the whole Or(ts>, And(ts=, event_id>)) disjunction lands in
  * the JDBC scan's PushedFilters), and `partitionColumn`/`numPartitions`
  * split the read into parallel range queries — the only way a
  * 1000-executor cluster drains a large backfill without serializing
  * through one connection.
  */
object JdbcSource {

  /** Mirrors connector.json's surface: `url`/`user`/`password` ↔
    * `connection.*` (connector.json:4-6), `tableWhitelist` ↔
    * `table.whitelist` (connector.json:7), partition bounds ↔ the
    * connector's `tasks.max` parallelism knob (connector.json:14).
    *
    * @param url             Some(jdbc url) → jdbc mode; None → registry mode
    * @param driver          explicit driver class; else inferred from the url
    * @param registryDir     parquet fallback root (registry mode)
    * @param partitionColumn with bounds + numPartitions → parallel range reads
    * @param jdbcOptions     extra passthrough options (fetchsize, …)
    */
  final case class Config(
      url: Option[String],
      user: Option[String] = None,
      password: Option[String] = None,
      driver: Option[String] = None,
      tableWhitelist: Seq[String] = Seq.empty,
      registryDir: Option[String] = None,
      partitionColumn: Option[String] = None,
      lowerBound: Option[String] = None,
      upperBound: Option[String] = None,
      numPartitions: Option[Int] = None,
      jdbcOptions: Map[String, String] = Map.empty
  )

  /** Driver classes by jdbc subprotocol — the same inference every
    * connector runtime performs; extend via Config.driver for anything
    * not listed.
    */
  val KnownDrivers: Map[String, String] = Map(
    "postgresql" -> "org.postgresql.Driver",
    "mysql" -> "com.mysql.cj.jdbc.Driver",
    "mariadb" -> "org.mariadb.jdbc.Driver",
    "sqlserver" -> "com.microsoft.sqlserver.jdbc.SQLServerDriver",
    "oracle" -> "oracle.jdbc.OracleDriver",
    "sqlite" -> "org.sqlite.JDBC",
    "duckdb" -> "org.duckdb.DuckDBDriver",
    "h2" -> "org.h2.Driver",
    "hive2" -> "org.apache.hive.jdbc.HiveDriver",
    // ships in Spark's jars dir — the one subprotocol the zero-egress
    // build can execute live (JdbcDerbySpec drives the whole jdbc branch
    // against an embedded jdbc:derby:memory database)
    "derby" -> "org.apache.derby.jdbc.EmbeddedDriver"
  )

  /** `jdbc:postgresql://host/db` → `postgresql`. */
  def subprotocol(url: String): Option[String] = url.split(":", 3) match {
    case Array("jdbc", sub, _*) if sub.nonEmpty => Some(sub)
    case _                                      => None
  }

  def driverClassFor(config: Config): Option[String] =
    config.driver.orElse(config.url.flatMap(subprotocol).flatMap(KnownDrivers.get))

  def driverOnClasspath(className: String): Boolean =
    // initialize = false: detection must not run the driver's static
    // initializers (a present-but-broken jar would otherwise explode
    // HERE with the opaque error this check exists to prevent);
    // LinkageError covers NoClassDefFoundError from broken jars too
    try { Class.forName(className, false, getClass.getClassLoader); true }
    catch { case _: ClassNotFoundException | _: LinkageError => false }

  /** The source plan a Config resolves to, as inspectable data — tests
    * assert on this instead of connecting to databases that don't exist
    * (the TopicSink.Resolved pattern).
    */
  final case class Resolved(format: String, options: Map[String, String])

  def resolve(config: Config, table: String): Resolved = config.url match {
    case Some(u) =>
      val partitioning = (config.partitionColumn, config.lowerBound, config.upperBound,
        config.numPartitions) match {
        case (Some(c), Some(lo), Some(hi), Some(n)) =>
          Map(
            "partitionColumn" -> c, "lowerBound" -> lo,
            "upperBound" -> hi, "numPartitions" -> n.toString)
        case (None, None, None, None) => Map.empty[String, String]
        case _ =>
          throw new IllegalArgumentException(
            "jdbc partitioned reads need ALL of partitionColumn/lowerBound/upperBound/numPartitions")
      }
      Resolved(
        "jdbc",
        Map("url" -> u, "dbtable" -> table) ++
          config.user.map("user" -> _) ++
          config.password.map("password" -> _) ++
          driverClassFor(config).map("driver" -> _) ++
          partitioning ++ config.jdbcOptions)
    case None =>
      val dir = config.registryDir.getOrElse(
        throw new IllegalArgumentException("registry mode needs registryDir"))
      // NOTE: read() executes registry mode through Tables.load, which
      // additionally applies the events nanos→micros contract on top of
      // this parquet path — the Resolved here is the physical source,
      // not the post-read column rewrite
      Resolved("parquet", Map("path" -> s"$dir/${unqualified(table)}.parquet"))
  }

  /** `cdc.event_log` → `event_log` — whitelist entries are
    * schema-qualified (connector.json:7), parquet registry files are not.
    */
  def unqualified(table: String): String = table.split('.').last

  /** Read one whitelisted table as a DataFrame.
    *
    * JDBC mode fails fast when no driver class for the url's subprotocol
    * is loadable; registry mode reads `registryDir/<table>.parquet`.
    */
  def read(spark: SparkSession, config: Config, table: String): DataFrame = {
    require(
      config.tableWhitelist.isEmpty || config.tableWhitelist.contains(table),
      s"table $table is not in the whitelist ${config.tableWhitelist.mkString(",")}")
    config.url match {
      case Some(u) =>
        val cls = driverClassFor(config).getOrElse(throw new IllegalStateException(
          s"no JDBC driver known for url $u — set Config.driver explicitly"))
        if (!driverOnClasspath(cls))
          throw new IllegalStateException(
            s"JdbcSource needs driver $cls on the classpath for $u; it is not bundled with " +
              "Spark's jars dir — add the driver artifact, or use registry mode (url=None)")
        spark.read.format("jdbc").options(resolve(config, table).options).load()
      case None =>
        resolve(config, table) // same registryDir validation as the plan
        Tables.load(spark, config.registryDir.get, unqualified(table))
    }
  }
}
