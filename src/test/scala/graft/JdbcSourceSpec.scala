package graft

import org.apache.spark.sql.functions._

import graft.sources.JdbcSource
import graft.sources.JdbcSource.Config

/** The reference-transport facade (connector.json:4-8): resolved-plan
  * assertions for jdbc mode (no live database in the build container) and
  * end-to-end reads for registry mode.
  */
class JdbcSourceSpec extends SparkSpec {

  test("jdbc mode resolves to the connector's option surface") {
    val r = JdbcSource.resolve(
      Config(
        url = Some("jdbc:postgresql://timescaledb:5432/demo"),
        user = Some("postgres"), password = Some("password"),
        tableWhitelist = Seq("cdc.event_log")),
      "cdc.event_log")
    assert(r.format == "jdbc")
    assert(r.options("url") == "jdbc:postgresql://timescaledb:5432/demo")
    assert(r.options("dbtable") == "cdc.event_log")
    assert(r.options("user") == "postgres")
    // driver inferred from the subprotocol, connector-runtime style
    assert(r.options("driver") == "org.postgresql.Driver")
  }

  test("parallel-read options travel together or not at all") {
    val base = Config(url = Some("jdbc:postgresql://h/db"))
    val r = JdbcSource.resolve(
      base.copy(
        partitionColumn = Some("event_id"), lowerBound = Some("0"),
        upperBound = Some("1000000"), numPartitions = Some(32)),
      "cdc.event_log")
    assert(r.options("numPartitions") == "32" && r.options("partitionColumn") == "event_id")
    intercept[IllegalArgumentException] {
      JdbcSource.resolve(base.copy(partitionColumn = Some("event_id")), "t")
    }
  }

  test("driver detection is honest: hive ships with Spark's jars, postgres does not") {
    // a true positive AND a true negative, against the real classpath
    assert(JdbcSource.driverOnClasspath("org.apache.hive.jdbc.HiveDriver"))
    assert(!JdbcSource.driverOnClasspath("org.postgresql.Driver"))
  }

  test("jdbc mode without its driver fails fast with an actionable message") {
    val ex = intercept[IllegalStateException] {
      JdbcSource.read(
        spark,
        Config(url = Some("jdbc:postgresql://timescaledb:5432/demo")),
        "cdc.event_log")
    }
    assert(ex.getMessage.contains("org.postgresql.Driver"))
    assert(ex.getMessage.contains("registry mode"))
  }

  test("unknown subprotocol without an explicit driver fails fast") {
    val ex = intercept[IllegalStateException] {
      JdbcSource.read(spark, Config(url = Some("jdbc:exotic://h/db")), "t")
    }
    assert(ex.getMessage.contains("Config.driver"))
  }

  test("whitelist membership is enforced (table.whitelist semantics)") {
    intercept[IllegalArgumentException] {
      JdbcSource.read(
        spark,
        Config(url = None, registryDir = Some(sf0001),
          tableWhitelist = Seq("cdc.event_log")),
        "cdc.other_table")
    }
  }

  test("registry mode reads the schema-qualified table from parquet") {
    requireFixture(sf0001)
    val df = JdbcSource.read(
      spark,
      Config(url = None, registryDir = Some(sf0001),
        tableWhitelist = Seq("cdc.events")),
      "cdc.events")
    assert(df.count() > 0)
    // the events nanos contract holds through the facade (Tables.load)
    assert(df.schema("ts").dataType.typeName == "timestamp")
  }

  test("the facade feeds the incremental poller unchanged (connector mode parity)") {
    requireFixture(sf0001)
    import graft.poll.IncrementalPoller
    import graft.poll.IncrementalPoller.Offset
    val rel = JdbcSource.read(
      spark, Config(url = None, registryDir = Some(sf0001)), "cdc.events")
    val all = rel.count()
    val mid = rel.orderBy(col("ts"), col("event_id"))
      .select("ts", "event_id").collect()(all.toInt / 2)
    val off = Offset(mid.getTimestamp(0), mid.getLong(1))
    val tail = IncrementalPoller.poll(rel, off)
    assert(tail.count() == all - (all.toInt / 2) - 1)
  }
}
