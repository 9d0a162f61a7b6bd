package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.DataFrame

import graft.poll.{IncrementalPoller, PollRunner}
import graft.poll.IncrementalPoller.Offset
import graft.sources.JdbcSource
import graft.sources.JdbcSource.Config

/** Live execution of JdbcSource's jdbc branch. Derby ships in Spark's
  * jars dir (derby-10.16.1.1.jar), so an embedded `jdbc:derby:memory:`
  * database exercises the real `format("jdbc")` path offline — the one
  * branch JdbcSourceSpec could only assert as a resolved plan:
  *
  *   - content parity with registry mode (the same events fixture seeded
  *     through plain JDBC inserts reads back identically),
  *   - the poll predicate landing in the JDBC scan's `PushedFilters`
  *     (the "btree index scan, not a table dump" claim in
  *     JdbcSource's scaladoc, pinned against a live database),
  *   - partitioned parallel range reads returning the same rows,
  *   - the WHOLE reference loop with a real database leg: Derby change
  *     log → JdbcSource → PollRunner multi-cycle poll with offset
  *     commits and a mid-run restart → envelope → topic layout →
  *     TopicSource consume → decode → CdcApply replica convergence
  *     (reference readme.md:42,54 connector cycle; connector.json:4-8
  *     connection surface).
  */
class JdbcDerbySpec extends SparkSpec {

  private val memUrl = "jdbc:derby:memory:graftspec"

  /** One-time embedded database seeded from the events fixture via plain
    * JDBC inserts — the "source database" every test reads through the
    * engine's jdbc branch. Quoted-uppercase DDL identifiers so reserved
    * words (VALUE) can't bite; Spark reads them back uppercase and tests
    * re-alias to the engine's lowercase contract.
    */
  private lazy val seededRows: Long = {
    requireFixture(sf0001)
    // keep Derby's log file out of the repo CWD
    System.setProperty("derby.system.home", tempDir("derby-home"))
    val rows = Tables.load(spark, sf0001, "events")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .collect()
    val conn = DriverManager.getConnection(s"$memUrl;create=true")
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        """CREATE TABLE EVENTS ("EVENT_ID" BIGINT, "TS" TIMESTAMP, "USER_ID" BIGINT,
          | "EVENT_TYPE" VARCHAR(64), "VALUE" DOUBLE, "PROPS" VARCHAR(4000))""".stripMargin)
      st.close()
      val ps = conn.prepareStatement("INSERT INTO EVENTS VALUES (?, ?, ?, ?, ?, ?)")
      rows.foreach { r =>
        (0 until 6).foreach(i => ps.setObject(i + 1, r.get(i)))
        ps.addBatch()
      }
      ps.executeBatch()
      rows.length.toLong
    } finally conn.close()
  }

  private def eventsConfig = Config(url = Some(memUrl), tableWhitelist = Seq("events"))

  /** Derby metadata is uppercase; the engine's column contract is
    * lowercase. Spark resolution is case-insensitive either way — this
    * alias exists only so frame-level parity checks compare equal schemas.
    */
  private def lowercased(df: DataFrame): DataFrame =
    df.select(df.columns.map(c => col(c).as(c.toLowerCase)).toIndexedSeq: _*)

  test("derby subprotocol infers the embedded driver, present on the real classpath") {
    assert(JdbcSource.driverClassFor(Config(url = Some(memUrl)))
      .contains("org.apache.derby.jdbc.EmbeddedDriver"))
    assert(JdbcSource.driverOnClasspath("org.apache.derby.jdbc.EmbeddedDriver"))
  }

  test("jdbc mode executes a live read with content parity against registry mode") {
    assert(seededRows > 0)
    val viaJdbc = lowercased(JdbcSource.read(spark, eventsConfig, "events"))
    val viaRegistry = JdbcSource.read(
      spark, Config(url = None, registryDir = Some(sf0001)), "events")
    assert(viaJdbc.count() == seededRows && viaRegistry.count() == seededRows)
    // exact parity both directions: timestamps (µs), doubles, and the JSON
    // props strings must all survive the JDBC round trip bit-for-bit
    assert(viaJdbc.exceptAll(viaRegistry).isEmpty)
    assert(viaRegistry.exceptAll(viaJdbc).isEmpty)
  }

  test("the poll predicate is pushed to the remote database (PushedFilters)") {
    assert(seededRows > 0)
    val rel = JdbcSource.read(spark, eventsConfig, "events")
    val registry = JdbcSource.read(
      spark, Config(url = None, registryDir = Some(sf0001)), "events")
    val mid = registry.orderBy(col("ts"), col("event_id"))
      .select("ts", "event_id").collect()(seededRows.toInt / 2)
    val off = Offset(mid.getTimestamp(0), mid.getLong(1))

    val polled = IncrementalPoller.poll(rel, off)
    val plan = polled.queryExecution.executedPlan.toString()
    // the whole lexicographic disjunction must reach the JDBC relation —
    // Or(ts >, And(ts =, event_id >)) — not be evaluated Spark-side after
    // a full table dump
    val pushed = plan.linesIterator.find(_.contains("PushedFilters"))
      .getOrElse(fail(s"no PushedFilters in plan:\n$plan"))
    assert(pushed.toUpperCase.contains("TS"), pushed)
    assert(pushed.toUpperCase.contains("EVENT_ID"), pushed)
    assert(pushed.toUpperCase.contains("OR("), pushed)

    // and the pushed read returns exactly the registry-mode tail
    val expected = IncrementalPoller.poll(registry, off)
      .select("event_id").collect().map(_.getLong(0)).toSet
    val got = polled.select(col("EVENT_ID")).collect().map(_.getLong(0)).toSet
    assert(got == expected && got.size == seededRows.toInt - seededRows.toInt / 2 - 1)
  }

  test("partitioned parallel range reads return the same rows") {
    assert(seededRows > 0)
    val single = lowercased(JdbcSource.read(spark, eventsConfig, "events"))
    val maxId = single.agg(max("event_id")).collect()(0).getLong(0)
    val parallel = lowercased(JdbcSource.read(
      spark,
      eventsConfig.copy(
        partitionColumn = Some("EVENT_ID"), lowerBound = Some("0"),
        upperBound = Some(maxId.toString), numPartitions = Some(4)),
      "events"))
    assert(parallel.rdd.getNumPartitions == 4)
    assert(parallel.count() == seededRows)
    assert(parallel.exceptAll(single).isEmpty)
  }

  // --- the full reference loop against a real database --------------------

  private val payloadSchema = StructType(Seq(
    StructField("rid", LongType), StructField("user_id", LongType),
    StructField("cents", LongType)))

  private val messageSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("operation", StringType),
    StructField("before", StringType),
    StructField("after", StringType)))

  /** The synthetic change log the loop replicates (the applyFixture shape:
    * op classed from event_type, integer-cents payloads so the JSON text
    * is exact), ordered by the poll's lexicographic (ts, event_id) key so
    * sequential inserts always land after the committed offset.
    */
  private def changeLog(): DataFrame = {
    val payload = to_json(struct(
      (col("event_id") % 211).as("rid"),
      col("user_id"),
      round(col("value") * 100).cast("long").as("cents")))
    Tables.load(spark, sf0001, "events").select(
      col("ts"),
      col("event_id"),
      when(col("event_type") === "signup", "INSERT")
        .when(col("event_type") === "error", "DELETE")
        .otherwise("UPDATE").as("operation"),
      when(col("event_type") === "signup", lit(null).cast("string"))
        .otherwise(payload).as("before"),
      when(col("event_type") === "error", lit(null).cast("string"))
        .otherwise(payload).as("after"))
  }

  test("whitelist polls a TABLE and a VIEW through one runner (connector.json:7,14)") {
    // the reference whitelist is `cdc.event_log_assets,cdc.event_log`
    // with `table.types: TABLE,VIEW` — event_log_assets is a filtered
    // VIEW over the log (init.sql:75-84: schema_name = 'dataschema' AND
    // table_name = 'assets'). Mirror it in Derby: one source table, one
    // real database view, both polled by the same runner with
    // independent offsets, each to its own topic.
    assert(seededRows > 0)
    val conn = DriverManager.getConnection(memUrl)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        """CREATE TABLE EVENT_LOG2 ("TS" TIMESTAMP, "EVENT_ID" BIGINT,
          | "SCHEMA_NAME" VARCHAR(64), "TABLE_NAME" VARCHAR(64),
          | "OPERATION" VARCHAR(10), "AFTER" VARCHAR(4000))""".stripMargin)
      st.executeUpdate(
        """CREATE VIEW EVENT_LOG_ASSETS AS
          | SELECT "TS", "SCHEMA_NAME", "TABLE_NAME", "OPERATION", "AFTER", "EVENT_ID"
          | FROM EVENT_LOG2
          | WHERE "SCHEMA_NAME" = 'dataschema' AND "TABLE_NAME" = 'assets'""".stripMargin)
      st.close()
      val rows = Tables.load(spark, sf0001, "events").select(
        col("ts"), col("event_id"),
        lit("dataschema").as("schema_name"),
        when(col("user_id") % 3 === 0, "assets").otherwise("users").as("table_name"),
        lit("INSERT").as("operation"),
        to_json(struct(col("event_id"), col("user_id"))).as("after")
      ).collect()
      val ps = conn.prepareStatement("INSERT INTO EVENT_LOG2 VALUES (?, ?, ?, ?, ?, ?)")
      try {
        rows.foreach { r =>
          (0 until 6).foreach(i => ps.setObject(i + 1, r.get(i)))
          ps.addBatch()
        }
        ps.executeBatch()
      } finally ps.close()

      val cfg = Config(
        url = Some(memUrl),
        tableWhitelist = Seq("event_log2", "event_log_assets"))
      val relations = Map(
        "event_log2" -> lowercased(JdbcSource.read(spark, cfg, "event_log2")),
        "event_log_assets" -> lowercased(JdbcSource.read(spark, cfg, "event_log_assets")))

      // the poll predicate pushes THROUGH the database view: Derby plans
      // the filtered view + pushed (ts, event_id) disjunction as one scan
      val mid = rows.sortBy(r => (r.getTimestamp(0).getTime, r.getLong(1)))
        .apply(rows.length / 2)
      val viewPlan = IncrementalPoller
        .poll(relations("event_log_assets"), Offset(mid.getTimestamp(0), mid.getLong(1)))
        .queryExecution.executedPlan.toString()
      val pushedLine = viewPlan.linesIterator.find(_.contains("PushedFilters"))
        .getOrElse(fail(s"no PushedFilters in view plan:\n$viewPlan"))
      assert(pushedLine.toUpperCase.contains("TS") &&
        pushedLine.toUpperCase.contains("EVENT_ID"), pushedLine)

      val offsetDir = tempDir("derby-wl-offsets")
      val topicDir = tempDir("derby-wl-topic")
      def deliver(name: String, enveloped: org.apache.spark.sql.DataFrame): Unit =
        enveloped.select("topic", "key", "value")
          .write.mode("append").partitionBy("topic").parquet(topicDir)
      val runner = new PollRunner(spark, offsetDir, Offset.initial("2020-01-01T00:00:00Z"))
      val counts = runner.pollOnce(relations)(deliver)
      val assetRows = rows.count(_.getString(3) == "assets").toLong
      assert(counts("event_log2") == rows.length.toLong)
      assert(counts("event_log_assets") == assetRows && assetRows > 0)
      // drained: both offsets advanced independently
      val counts2 = runner.pollOnce(relations)(deliver)
      assert(counts2.values.forall(_ == 0L))
      // each relation landed on its own topic with exactly its rows
      val consumed = graft.sources.TopicSource.read(
        spark, graft.sources.TopicSource.Config(brokers = None, path = topicDir),
        Seq("cdc-event_log2", "cdc-event_log_assets"))
      val byTopic = consumed.groupBy("topic").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byTopic("cdc-event_log2") == rows.length.toLong)
      assert(byTopic("cdc-event_log_assets") == assetRows)
    } finally conn.close()
  }

  test("reference loop e2e: Derby log → poll cycles with restart → topic → replica") {
    assert(seededRows > 0) // brings up the in-memory database
    val conn = DriverManager.getConnection(memUrl)
    val insert = try {
      val st = conn.createStatement()
      st.executeUpdate(
        """CREATE TABLE EVENT_LOG ("TS" TIMESTAMP, "EVENT_ID" BIGINT,
          | "OPERATION" VARCHAR(10), "BEFORE" VARCHAR(4000), "AFTER" VARCHAR(4000))""".stripMargin)
      st.close()
      conn.prepareStatement("INSERT INTO EVENT_LOG VALUES (?, ?, ?, ?, ?)")
    } catch { case e: Throwable => conn.close(); throw e }

    try {
      val log = changeLog()
      val allRows = log.orderBy(col("ts"), col("event_id")).collect()
      val slices = Seq(
        allRows.slice(0, allRows.length / 3),
        allRows.slice(allRows.length / 3, 2 * allRows.length / 3),
        allRows.slice(2 * allRows.length / 3, allRows.length))

      val offsetDir = tempDir("derby-offsets")
      val topicDir = tempDir("derby-topic")
      val cfg = Config(url = Some(memUrl), tableWhitelist = Seq("event_log"))
      // re-resolved per poll: each cycle re-executes the JDBC read, so
      // rows committed to the source between cycles appear — the live
      // analogue of the connector's repeated poll query
      val relations = Map("event_log" ->
        lowercased(JdbcSource.read(spark, cfg, "event_log")))
      def deliver(name: String, enveloped: DataFrame): Unit =
        enveloped.select("topic", "key", "value")
          .write.mode("append").partitionBy("topic").parquet(topicDir)
      val initial = Offset.initial("2020-01-01T00:00:00Z")

      def insertSlice(rows: Array[org.apache.spark.sql.Row]): Unit = {
        rows.foreach { r =>
          (0 until 5).foreach(i => insert.setObject(i + 1, r.get(i)))
          insert.addBatch()
        }
        insert.executeBatch()
      }

      // cycles 1-2 under one runner instance
      val runner1 = new PollRunner(spark, offsetDir, initial)
      insertSlice(slices(0))
      val n1 = runner1.pollOnce(relations)(deliver)("event_log")
      insertSlice(slices(1))
      val n2 = runner1.pollOnce(relations)(deliver)("event_log")
      // mid-run restart: a NEW runner must resume from the committed
      // offset files, not re-deliver cycles 1-2
      val runner2 = new PollRunner(spark, offsetDir, initial)
      insertSlice(slices(2))
      val n3 = runner2.pollOnce(relations)(deliver)("event_log")
      // a drained source delivers nothing (offset really advanced)
      val n4 = runner2.pollOnce(relations)(deliver)("event_log")

      assert(Seq(n1, n2, n3) == slices.map(_.length.toLong))
      assert(n4 == 0L)

      // consume the topic and converge the replica
      val consumed = graft.sources.TopicSource.read(
        spark,
        graft.sources.TopicSource.Config(brokers = None, path = topicDir),
        Seq("cdc-event_log"))
      assert(consumed.count() == allRows.length.toLong) // exactly-once across the restart
      val replayed = graft.sources.TopicSource.decode(consumed, messageSchema)
      val snapshot = spark.range(211).select(
        col("id").as("rid"), lit(-1L).as("user_id"), lit(0L).as("cents"))
      val replica = graft.capture.CdcApply
        .applyLog(snapshot, replayed, Seq("rid"), payloadSchema)
      val expected = graft.capture.CdcApply
        .applyLog(snapshot, log, Seq("rid"), payloadSchema)
      assert(replica.exceptAll(expected).isEmpty && expected.exceptAll(replica).isEmpty)
    } finally {
      insert.close()
      conn.close()
    }
  }

  // ---- Postgres/TimescaleDB fidelity ---------------------------------------
  //
  // The production target (connector.json:4 `connection.url` is postgres)
  // can't run offline — no pg driver in /opt/spark/jars — but the type
  // mappings a live TimescaleDB would hand the poller are decided by
  // Spark's PostgresDialect + the session timezone, and BOTH halves are
  // testable here: the dialect's JDBC→Catalyst mapping directly, and the
  // instant/JSON/decimal semantics through live Derby columns of the
  // same Catalyst types. COVERAGE.md §"Postgres fidelity" documents the
  // full mapping table these tests pin.

  test("PostgresDialect maps timestamptz/json/jsonb/numeric the way the poller expects") {
    import org.apache.spark.sql.jdbc.JdbcDialects
    import org.apache.spark.sql.types.MetadataBuilder
    val d = JdbcDialects.get("jdbc:postgresql://db.example/tsdb")
    def cat(sqlType: Int, name: String) =
      d.getCatalystType(sqlType, name, 8, new MetadataBuilder)
    // json/jsonb arrive as Types.OTHER + a pg type name, and must land as
    // StringType — the engine's props path (get_json_object/from_json)
    // consumes them unchanged, exactly like the parquet registry's props
    assert(cat(java.sql.Types.OTHER, "json").contains(StringType))
    assert(cat(java.sql.Types.OTHER, "jsonb").contains(StringType))
    // timestamptz is Types.TIMESTAMP + typeName "timestamptz": an
    // INSTANT type — must resolve to session-TZ TimestampType (never
    // NTZ), so a UTC session preserves epoch micros end-to-end
    assert(cat(java.sql.Types.TIMESTAMP, "timestamptz").contains(TimestampType))
    // Timescale's recommended PK/sequence types
    assert(cat(java.sql.Types.BIGINT, "int8").isEmpty || // default mapping
      cat(java.sql.Types.BIGINT, "int8").contains(LongType))
    // pg `double precision` keeps full width (float8 → DoubleType);
    // FLOAT with pg typeName float8 must not narrow to FloatType
    assert(cat(java.sql.Types.FLOAT, "float8").forall(_ == DoubleType))
  }

  test("instant fidelity through a live jdbc TIMESTAMP under the UTC session") {
    seededRows
    // the poller's offset axis: epoch micros read through format("jdbc")
    // must equal the registry-mode micros bit-for-bit — the same
    // guarantee a timestamptz column gives under PostgresDialect, since
    // both resolve to session-TZ TimestampType (previous test)
    val viaJdbc = lowercased(JdbcSource.read(spark, eventsConfig, "events"))
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    val viaRegistry = Tables.load(spark, sf0001, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    assert(viaJdbc.exceptAll(viaRegistry).isEmpty &&
      viaRegistry.exceptAll(viaJdbc).isEmpty)
  }

  test("json-as-text and NUMERIC columns survive the jdbc leg (pg json/numeric shape)") {
    System.setProperty("derby.system.home", tempDir("derby-home"))
    val url = "jdbc:derby:memory:graftpgmap"
    val conn = DriverManager.getConnection(s"$url;create=true")
    try {
      val st = conn.createStatement()
      // a pg `json` column lands in Spark as a STRING; Derby's closest
      // live stand-in is VARCHAR carrying the same text. NUMERIC(12,4)
      // maps to DecimalType(12,4) on BOTH dialects (exact, not double).
      st.executeUpdate(
        """CREATE TABLE TYPED ("ID" BIGINT, "DOC" VARCHAR(400), "AMT" NUMERIC(12,4))""")
      st.executeUpdate(
        """INSERT INTO TYPED VALUES (1, '{"k":7,"tag":"a"}', 12345678.1234)""")
      st.executeUpdate("""INSERT INTO TYPED VALUES (2, '{"k":9}', 0.0001)""")
      st.close()
      val df = lowercased(JdbcSource.read(
        spark, Config(url = Some(url), tableWhitelist = Seq("typed")), "typed"))
      assert(df.schema("amt").dataType == DecimalType(12, 4))
      assert(df.schema("doc").dataType == StringType)
      // the engine's JSON path consumes the text column unchanged
      val got = df
        .select(col("id"), get_json_object(col("doc"), "$.k").cast("long").as("k"),
          col("amt").cast("string").as("amt"))
        .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(got.toSeq == Seq((1L, 7L, "12345678.1234"), (2L, 9L, "0.0001")))
    } finally conn.close()
  }
}
