package graft.capture

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.model.ChangeEvent

/** Row-change capture as a distributed snapshot diff.
  *
  * The reference captures changes with per-row AFTER triggers
  * (`cdc.change_data_capture()` reference timescale/init.sql:11-22, attached
  * init.sql:106-113; hypertable variant init.sql:25-38). Spark has no
  * triggers; the idiomatic equivalent is a full-outer equi-join of the
  * previous and current table snapshots on the primary key, classifying each
  * joined row as INSERT / UPDATE / DELETE (SURVEY.md §2.1 C1-C4).
  *
  * Scale notes (100 TB design):
  *   - the full-outer join shuffles both sides on the PK — the natural
  *     partitioning for this op; AQE handles skewed keys and Catalyst picks
  *     SMJ/shuffled-hash automatically. If snapshots are bucketed by PK on
  *     disk, the shuffle disappears entirely.
  *   - no-op suppression (`UPDATE` with identical non-PK values) happens
  *     before serialization, so unchanged rows never produce JSON.
  *   - row→JSON uses codegen'd `to_json(struct(...))`, mirroring
  *     `row_to_json(OLD/NEW)` (reference init.sql:18,34).
  */
object CdcCapture {

  /** Diff two snapshots of a watched table into change events (without ids;
    * see [[assignIds]] for the monotonic event_id pass).
    *
    * @param prev       previous snapshot (null/empty prev ⇒ all INSERTs)
    * @param cur        current snapshot
    * @param pk         primary-key columns (join keys)
    * @param schemaName logical schema name stamped on every event — explicit
    *                   parameters by construction, unifying the reference's
    *                   plain-table and hypertable trigger variants
    *                   (init.sql:11-22 vs 25-38, which differ only in how
    *                   they learn the table name)
    * @param tableName  logical table name
    * @param captureTs  event timestamp; defaults to `current_timestamp()`,
    *                   which Spark folds once per query — matching PG
    *                   per-statement `NOW()` (reference init.sql:18)
    */
  def capture(
      prev: DataFrame,
      cur: DataFrame,
      pk: Seq[String],
      schemaName: String,
      tableName: String,
      captureTs: Column = current_timestamp()
  ): DataFrame = {
    require(pk.nonEmpty, "primary key columns required")
    val p = prev.select(
      pk.map(c => col(c).as(s"__pk_$c")) :+
        struct(prev.columns.map(col): _*).as("__prev"): _*
    )
    val c = cur.select(
      pk.map(k => col(k).as(s"__pk_$k")) :+
        struct(cur.columns.map(col): _*).as("__cur"): _*
    )
    val joined = p.join(c, pk.map(k => s"__pk_$k"), "full_outer")

    // Operation classification (reference init.sql:16,32): prev-side null ⇒
    // INSERT, cur-side null ⇒ DELETE, both present ⇒ UPDATE. Identical rows
    // (null-safe struct compare) are no-ops and emit nothing — PG triggers
    // fire on every UPDATE statement, but an UPDATE that changes nothing is
    // indistinguishable in the log from no statement at all, so suppressing
    // it preserves replayability.
    joined
      .where(col("__prev").isNull || col("__cur").isNull || !(col("__prev") <=> col("__cur")))
      .select(
        captureTs.as("ts"),
        lit(schemaName).as("schema_name"),
        lit(tableName).as("table_name"),
        when(col("__prev").isNull, lit(ChangeEvent.Insert))
          .when(col("__cur").isNull, lit(ChangeEvent.Delete))
          .otherwise(lit(ChangeEvent.Update))
          .as("operation"),
        when(col("__prev").isNotNull, to_json(col("__prev"))).as("before"),
        when(col("__cur").isNotNull, to_json(col("__cur"))).as("after")
      )
  }

  /** Persist a snapshot BUCKETED + sorted by its primary key — the layout
    * that makes successive [[capture]] diffs shuffle-free: two snapshots
    * bucketed on the same PK with the same bucket count co-partition, so
    * the full-outer diff plans as a sort-merge join over matching buckets
    * with NO Exchange on either side (the capture projection is
    * alias-only on the PK, which Spark's partitioning propagation sees
    * through). At 100 TB the diff becomes a zip of sorted buckets; the
    * per-capture cost is one scan of each snapshot, not two full-table
    * shuffles.
    *
    * The table is registered in the session catalog with an explicit
    * `path` (bucket metadata lives in the catalog — plain
    * `parquet(path)` reads cannot carry it); a production deployment
    * points the session at a persistent metastore so the registration
    * outlives the session, exactly as it would for any bucketed table.
    * `buckets` must match across the snapshots being diffed.
    */
  def writeSnapshotBucketed(
      df: DataFrame,
      table: String,
      path: String,
      pk: Seq[String],
      buckets: Int
  ): Unit = {
    require(pk.nonEmpty, "primary key columns required")
    require(buckets >= 1, "need buckets >= 1")
    val spark = df.sparkSession
    // overwrite-by-drop: saveAsTable(Overwrite) on an existing EXTERNAL
    // table validates schema/bucket compatibility; dropping first gives
    // snapshot-replacement semantics (the store holds ONE snapshot)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write
      .mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, pk.head, pk.tail: _*)
      .sortBy(pk.head, pk.tail: _*)
      .saveAsTable(table)
  }

  /** [[capture]] over two [[writeSnapshotBucketed]] tables — reads both
    * through the catalog so the bucketed layout reaches the planner and
    * the PK diff join runs exchange-free (asserted in PlanSpec).
    */
  def captureBucketed(
      spark: org.apache.spark.sql.SparkSession,
      prevTable: String,
      curTable: String,
      pk: Seq[String],
      schemaName: String,
      tableName: String,
      captureTs: Column = current_timestamp()
  ): DataFrame =
    capture(spark.table(prevTable), spark.table(curTable), pk, schemaName, tableName, captureTs)

  /** Assign monotonic event ids above a checkpointed base — the engine's
    * replacement for the reference's global sequence
    * (`cdc.event_log_event_id_seq`, reference init.sql:51-59).
    *
    * Ids only need to be monotone per micro-batch above the base (SURVEY.md
    * §7): a capture batch is the diff of two snapshots, which is small
    * relative to the table, so a single-partition window over the batch is
    * acceptable. For large batches use [[assignIdsDistributed]].
    *
    * NOT `monotonically_increasing_id()`: that is non-contiguous and
    * non-deterministic across runs, so it cannot serve as a poll offset.
    */
  def assignIds(events: DataFrame, base: Long, orderCols: Seq[String] = Seq("ts", "operation", "after", "before")): DataFrame = {
    val w = Window.orderBy(orderCols.map(col): _*)
    events.withColumn("event_id", lit(base) + row_number().over(w).cast("long"))
  }

  /** Scalable id assignment: contiguous ids without a single-partition
    * window. Range-partition by the order columns, sort within partitions,
    * then offset each partition by the cumulative count of the partitions
    * before it (two passes: one count job + one map). This is the standard
    * distributed dense-rank layout and holds at 1000 executors, unlike a
    * global `Window.orderBy` which serializes onto one task.
    */
  def assignIdsDistributed(events: DataFrame, base: Long, orderCols: Seq[String]): DataFrame = {
    import org.apache.spark.TaskContext
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{LongType, StructField}

    val ordered = events
      .repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .cache() // two passes over the sorted layout: count, then stamp
    // pass 1: per-partition row counts — a Tungsten hash aggregate on
    // spark_partition_id(); the driver sees one (pid, n) pair per
    // non-empty partition, nothing else
    val counts = ordered
      .groupBy(spark_partition_id().as("pid"))
      .count()
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    val offsets: Map[Int, Long] = {
      var acc = base
      counts.map { case (pid, n) => val o = pid -> acc; acc += n; o }.toMap
    }
    // pass 2: stamp ids partition-locally on the Dataset API (narrow — no
    // shuffle, no RDD round-trip; TaskContext supplies the partition id,
    // which matches pass 1's spark_partition_id over the same cached plan)
    val outSchema = events.schema.add(StructField("event_id", LongType, nullable = false))
    ordered.mapPartitions { it =>
      val start = offsets.getOrElse(TaskContext.getPartitionId(), base)
      it.zipWithIndex.map { case (r, j) => Row.fromSeq(r.toSeq :+ (start + j + 1)) }
    }(Encoders.row(outSchema))
  }
}
