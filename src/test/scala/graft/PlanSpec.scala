package graft

import graft.queries.RelationalQueries

/** Plan-shape regression tests: the properties that make these queries
  * scale (pushdown, broadcast choice, top-k without global sort, partial
  * aggregation) are asserted against the optimized physical plan, so a
  * refactor that silently loses one fails here rather than at 100 TB.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.executedPlan.toString

  test("q1_agg pushes the shipdate filter into the parquet scan") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
  }

  test("q1_agg aggregates partially before the exchange (map-side combine)") {
    val p = plan("q1_agg")
    assert(p.contains("partial_sum"), p)
  }

  test("q5 joins its dimensions with broadcast hash joins") {
    val p = plan("q5_nation_revenue")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts\n$p")
  }

  test("q_topk_limit is TakeOrderedAndProject, not a global sort") {
    val p = plan("q_topk_limit")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_approx_distinct never takes the Expand-based distinct rewrite") {
    // the exact twin is a two-phase pre-aggregate precisely to avoid
    // Expand (which doubles every input row); a refactor that folds
    // countDistinct back into the sketch aggregate regresses 2x+ here
    val p = plan("q_approx_distinct")
    assert(!p.contains("Expand"), p)
    assert(p.contains("partial_count"), p)
  }

  test("stratified hash sample is a map-side filter — no shuffle, no UDF") {
    val p = plan("x_sample_stratified")
    // the sampling decision must stay a pushable scan-side predicate: one
    // exchange is allowed only for the output orderBy (rangepartitioning),
    // never a hash repartition, and the md5 decision is codegen'd builtins
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("BatchEvalPython") && !p.toLowerCase.contains("scalaudf"), p)
  }

  test("vocab top-k combines map-side and ships only k rows to the driver") {
    val p = plan("x_vocab_topk")
    assert(p.contains("partial_count"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("quantiles aggregate partially before the exchange") {
    val p = plan("x_quantiles")
    assert(p.contains("partial_percentile"), p)
  }

  test("shard offsets never serialize onto a single-partition window") {
    val p = plan("x_pack_offsets")
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(!p.contains("Window"), p)
  }

  test("SWEEP: no query in the inventory runs a window over a single-partition exchange") {
    // the one pattern that silently stops scaling: Window.orderBy with no
    // partitioning serializes every row onto one task. A SinglePartition
    // exchange alone is fine when it carries aggregate partials (one row
    // per partition); combined with a Window it means the DATA went to one
    // task. Allowlist: c6_event_id_assign is the documented per-micro-batch
    // id window (bounded input by construction; c6b is the distributed twin).
    val allowed = Set("c6_event_id_assign")
    val offenders = SparkEntry.queries.keys.toSeq.sorted.filterNot(allowed).flatMap { name =>
      val p = try plan(name) catch { case e: Throwable => fail(s"$name failed to plan: ${e.getMessage}") }
      if (p.contains("Exchange SinglePartition") && p.contains("Window"))
        Some(name)
      else None
    }
    assert(offenders.isEmpty, s"single-partition windows in: $offenders")
  }

  test("SWEEP: no accidental cartesian or nested-loop join in the inventory") {
    // BroadcastNestedLoopJoin / CartesianProduct are O(n·m) row-compare
    // plans — correct only when one side is provably tiny. Allowlist, each
    // documented at its site:
    //   s2_retention_window    — 1-row broadcast max-date threshold
    //   x_dedup_exact          — two 1-row summary frames joined
    //   x_dedup_embedding      — the documented all-pairs oracle baseline
    //                            (LSH twin is the scale path)
    //   x_sim_bruteforce_topk  — broadcast of the 10-query side over the
    //                            corpus scan (the intended map-only plan)
    //   x_sim_ivf_topk         — queries × 16 broadcast centroids probe
    //   x_sim_ivf_planted      — same probe shape, planted-query oracle
    // Anything new showing these operators is a join that lost its keys.
    val allowed = Set(
      "s2_retention_window", "x_dedup_exact", "x_dedup_embedding",
      "x_sim_bruteforce_topk", "x_sim_ivf_topk", "x_sim_ivf_planted",
      // SemDeDup's seed assignment: broadcast nested-loop over the
      // numClusters seed rows only (a fixed small side by construction);
      // the quadratic stage is the cluster-equi-joined prune, never n²
      "x_semantic_dedup",
      // the admission form assigns BOTH the stored index and the ingest
      // batch by the same broadcast-over-K-seeds pass; its probe joins
      // are cluster-equi-joined
      "x_semantic_incr",
      // eval decontamination assigns the eval side by the same
      // broadcast-over-K-train-seeds pass; the leak probe is
      // cluster-equi-joined
      "x_decontam_semantic",
      // the PQ ADC scan: codes corpus × broadcast of the bounded query
      // set (each query carrying its m·ksub distance table) — the
      // intended map-only nested loop, same shape as the brute-force and
      // IVF probe stages; the exact re-rank leg is an equi-join on n_id
      "x_sim_pq_planted",
      // IVF-PQ: only the queries × 16 broadcast centroids probe is a
      // nested loop (the ivfTopK shape); the ADC scan and re-rank are
      // equi-joins on centroid_id / n_id
      "x_sim_ivfpq_planted")
    val offenders = SparkEntry.queries.keys.toSeq.sorted.filterNot(allowed).flatMap { name =>
      val p = try plan(name) catch { case e: Throwable => fail(s"$name failed to plan: ${e.getMessage}") }
      if (p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin"))
        Some(name)
      else None
    }
    assert(offenders.isEmpty, s"cartesian/nested-loop joins in: $offenders")
  }

  test("x_sim_ivfpq_planted probes the stored coded index with partition pruning") {
    // the serving path's whole point: the coded-index scan must carry a
    // PartitionFilter on centroid_id (only the probed cells' partitions
    // are listed/read), not scan the store and filter rows after
    val p = plan("x_sim_ivfpq_planted")
    assert("PartitionFilters: \\[[^\\]]*centroid_id".r.findFirstIn(p).isDefined,
      s"no centroid_id partition filter on the coded-index scan\n$p")
  }

  test("x_text_bm25 probes the stored postings with term-bucket partition pruning") {
    val p = plan("x_text_bm25")
    assert("PartitionFilters: \\[[^\\]]*tb".r.findFirstIn(p).isDefined,
      s"no tb partition filter on the postings scan\n$p")
  }

  test("x_bm25_blockmax final scan keeps the tb partition filter and pushes the block filter") {
    // the certified early-termination probe's RETURNED plan is the last
    // round's scan: term-bucket partition pruning must survive the
    // direct-dir read, and the admitted (term, blk) disjunction must
    // reach the parquet scan (row groups are sorted (term, blk) at
    // build, so the pushed filter is what skips unadmitted blocks)
    val p = plan("x_bm25_blockmax")
    assert("PartitionFilters: \\[[^\\]]*tb".r.findFirstIn(p).isDefined,
      s"no tb partition filter on the postings scan\n$p")
    assert(p.contains("blk"),
      s"the admitted-block filter never reached the postings scan\n$p")
  }

  test("bucketed counter is one pass: single key exchange, no self-join") {
    // point markers and segment-bucket entries come out of ONE explode and
    // land in ONE (user_id, bucket) hash aggregate that reuses the window's
    // user_id partitioning. The two-aggregate full-outer-join formulation
    // costs two extra full-key exchanges (requireAllClusterKeysForCoPartition)
    // plus a second scan+window pass — this pin is what caught it.
    val p = plan("x_counter_bucketed")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"expected ≤1 hash exchange, got $exchanges:\n$p")
    assert(!p.contains("Join"), s"self-join crept back into the bucketed counter:\n$p")
  }

  test("range join plans as an equi-join on (key, bucket) — never a nested loop") {
    val p = plan("q_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("PII redaction is one codegen'd map pass — no shuffle before the output sort, no UDF") {
    val p = plan("x_pii_redact")
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.toLowerCase.contains("scalaudf"), p)
  }

  test("embedding quantization never explodes or shuffles the vector table") {
    val p = plan("x_embed_quantize")
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Generate"), s"explode in the quantize path:\n$p")
  }

  test("the ORC roundtrip aggregate reads orc with partial aggregation") {
    val p = plan("x_orc_roundtrip")
    assert(p.toLowerCase.contains("orc"), p)
    assert(p.contains("partial_"), p)
  }

  test("source mixing is a broadcast-joined map-side filter — no corpus shuffle") {
    val p = plan("x_mix_sources")
    assert(p.contains("BroadcastHashJoin"), p)
    // the corpus side must not hash-exchange before the filter (the only
    // exchanges are the broadcast itself and the final presentation sort)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("chunk dedup and unigram scoring never serialize onto a single partition") {
    Seq("x_chunk_dedup", "x_unigram_score", "x_dedup_incr", "x_rep_quality").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Exchange SinglePartition"), s"$q:\n$p")
    }
  }

  test("bloom decontam probes before the confirm join and keeps the semi join") {
    val p = plan("x_decontam_bloom")
    // the prefilter must survive optimization as a Filter on the probe side
    // (Catalyst only ever pushes filters DOWN, so presence == prefiltering),
    // and the exact confirm must still be a keyed semi join, not a scan
    assert(p.contains("might_contain"), p)
    assert(p.contains("LeftSemi"), p)
  }

  test("quality binning is a map-side fold — no window, no join in the final plan") {
    // the threshold aggregate runs eagerly at build time (n-1 doubles to
    // the driver); the RETURNED plan must be scan → project → sort only
    val p = plan("x_quality_bins")
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), p)
  }

  test("repetition metrics run as one map pass — no aggregate, no join") {
    val p = plan("x_rep_quality")
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Join"), p)
  }

  test("capture diff is a full-outer sort-merge join on the PK") {
    val p = plan("c1_capture_diff")
    assert(p.contains("SortMergeJoin") && p.contains("FullOuter"), p)
  }

  test("view filter + projection reach the scan (column pruning)") {
    val df = RelationalQueries.queries("q_broadcast_join")(spark, sf0001)
    val scans = df.queryExecution.executedPlan.toString
    // lineitem scan must read only the join key + aggregated columns
    assert(scans.contains("ReadSchema: struct<l_partkey:bigint,l_quantity:double>"), scans)
  }

  test("brute-force top-k aggregates partially (no full pair shuffle)") {
    val p = plan("x_sim_bruteforce_topk")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"), p)
    assert(p.contains("partial_topkaggregator") || p.toLowerCase.contains("partial_"), p)
  }

  test("dynamic partition pruning fires on a partitioned-log join") {
    import org.apache.spark.sql.functions._
    import graft.log.CdcLog
    import spark.implicits._
    val path = tempDir("dpplog")
    val rows = (1 to 30).map { i =>
      (java.sql.Timestamp.from(java.time.Instant.parse(f"2025-06-${(i % 10) + 1}%02dT00:00:00Z")),
        "dataschema", "assets", "INSERT", null: String, s"""{"id":$i}""", i.toLong)
    }
    CdcLog.append(
      rows.toDF("ts", "schema_name", "table_name", "operation", "before", "after", "event_id"),
      path)
    val log = CdcLog.read(spark, path)
    val dim = Seq(("2025-06-03", "keep")).toDF("event_date", "tag")
      .select(col("event_date").cast("date").as("event_date"), col("tag"))
    // join on the partition column with a filtered dim → DPP subquery
    val joined = log.join(dim, Seq("event_date"))
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning") || joined.count() == 3,
      s"neither DPP nor correct result:\n$p")
    assert(joined.count() == 3)
  }

  test("bucketed snapshots join without a shuffle (co-located capture)") {
    // the capture-at-scale claim: snapshots bucketed by PK diff with zero
    // exchange — write both sides bucketed on the key, join, assert the
    // plan has no Exchange on either side
    val ev = Tables.load(spark, sf0001, "events")
      .select("event_id", "user_id", "event_type")
    try {
      Seq("snap_prev", "snap_cur").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        ev.write.bucketBy(8, "event_id").sortBy("event_id").saveAsTable(t)
      }
      val joined = spark.table("snap_prev")
        .join(spark.table("snap_cur"), Seq("event_id"), "full_outer")
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$p")
    } finally {
      Seq("snap_prev", "snap_cur").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
