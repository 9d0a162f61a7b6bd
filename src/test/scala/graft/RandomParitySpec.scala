package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, RangeJoin}

/** Seeded randomized parity: the hand-written merge/bucket operators
  * against their declarative twins on adversarial data — null keys, null
  * timestamps, duplicate timestamps, window-boundary-exact gaps — the
  * corners the fixture-based tests never reach.
  */
class RandomParitySpec extends SparkSpec {
  import spark.implicits._

  private def randomEvents(seed: Int, n: Int, keys: Int, tsRange: Long) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      val k: java.lang.Long = if (rnd.nextInt(20) == 0) null else rnd.nextInt(keys).toLong
      val sec: java.lang.Long = if (rnd.nextInt(25) == 0) null else rnd.nextLong(tsRange)
      (k, sec, i.toLong)
    }.toDF("k", "sec", "id")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("id"), col("id").as("tie"))
  }

  test("as-of exec == composed form on random data with null keys, null and duplicate timestamps") {
    for (seed <- Seq(1, 2, 3)) {
      // tsRange 200 over 300 rows forces plenty of exact-duplicate ts
      val l = randomEvents(seed, 300, keys = 8, tsRange = 200)
      val r = randomEvents(seed + 100, 300, keys = 8, tsRange = 200)
        .withColumnRenamed("id", "rid").withColumn("tie", col("rid"))
      val composed = AsOfJoin.backward(l, r, Seq("k"), "ts", "tie", Seq("rid"))
        .select(col("id"), col("asof_rid"))
      val exec = AsOfJoin.backwardExec(l, r, Seq("k"), "ts", "tie", Seq("rid"))
        .select(col("id"), col("asof_rid"))
      assert(exec.count() === 300L, s"seed $seed: every left row survives")
      assert(exec.exceptAll(composed).isEmpty && composed.exceptAll(exec).isEmpty,
        s"seed $seed: exec diverged from composed form")
      // the adversarial corners actually occurred AND both match states exist
      assert(exec.where(col("asof_rid").isNull).count() > 0, s"seed $seed: no null matches")
      assert(exec.where(col("asof_rid").isNotNull).count() > 0, s"seed $seed: no matches at all")
    }
  }

  test("gapfill segment layout == naive densify-and-window reference on random sparse series") {
    import org.apache.spark.sql.expressions.Window
    for (seed <- Seq(21, 22)) {
      val rnd = new scala.util.Random(seed)
      // sparse, irregular: some keys get a single observation (degenerate
      // one-bucket grid), buckets collide, values collide
      val rows = (1 to 120).map { i =>
        (rnd.nextInt(7).toLong, rnd.nextInt(400).toLong * 7, (rnd.nextInt(50) + 1).toDouble)
      }
      val ev = rows.toDF("k", "sec", "v")
        .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("v"))
      val w = 60L * 1000000L
      val got = graft.operators.GapFill.fill(ev, Seq("k"), "ts", "v", w)
        .select("k", "bucket", "v_actual", "n_rows", "locf", "interp", "bucket_start_s")

      // reference: explicit grid + IGNORE NULLS windows (the operator's
      // original formulation, kept here as the executable spec)
      val actual = ev.groupBy(col("k"), expr(s"unix_micros(ts) div ${w}L").as("bucket"))
        .agg(max(col("v")).as("v_actual"), count(lit(1)).as("n_rows"))
      val grid = actual.groupBy("k")
        .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
        .select(col("k"), explode(sequence(col("b0"), col("b1"))).as("bucket"))
      val joined = grid.join(actual, Seq("k", "bucket"), "left")
        .withColumn("n_rows", coalesce(col("n_rows"), lit(0L)))
      val past = Window.partitionBy("k").orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val future = Window.partitionBy("k").orderBy("bucket")
        .rowsBetween(1, Window.unboundedFollowing)
      val ab = when(col("v_actual").isNotNull, col("bucket"))
      val ref = joined
        .withColumn("locf", last(col("v_actual"), ignoreNulls = true).over(past))
        .withColumn("pb", last(ab, ignoreNulls = true).over(past))
        .withColumn("nv", first(col("v_actual"), ignoreNulls = true).over(future))
        .withColumn("nb", first(ab, ignoreNulls = true).over(future))
        .withColumn("interp",
          when(col("v_actual").isNotNull, col("v_actual"))
            .when(col("nv").isNotNull,
              col("locf") + (col("nv") - col("locf")) *
                ((col("bucket") - col("pb")).cast("double") /
                  (col("nb") - col("pb")).cast("double")))
            .otherwise(col("locf")))
        .withColumn("bucket_start_s", expr(s"(bucket * ${w}L) div 1000000L"))
        .select("k", "bucket", "v_actual", "n_rows", "locf", "interp", "bucket_start_s")

      assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty,
        s"seed $seed: segment layout diverged from the reference formulation")
      assert(got.where(col("v_actual").isNull).count() > 0, s"seed $seed: no gaps exercised")
    }
  }

  test("duplicateComponents: driver union-find == distributed propagation on random graphs") {
    for (seed <- Seq(31, 32)) {
      val rnd = new scala.util.Random(seed)
      // dense random clusters + a ring (diameter 5) + singles
      val pairs = ((1 to 150).map { _ =>
        val a = rnd.nextInt(60).toLong; (a, a + rnd.nextInt(3).toLong + 1)
      } ++ (0 until 10).map(i => (1000L + i, 1000L + (i + 1) % 10)))
        .toDF("id_a", "id_b")
      val local = graft.ext.Dedup.duplicateComponents(pairs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val distributed = graft.ext.Dedup
        .duplicateComponents(pairs, maxIter = 80, localThreshold = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(local === distributed, s"seed $seed: paths disagree")
      // the ring must collapse to one component rooted at its min id
      assert(local.filter(_._1 >= 1000L).forall(_._2 == 1000L))
    }
  }

  test("distributed propagation survives deep chains (constant-size plans per round)") {
    // a 25-node path needs ~24 rounds; before the per-round
    // localCheckpoint the logical plan DOUBLED each round (labels is
    // referenced twice), so this graph drove the analyzer to a 2 GB plan
    // string — the run hung before moving any data
    val chain = (0L until 24L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = graft.ext.Dedup
      .duplicateComponents(chain, maxIter = 40, localThreshold = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length === 25)
    assert(out.forall(_._2 == 0L), "every chain node joins the min-rooted component")
  }

  test("bucketed range join == naive range predicate on random data with boundary-exact gaps") {
    for (seed <- Seq(7, 8)) {
      val rnd = new scala.util.Random(seed)
      val w = 60L // seconds
      // gaps engineered to land ON the boundary often: multiples of w/2
      val ev = (1 to 250).map { i =>
        (rnd.nextInt(6).toLong, rnd.nextInt(40).toLong * (w / 2), i.toLong)
      }.toDF("k", "sec", "id")
        .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("id"))
      val got = RangeJoin
        .within(ev, ev, Seq("k"), "ts", "ts", windowMicros = w * 1000000L)
        .select(col("a_id"), col("b_id"))
      val l = ev.select(col("k"), col("ts").as("lts"), col("id").as("a_id"))
      val rr = ev.select(col("k"), col("ts").as("rts"), col("id").as("b_id"))
      val naive = l.join(rr, "k")
        .where(unix_micros(col("rts")) > unix_micros(col("lts")) &&
          unix_micros(col("rts")) <= unix_micros(col("lts")) + w * 1000000L)
        .select("a_id", "b_id")
      assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty,
        s"seed $seed: bucketed join diverged from the naive predicate")
      assert(naive.count() > 0, s"seed $seed: degenerate fixture")
    }
  }

  test("exactSubstringSpans + stripSpans == driver-side reference on random high-collision corpora") {
    import graft.ext.Dedup
    val k = 4
    for (seed <- Seq(11, 12, 13)) {
      val rnd = new scala.util.Random(seed)
      // tiny vocabulary → organic k-gram collisions everywhere; plus a
      // planted copy-paste: a slice of one doc embedded into a later one
      val vocab = (0 until 18).map(i => s"w$i")
      val base = (0L until 40L).map { id =>
        id -> Array.fill(10 + rnd.nextInt(50))(vocab(rnd.nextInt(vocab.size)))
      }
      val docsArr = base.map { case (id, ws) =>
        if (id >= 20 && rnd.nextInt(2) == 0) {
          val (srcId, src) = base(rnd.nextInt(20))
          val slice = src.slice(0, math.min(src.length, k + 2 + rnd.nextInt(6)))
          id -> (ws.take(5) ++ slice ++ ws.drop(5))
        } else id -> ws
      }
      // reference: brute-force occurrence table → keep-first → run-merge
      val occ = scala.collection.mutable.Map[String, List[(Long, Int)]]().withDefaultValue(Nil)
      for ((id, ws) <- docsArr; p <- 0 to ws.length - k)
        occ(ws.slice(p, p + k).mkString(" ")) ::= (id, p)
      val flagged = scala.collection.mutable.Map[Long, List[Int]]().withDefaultValue(Nil)
      for ((_, os) <- occ if os.size >= 2) {
        val first = os.minBy(o => (o._1, o._2))
        for ((id, p) <- os if (id, p) != first) flagged(id) ::= p
      }
      val refSpans = docsArr.map { case (id, ws) =>
        val ps = flagged(id).sorted
        // new span iff p > prevPos + k; with e = prevPos + k that is p > e
        val spans = ps.foldLeft(List.empty[(Int, Int)]) {
          case (Nil, p) => List((p, p + k))
          case ((s, e) :: rest, p) =>
            if (p > e) (p, p + k) :: (s, e) :: rest
            else (s, p + k) :: rest
        }.reverse
        val covered = spans.flatMap { case (s, e) => s until e }.toSet
        val kept = ws.zipWithIndex.collect { case (w, i) if !covered(i) => w }
        id -> (spans.map { case (s, e) => s"$s:$e" }.mkString(","), kept.mkString(" "))
      }.toMap
      val df = docsArr.map { case (id, ws) => (id, ws.mkString(" ")) }.toSeq.toDF("doc_id", "text")
      val spansDf = Dedup.exactSubstringSpans(df, "doc_id", "text", k)
      val got = spansDf.select("doc_id", "spans").as[(Long, String)].collect().toMap
      val gotStrip = Dedup.stripSpans(df, "doc_id", "text", spansDf.select("doc_id", "spans"))
        .select("doc_id", "stripped_text").as[(Long, String)].collect().toMap
      for ((id, (refS, refT)) <- refSpans) {
        assert(got(id) === refS, s"seed $seed doc $id spans")
        assert(gotStrip(id) === refT, s"seed $seed doc $id strip")
      }
      assert(refSpans.values.exists(_._1.nonEmpty), s"seed $seed: degenerate fixture")
    }
  }

  test("hammingNearDupPairs == driver brute force on random sketches with planted near-flips") {
    import graft.ext.Dedup
    for (seed <- Seq(21, 22)) {
      val rnd = new scala.util.Random(seed)
      val hashes = (0L until 150L).map { id =>
        if (id >= 100 && rnd.nextInt(2) == 0) {
          // flip up to `radius` random bits of an earlier hash — must be found
          val srcId = rnd.nextInt(100).toLong
          var h = seedHash(seed, srcId)
          (0 until rnd.nextInt(12)).foreach(_ => h ^= 1L << rnd.nextInt(64))
          id -> h
        } else id -> seedHash(seed, id)
      }
      val bf = (for {
        (a, ha) <- hashes; (b, hb) <- hashes if a < b
        if java.lang.Long.bitCount(ha ^ hb) <= 11
      } yield (a, b)).toSet
      val got = Dedup
        .hammingNearDupPairs(hashes.toDF("media_id", "hh"), "media_id", "hh", radius = 11)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got === bf, s"seed $seed: banded=${got.size} bf=${bf.size}")
      assert(bf.nonEmpty, s"seed $seed: degenerate fixture")
    }
  }

  private def seedHash(seed: Int, id: Long): Long = {
    var h = id * 6364136223846793005L + seed * 1442695040888963407L
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    h
  }

  test("Bm25CertAggregator == sorted-rank reference under random reduce/merge splits") {
    import graft.functions.{Bm25CertAggregator, CertBuf, CertIn}
    for (seed <- Seq(31, 32, 33); k <- Seq(1, 3, 10)) {
      val rnd = new scala.util.Random(seed)
      val n = rnd.nextInt(40) // includes m < k and m = 0-adjacent sizes
      // score ties ON PURPOSE (small score range) so the doc_id asc
      // boundary tie-break is exercised; distinct ids per group
      val rows = (0 until n).map(i =>
        CertIn(rnd.nextInt(5).toLong, i.toLong, rnd.nextInt(100).toLong))
      if (rows.nonEmpty) {
        // reference: the window form's facts from a full sort
        val ranked = rows.sortBy(r => (-r.score, r.id))
        val top = ranked.take(k)
        val rest = ranked.drop(k)
        val agg = new Bm25CertAggregator(k)
        // random split into partial buffers, random-order reduce, merge
        val buffers = rows.groupBy(_ => rnd.nextInt(4)).values.toSeq
          .map(part => rnd.shuffle(part).foldLeft(agg.zero)(agg.reduce))
        val merged = rnd.shuffle(buffers).foldLeft(agg.zero)(agg.merge)
        val out = agg.finish(merged)
        assert(out.m === rows.size.toLong, s"seed $seed k=$k: m")
        assert(out.theta === top.map(_.score).min, s"seed $seed k=$k: theta")
        assert(out.minSeenTop === top.map(_.seen).min, s"seed $seed k=$k: minSeenTop")
        val restRef =
          if (rest.isEmpty) Long.MinValue else rest.map(r => r.score - r.seen).max
        assert(out.restMax === restRef, s"seed $seed k=$k: restMax")
        // the kept set itself is the rank-order top-k (boundary ties
        // resolved by id asc), not just its aggregates
        assert(merged.items === top, s"seed $seed k=$k: kept set")
      }
    }
  }
}
