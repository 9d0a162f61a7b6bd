package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

class ZOrderSpec extends SparkSpec {

  private def refZ(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zValue matches the reference bit interleave on random 16-bit pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(500)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)) ++
      Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L), (1L, 2L))
    val df = pairs.toDF("a", "b")
    val got = df.select($"a", $"b", ZOrder.zValue($"a", $"b").as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) === refZ(a, b), s"interleave($a, $b)")
    }
  }

  test("z-clustering bounds BOTH columns per slice where single-column sort bounds only one") {
    // a symmetric synthetic grid: locality only pays when both dims carry
    // comparable bit widths (on lopsided dims like 15 users × 700 hours
    // the wider dim's high bits dominate the curve — documented operator
    // contract: bucket/normalize BOTH columns into the same range first)
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(20000)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val ev = rows.toDF("ub", "hb").repartition(8)
    val n = 16
    def spreads(df: org.apache.spark.sql.DataFrame, c: String): Seq[Long] =
      df.groupBy(spark_partition_id().as("p"))
        .agg((max(col(c)) - min(col(c))).as("spread"))
        .collect().map(_.getAs[Long]("spread")).toSeq

    val zClustered = ZOrder.cluster(ev, col("ub"), col("hb"), n).cache()
    val hSorted = ev.repartitionByRange(n, col("hb")).sortWithinPartitions("hb").cache()
    try {
      val zu = spreads(zClustered, "ub").sum
      val zh = spreads(zClustered, "hb").sum
      val lu = spreads(hSorted, "ub").sum
      val lh = spreads(hSorted, "hb").sum
      // hb-sorted slices leave ub at ~full width (16 × ~65535 ≈ 1.05M);
      // the z layout must cut the ub total sharply while keeping hb
      // bounded — each z slice is a rectangle, not a stripe
      assert(zu < lu / 2, s"z ub-spread $zu !< half of stripe layout $lu")
      assert(zh < lh * 16, s"z hb-spread $zh blew up vs stripe layout $lh")
      // footer pruning reads per-slice min/max: most z slices cover a
      // fraction of the ub range (a slice straddling a high-bit curve
      // boundary can legitimately span wide — range cuts are quantile
      // samples, not bit-aligned)
      val tight = spreads(zClustered, "ub").count(_ < 60000L)
      assert(tight >= 12, s"only $tight/16 z slices bound ub below 60000")
    } finally { zClustered.unpersist(); hSorted.unpersist(); () }
  }
}
