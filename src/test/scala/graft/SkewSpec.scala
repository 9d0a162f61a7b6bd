package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin matches the plain join result on a skewed key") {
    // 90% of left rows share key 1 (the hot key)
    val left = (1 to 1000).map(i => (if (i <= 900) 1 else i % 50, i)).toDF("k", "v")
    val right = (0 until 50).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = left.join(right, Seq("k")).select("k", "v", "name")
      .as[(Int, Int, String)].collect().toSet
    val salted = Skew.saltedJoin(left, right, Seq("k"), salts = 8)
      .select("k", "v", "name").as[(Int, Int, String)].collect().toSet
    assert(salted == plain)
  }

  test("twoPhaseAgg matches the direct aggregation") {
    val df = (1 to 2000).map(i => (if (i <= 1800) "hot" else s"k$i", i.toLong)).toDF("k", "v")
    val direct = df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .as[(String, Long, Long)].collect().toSet
    val twoPhase = Skew.twoPhaseAgg(df, Seq("k"), 8,
      Seq(count(lit(1)).as("pc"), sum("v").as("ps")),
      Seq(sum(col("pc")).as("n"), sum(col("ps")).as("s")))
      .as[(String, Long, Long)].collect().toSet
    assert(twoPhase == direct)
  }
}
