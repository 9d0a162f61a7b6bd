package graft

import org.apache.spark.sql.functions._

import graft.ext.{Similarity, TextOps}

class RedactQuantizeSpec extends SparkSpec {

  test("redactPii scrubs emails, IPv4s, and phones to typed placeholders") {
    import spark.implicits._
    val df = Seq(
      ("write to alice.b+test@sub.example.org today", "<EMAIL>"),
      ("server at 10.0.255.3 rebooted", "<IP>"),
      ("call +1 (415) 555-0142 now", "<PHONE>"),
      ("call 415-555-0142 now", "<PHONE>"),
      ("no pii here at all", null)
    ).toDF("text", "want")
    val out = TextOps.redactPiiWithCounts(df, "text").collect()
    out.foreach { r =>
      val want = r.getAs[String]("want")
      val red = r.getAs[String]("redacted")
      if (want == null) assert(red === r.getAs[String]("text"))
      else assert(red.contains(want), s"'${r.getAs[String]("text")}' -> '$red'")
    }
  }

  test("counts attribute each digit run to exactly one category (chain order)") {
    import spark.implicits._
    val df = Seq(
      "bob99@h.co or 192.168.0.1 or +44 20 7946 0958 and another x@y.io"
    ).toDF("text")
    val r = TextOps.redactPiiWithCounts(df, "text").head()
    assert(r.getAs[Int]("n_email") === 2)
    assert(r.getAs[Int]("n_ip") === 1)
    assert(r.getAs[Int]("n_phone") === 1)
    val red = r.getAs[String]("redacted")
    assert(!red.matches(".*\\d{4,}.*"), s"long digit runs must be gone: $red")
  }

  test("quantizeInt8: extrema map to ±127, all-zero vectors stay zero") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, -2.0f, 0.5f)),
      (2L, Seq(0.0f, 0.0f)),
      (3L, Seq(-4.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(df, "embedding")
      .select("vec_id", "q_scale", "q_vec")
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getSeq[Byte](2)))).toMap
    // vec 1: scale = 2/127; q = round(v * 127 / 2) = (64, -127, 32)
    assert(math.abs(out(1L)._1 - 2.0 / 127) < 1e-12)
    assert(out(1L)._2 === Seq[Byte](64, -127, 32))
    // all-zero: scale 1, q all zero (never NaN)
    assert(out(2L)._1 === 1.0 && out(2L)._2 === Seq[Byte](0, 0))
    // single negative extremum hits exactly -127
    assert(out(3L)._2 === Seq[Byte](-127))
  }

  test("quantizeSummary error bound: worst-dimension error <= scale/2") {
    val embs = Tables.load(spark, sf0001, "embeddings")
    val s = Similarity.quantizeSummary(embs, "vec_id", "embedding")
      .select(col("err_max9"), col("scale6"), col("min_q"), col("max_q"))
      .collect()
    assert(s.nonEmpty)
    s.foreach { r =>
      val (err, scale) = (r.getDouble(0), r.getDouble(1))
      assert(err <= scale / 2 + 1e-6, s"half-up rounding bounds error at scale/2: err=$err scale=$scale")
      assert(r.getInt(2) >= -127 && r.getInt(3) <= 127)
    }
  }
}
