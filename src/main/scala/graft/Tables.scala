package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md). */
object Tables {

  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings"
  )

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts has shipped as either parquet TIMESTAMP(NANOS) (which
      // Spark's vectorized reader rejects — read nanos as long, truncate
      // to micros, the same ns→µs truncation DuckDB applies) or plain
      // TIMESTAMP(MICROS) with isAdjustedToUTC=false (which Spark infers
      // as TIMESTAMP_NTZ). Adapt on the actual footer type so both
      // generations load to the identical session-TZ TIMESTAMP(µs)
      // values — sessions pin UTC, so the NTZ cast is epoch-preserving.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts",
            org.apache.spark.sql.functions.col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => raw
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }

  /** Register tables as temp views for the SQL surface (SURVEY.md §3
    * EP3 / §7 v4). Idempotent; registers only what's asked for (each
    * registration costs a parquet footer read).
    */
  def registerViews(spark: SparkSession, dir: String, names: Seq[String] = All): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
