package graft

import org.apache.spark.sql.SparkSession

/** Smoke main mirroring the driver's t1 check: run SparkEntry.entry on
  * sf0.001 and assert rows > 0. Prints one line.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val df = SparkEntry.entry(spark)
    val n = df.count()
    val sample = df.select("topic", "value").head()
    println(s"ENTRY_SMOKE rows=$n topic=${sample.getString(0)} value=${sample.getString(1).take(160)}")
    spark.stop()
  }
}
