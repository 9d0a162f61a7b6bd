package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    new java.io.File(outDir).mkdirs()
    // optional subset for local iteration (SparkEntry.querySubset — the
    // same knob Bench reads); the driver never sets it, so the gate
    // always dumps everything
    val selected = SparkEntry.querySubset match {
      case Some(s) => SparkEntry.queries.filter { case (n, _) => s(n) }
      case None    => SparkEntry.queries
    }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // sketch-dedup operators cache intermediates; don't let 60+ queries'
      // leftovers accumulate memory pressure across the dump
      spark.catalog.clearCache()
    }
    // expected tables for oracles DuckDB cannot compute itself: computed
    // by an INDEPENDENT implementation (never the gated code path) and
    // materialized where the {GRAFT_EXPECTED} oracle SQL will read them —
    // a SIBLING dir of the dump, so the driver's "results without an
    // oracle" scan over outDir subdirs never mistakes them for queries
    val absOut = new java.io.File(outDir).getAbsolutePath
    val expectedDir = s"$absOut.expected"
    SparkEntry.expectedTables
      .filter { case (name, _) => selected.contains(name) }
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$expectedDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] expected table for $name failed: ${e.getMessage}")
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("{GRAFT_EXPECTED}", expectedDir))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
