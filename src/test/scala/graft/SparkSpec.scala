package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session per suite (lazy; JVM-wide getOrCreate keeps it one per
  * forked test JVM).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(s)
    s
  }

  /** Fixture root — override with SPARK_GRAFT_TESTDATA on machines whose
    * parquet fixtures live elsewhere than the driver container's layout.
    */
  def testdataRoot: String = sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata")

  def sfDir(name: String): String = s"$testdataRoot/$name"

  def sf0001: String = sfDir("sf0.001")

  /** Cancel (not fail) a test whose fixture dir is absent, with a pointer
    * at the override knob.
    */
  def requireFixture(dir: String): Unit =
    assume(new java.io.File(dir).isDirectory,
      s"fixture dir $dir not found — set SPARK_GRAFT_TESTDATA to your testdata root")

  def tempDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
