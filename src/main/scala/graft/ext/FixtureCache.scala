package graft.ext

import org.apache.spark.sql.DataFrame

/** Guard for the conf-keyed fixture/index caches ([[Multimodal.ImageCacheConfKey]],
  * [[Similarity.IvfCacheConfKey]]): a cache dir built from one corpus (or one
  * parameter set) must not be silently served for another. The build writes a
  * fingerprint of the source parquet files plus every build parameter into the
  * cache dir; the read path recomputes it and falls back to the inline build
  * on any mismatch. The fingerprint uses `df.inputFiles` — metadata only, no
  * job — which identifies the corpus because the test fixtures are immutable
  * files (a rewritten table gets new part-file names).
  */
private[ext] object FixtureCache {

  private val ParamsFile = "_graft_cache_params"

  /** md5 over the source file list and the build parameters. */
  def fingerprint(source: DataFrame, params: String*): String = {
    val payload = (params :+ source.inputFiles.sorted.mkString(",")).mkString("|")
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(payload.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  def write(dir: String, fp: String): Unit = {
    val p = java.nio.file.Paths.get(dir, ParamsFile)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, fp.getBytes("UTF-8"))
  }

  /** True iff `dir` carries a params file matching `fp`. A cache dir without
    * one (or with a stale one) is treated as invalid, never trusted.
    */
  def matches(dir: String, fp: String): Boolean = {
    val p = java.nio.file.Paths.get(dir, ParamsFile)
    java.nio.file.Files.exists(p) &&
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8") == fp
  }
}
