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
  *
  * A DataFrame with NO backing files (createDataFrame, local views) is
  * unfingerprintable: two different in-memory corpora would otherwise hash
  * identically and a stale fixture would be served silently. Such frames get
  * `None` — `matches` always refuses (inline rebuild) and `write` removes any
  * stale params file so the dir can never be trusted later.
  */
private[graft] object FixtureCache {

  private val ParamsFile = "_graft_cache_params"

  /** md5 over the source file list and the build parameters; `None` when the
    * frame has no backing files (not identifiable by file list).
    */
  def fingerprint(source: DataFrame, params: String*): Option[String] = {
    val files = source.inputFiles
    if (files.isEmpty) None
    else {
      val payload = (params :+ files.sorted.mkString(",")).mkString("|")
      val md = java.security.MessageDigest.getInstance("MD5")
      Some(md.digest(payload.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    }
  }

  def write(dir: String, fp: Option[String]): Unit = {
    val p = java.nio.file.Paths.get(dir, ParamsFile)
    fp match {
      case Some(f) =>
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.write(p, f.getBytes("UTF-8"))
      case None =>
        // unfingerprintable build: make sure no stale params file survives
        // to vouch for content it did not produce
        java.nio.file.Files.deleteIfExists(p)
    }
  }

  /** True iff `dir` carries a params file matching a present `fp`. A cache
    * dir without one (or with a stale one), or an unfingerprintable source
    * (`fp == None`), is treated as invalid, never trusted.
    */
  def matches(dir: String, fp: Option[String]): Boolean = fp.exists { f =>
    val p = java.nio.file.Paths.get(dir, ParamsFile)
    java.nio.file.Files.exists(p) &&
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8") == f
  }
}
