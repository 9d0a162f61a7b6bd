package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.functions.GraftFunctions

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`): brute-force cosine top-k as the exact baseline, a
  * random-hyperplane LSH bucketed variant and an IVF (inverted-file,
  * centroid-probed) variant as the scale paths.
  *
  * Scale posture: the brute-force path broadcasts the (small) query set and
  * streams the corpus once — a map-only plan plus a per-query top-k
  * aggregation; no shuffle of the corpus. The LSH/IVF paths cut the scanned
  * fraction from 100% to (buckets probed / total buckets), which is the
  * published IVF trade-off (see PAPERS.md ANN entries); candidates are
  * re-scored exactly, so recall loss comes only from bucket misses.
  */
object Similarity {

  /** Exact cosine top-k neighbors for each query vector.
    *
    * Plan: broadcast the query set, scan the corpus once, and aggregate
    * per-query top-k with [[graft.functions.TopKAggregator]] — partial
    * aggregation keeps k rows per (query × partition) in the shuffle
    * instead of exchanging every scored pair, which is what makes this a
    * map-only corpus scan at 100 TB. (The window-ranked equivalent,
    * [[bruteForceTopKWindow]], shuffles |corpus|×|queries| scored rows.)
    *
    * @param corpus  (id, vec) corpus — any size; scanned once
    * @param queries (id, vec) query set — must be broadcast-small
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    import graft.functions.TopKAggregator
    val c = corpus.select(col(idCol).cast("long").as("n_id"), col(vecCol).as("n_vec"))
    val q = queries.select(col(idCol).cast("long").as("q_id"), col(vecCol).as("q_vec"))
    val scored = c
      .join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("cos", GraftFunctions.cosine_similarity(col("q_vec"), col("n_vec")))
    val topk = udaf(new TopKAggregator(k))
    scored
      .groupBy("q_id")
      .agg(topk(col("cos"), col("n_id")).as("nn"))
      .select(col("q_id"), posexplode(col("nn")))
      .select(
        col("q_id"),
        col("col.id").as("n_id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("col.score").as("cos")
      )
  }

  /** Window-ranked variant of [[bruteForceTopK]] — same results, kept as
    * the cross-check baseline (see ExtSpec parity test).
    */
  def bruteForceTopKWindow(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    val c = corpus.select(col(idCol).cast("long").as("n_id"), col(vecCol).as("n_vec"))
    val q = queries.select(col(idCol).cast("long").as("q_id"), col(vecCol).as("q_vec"))
    val scored = c
      .join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("cos", GraftFunctions.cosine_similarity(col("q_vec"), col("n_vec")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("q_id", "n_id", "rank", "cos")
  }

  // ---- random-hyperplane LSH ----------------------------------------------

  /** Sign-random-projection bucket id over `numPlanes` hyperplanes
    * (Charikar SRP-LSH): bit p = sign(v · r_p), plane components derived
    * from xxhash64(seed, plane, dim) — reproducible across runs without
    * storing plane matrices. Buckets collide for angularly-close vectors.
    *
    * Computed by the native [[graft.functions.SrpBucket]] expression (tight
    * primitive loop in whole-stage codegen); [[srpBucketReference]] is the
    * bit-identical built-in composition kept for the parity test.
    */
  def srpBucket(vec: Column, numPlanes: Int, seed: Int = 42): Column =
    GraftFunctions.srp_bucket(vec, numPlanes, seed)

  /** Built-in-composition form of [[srpBucket]] (interpreted HOFs —
    * reference semantics only, not for hot paths).
    */
  def srpBucketReference(vec: Column, numPlanes: Int, seed: Int = 42): Column = {
    def planeComponent(plane: Int, dim: Column): Column =
      (xxhash64(lit(seed), lit(plane), dim) % 1000).cast("double") / 1000.0
    val dims = sequence(lit(0), size(vec) - 1)
    val bits = (0 until numPlanes).map { p =>
      val dot = aggregate(
        zip_with(vec, dims, (x, i) => x.cast("double") * planeComponent(p, i)),
        lit(0.0),
        (acc, v) => acc + v
      )
      when(dot > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed ANN: probe only the query's bucket (and optionally
    * single-bit-flip neighbor buckets for recall), re-score candidates
    * exactly with cosine, emit top-k per query.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numPlanes: Int = 8,
      multiProbeBits: Int = 1,
      seed: Int = 42
  ): DataFrame = {
    val c = corpus
      .select(col(idCol).cast("long").as("n_id"), col(vecCol).as("n_vec"))
      .withColumn("bucket", srpBucket(col("n_vec"), numPlanes, seed))
    // multi-probe: query probes its own bucket plus all buckets within
    // `multiProbeBits` bit flips (recall knob; 1 flip → numPlanes+1 probes)
    val flips: Seq[Column] = lit(0L) +: (if (multiProbeBits >= 1) (0 until numPlanes).map(p => shiftleft(lit(1L), p)) else Seq.empty)
    val q = queries
      .select(col(idCol).cast("long").as("q_id"), col(vecCol).as("q_vec"))
      .withColumn("qb", srpBucket(col("q_vec"), numPlanes, seed))
      .withColumn("bucket", explode(array(flips.map(f => col("qb").bitwiseXOR(f)): _*)))
      .drop("qb")
    val scored = c
      .join(broadcast(q), Seq("bucket"))
      .where(col("q_id") =!= col("n_id"))
      .dropDuplicates("q_id", "n_id")
      .withColumn("cos", GraftFunctions.cosine_similarity(col("q_vec"), col("n_vec")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("q_id", "n_id", "rank", "cos")
  }

  // ---- IVF (inverted file) ------------------------------------------------

  /** Build an IVF index: assign every corpus vector to its nearest centroid
    * (centroids via ml KMeans with a fixed seed). Returns (corpus +
    * centroid_id, centroids DF). At scale the assignment is a broadcast map
    * join (centroid count ≪ corpus) and the index is just a partitioning
    * column — write `partitionBy("centroid_id")` for pruned probes.
    */
  def ivfIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nCentroids: Int,
      seed: Long = 42L
  ): (DataFrame, DataFrame) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    val withVec = corpus.select(
      col(idCol).cast("long").as("n_id"),
      col(vecCol).as("n_vec"),
      array_to_vector(col(vecCol)).as("features")
    )
    val km = new KMeans().setK(nCentroids).setSeed(seed).setMaxIter(10)
    val model = km.fit(withVec)
    val assigned = model.transform(withVec).withColumnRenamed("prediction", "centroid_id").drop("features")
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray.map(_.toFloat)) }
      .toSeq
    val spark = corpus.sparkSession
    import spark.implicits._
    val cdf = centroids.toDF("centroid_id", "c_vec").withColumn("c_vec", col("c_vec").cast("array<float>"))
    (assigned, cdf)
  }

  /** Conf key: directory holding a pre-built IVF index (bench warmup sets
    * it). An IVF index is built once per corpus and amortized over every
    * query that probes it, so the benched probe path reads a prebuilt
    * index — build cost is visible separately (Verify builds inline).
    */
  val IvfCacheConfKey = "spark.graft.sim.ivfCacheDir"

  /** [[ivfIndex]] behind the optional prebuilt-index cache. The cached
    * index is stored `partitionBy("centroid_id")` — the index IS a
    * partitioning column, so probe joins prune to the probed centroids'
    * partitions instead of scanning the corpus.
    */
  def cachedIvfIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nCentroids: Int
  ): (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    spark.conf.getOption(IvfCacheConfKey) match {
      // the cache dir records the build parameters + source files it was
      // built from; a dir built for a different corpus / centroid count is
      // rejected and the index is rebuilt inline instead of silently served
      case Some(dir) if FixtureCache.matches(dir, ivfFingerprint(corpus, idCol, vecCol, nCentroids)) =>
        (spark.read.parquet(s"$dir/indexed"), spark.read.parquet(s"$dir/centroids"))
      case Some(dir) =>
        System.err.println(
          s"[graft] IVF cache at $dir does not match (corpus=${corpus.inputFiles.length} files, " +
            s"idCol=$idCol, vecCol=$vecCol, nCentroids=$nCentroids) — rebuilding inline")
        ivfIndex(corpus, idCol, vecCol, nCentroids)
      case None => ivfIndex(corpus, idCol, vecCol, nCentroids)
    }
  }

  private def ivfFingerprint(corpus: DataFrame, idCol: String, vecCol: String, nCentroids: Int): Option[String] =
    FixtureCache.fingerprint(corpus, "ivf", idCol, vecCol, nCentroids.toString)

  /** Build and persist the IVF index for `corpus` under `dir` and point
    * [[IvfCacheConfKey]] at it (bench warmup entry point). Same seed as
    * the inline path, so cached and inline probes see the same index.
    */
  def materializeIvfCache(
      spark: SparkSession,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nCentroids: Int,
      dir: String
  ): Unit = {
    val (indexed, centroids) = ivfIndex(corpus, idCol, vecCol, nCentroids)
    indexed.write.mode("overwrite").partitionBy("centroid_id").parquet(s"$dir/indexed")
    centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    FixtureCache.write(dir, ivfFingerprint(corpus, idCol, vecCol, nCentroids))
    spark.conf.set(IvfCacheConfKey, dir)
  }

  /** Incremental IVF insert: assign new vectors to their nearest centroid
    * (squared-euclidean argmin — the SAME metric KMeans assigned the
    * original corpus with, so inserted vectors land in the cell a full
    * rebuild would give them) WITHOUT touching the built index. This is
    * how a real IVF absorbs writes between retrains: the index is a
    * partitioning, inserts are a broadcast map join against the (tiny)
    * centroid table — O(new × nCentroids), never a corpus rescan. Returns
    * rows shaped like [[ivfIndex]]'s indexed output (n_id, n_vec,
    * centroid_id), ready to union.
    */
  def ivfAssign(
      centroids: DataFrame, // (centroid_id, c_vec)
      vectors: DataFrame,
      idCol: String,
      vecCol: String
  ): DataFrame = {
    val v = vectors.select(col(idCol).cast("long").as("n_id"), col(vecCol).as("n_vec"))
    val w = Window.partitionBy(col("n_id")).orderBy(col("dist").asc, col("centroid_id").asc)
    v.crossJoin(broadcast(centroids))
      .withColumn("dist", aggregate(
        zip_with(col("n_vec"), col("c_vec"),
          (a, b) => (a.cast("double") - b.cast("double")) * (a.cast("double") - b.cast("double"))),
        lit(0.0), (acc, x) => acc + x))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select("n_id", "n_vec", "centroid_id")
  }

  /** IVF probe: for each query, rank centroids by cosine, keep the nearest
    * `nProbe`, and scan only those centroid partitions; re-score exactly.
    */
  def ivfTopK(
      indexed: DataFrame, // (n_id, n_vec, centroid_id)
      centroids: DataFrame, // (centroid_id, c_vec)
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int
  ): DataFrame = {
    val q = queries.select(col(idCol).cast("long").as("q_id"), col(vecCol).as("q_vec"))
    val wq = Window.partitionBy(col("q_id")).orderBy(col("c_cos").desc, col("centroid_id").asc)
    val probes = q
      .crossJoin(broadcast(centroids))
      .withColumn("c_cos", GraftFunctions.cosine_similarity(col("q_vec"), col("c_vec")))
      .withColumn("c_rank", row_number().over(wq))
      .where(col("c_rank") <= nProbe)
      .select("q_id", "q_vec", "centroid_id")
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
    indexed
      .join(broadcast(probes), Seq("centroid_id"))
      .where(col("q_id") =!= col("n_id"))
      .withColumn("cos", GraftFunctions.cosine_similarity(col("q_vec"), col("n_vec")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("q_id", "n_id", "rank", "cos")
  }

  /** Symmetric int8 quantization of an embedding column — the standard
    * vector-index compression step (4× smaller than float32, SIMD-friendly
    * dot products downstream).
    *
    * Per vector: `scale = max(|v_i|) / 127`, `q_i = floor(v_i/scale + 0.5)`
    * (explicit half-up, pinned so every engine rounds ties identically;
    * all-zero vectors take scale = 1 so q = 0 rather than NaN).
    *
    * Everything is higher-order array functions (`transform`/`aggregate`/
    * `zip_with`) inside ONE projection: no explode, no shuffle, no UDF —
    * quantizing a 100 TB embedding table is a map-only scan. Returns `df`
    * with `q_vec array<tinyint>`, `q_scale double` appended.
    */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame = {
    val v = s"transform($vecCol, x -> CAST(x AS DOUBLE))"
    val maxAbs = s"aggregate($v, CAST(0.0 AS DOUBLE), (m, x) -> greatest(m, abs(x)))"
    val scale = s"CASE WHEN $maxAbs = 0.0 THEN 1.0 ELSE $maxAbs / 127.0 END"
    df.withColumn("q_scale", expr(scale))
      .withColumn("q_vec", expr(s"transform($vecCol, x -> CAST(floor(CAST(x AS DOUBLE) / q_scale + 0.5) AS TINYINT))"))
  }

  /** Quantization round-trip summary: per-vector scale, quantized extrema
    * and checksum, and the worst-dimension dequantization error — the
    * columns a quality gate on an index build would watch. Integer parts
    * are exact; the error term is a MAX (not a sum) of doubles, so it is
    * summation-order-independent and reproduces bit-identically on any
    * engine computing the same IEEE ops.
    */
  def quantizeSummary(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    // empty vectors yield NULL aggregates (matching SQL list semantics —
    // a fold's zero element is not a statistic of zero observations)
    val nonEmpty = size(col(vecCol)) > 0
    quantizeInt8(df, vecCol).select(
      col(idCol),
      size(col(vecCol)).as("n_dims"),
      round(col("q_scale"), 6).as("scale6"),
      when(nonEmpty, expr("aggregate(q_vec, CAST(0 AS BIGINT), (s, q) -> s + q)")).as("sum_q"),
      when(nonEmpty, expr("aggregate(q_vec, CAST(127 AS INT), (m, q) -> least(m, CAST(q AS INT)))")).as("min_q"),
      when(nonEmpty, expr("aggregate(q_vec, CAST(-127 AS INT), (m, q) -> greatest(m, CAST(q AS INT)))")).as("max_q"),
      when(nonEmpty, round(
        expr(s"aggregate(zip_with(q_vec, $vecCol, (q, x) -> abs(q * q_scale - CAST(x AS DOUBLE))), CAST(0.0 AS DOUBLE), (m, e) -> greatest(m, e))"),
        9
      )).as("err_max9")
    )
  }
}
