package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Multimodal, Similarity, TextOps}

/** Extension operators without SQL oracles: MinHash/SimHash recall against
  * the exact n-gram Jaccard ground truth, LSH/IVF recall against brute
  * force, fingerprint stability, multimodal plumbing determinism.
  */
class ExtSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf0001, "documents")
  private lazy val embs = Tables.load(spark, sf0001, "embeddings")

  test("WordShingles expression matches the built-in composition exactly") {
    val viaExpr = Dedup.shingled(docs, "doc_id", "text", 5)
      .select($"id", array_sort($"shingles").as("s")).as[(Long, Seq[String])].collect().toMap
    val viaBuiltins = docs.select(
      $"doc_id".cast("long").as("id"),
      array_sort(Dedup.wordShingles($"text", 5)).as("s")
    ).as[(Long, Seq[String])].collect().toMap
    assert(viaExpr == viaBuiltins)
  }

  test("SrpBucket expression matches the built-in composition exactly") {
    val viaExpr = embs.select(
      $"vec_id".cast("long").as("id"),
      Similarity.srpBucket($"embedding", 8, 42).as("b")
    ).as[(Long, Long)].collect().toMap
    val viaBuiltins = embs.select(
      $"vec_id".cast("long").as("id"),
      Similarity.srpBucketReference($"embedding", 8, 42).as("b")
    ).as[(Long, Long)].collect().toMap
    assert(viaExpr == viaBuiltins)
    assert(viaExpr.values.toSet.size > 1, "buckets should spread across values")
  }

  test("SrpBands one-pass signature row matches per-band SrpBucket bit-for-bit") {
    // the banded candidate generator's projection stage: element b of
    // srp_bands(v, bands, bits, seed) must equal
    // srp_bucket(v, bits, seed + 1 + b) exactly — the swap that killed the
    // 30× wall anomaly must not be able to move a single candidate pair
    graft.functions.GraftFunctions.register(spark)
    val bands = 32; val bits = 16; val seed = 42
    val viaBands = embs.select(
      $"vec_id".cast("long").as("id"),
      graft.functions.GraftFunctions.srp_bands($"embedding", bands, bits, seed).as("s")
    ).as[(Long, Seq[Long])].collect().toMap
    val viaBuckets = embs.select(
      $"vec_id".cast("long").as("id"),
      array((0 until bands).map(b =>
        Similarity.srpBucket($"embedding", bits, seed + 1 + b)): _*).as("s")
    ).as[(Long, Seq[Long])].collect().toMap
    assert(viaBands == viaBuckets)
    assert(viaBands.values.flatten.toSet.size > bands,
      "band signatures should spread across values")
  }

  test("SrpBucket plane-weight cache recomputes across ragged dims in one column") {
    // SrpPlaneWeights holds a single (dim, matrix) entry; interleaved dims
    // force the recompute path every row and must still match the
    // per-row-hash reference composition exactly
    val ragged = embs.limit(20).select(
      $"vec_id".cast("long").as("id"),
      when($"vec_id" % 2 === 0, slice($"embedding", 1, 32)).otherwise($"embedding").as("v"))
    val viaExpr = ragged.select($"id", Similarity.srpBucket($"v", 16, 7).as("b"))
      .as[(Long, Long)].collect().toMap
    val viaBuiltins = ragged.select($"id", Similarity.srpBucketReference($"v", 16, 7).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(viaExpr == viaBuiltins)
  }

  test("TopShingleCount matches the interpreted bigram mode-count composition exactly") {
    graft.functions.GraftFunctions.register(spark)
    val viaExpr = docs.select(
      $"doc_id".cast("long").as("id"),
      graft.functions.GraftFunctions.top_shingle_count($"text", 2).as("c")
    ).as[(Long, Int)].collect().toMap
    val ws = split(trim($"text"), "\\s+")
    val bg = zip_with(
      slice(ws, lit(1), size(ws) - 1),
      slice(ws, lit(2), size(ws) - 1),
      (a, b) => concat_ws(" ", a, b))
    val viaBuiltins = docs.select(
      $"doc_id".cast("long").as("id"),
      coalesce(array_max(transform(array_distinct(bg),
        x => size(filter(bg, y => y === x)))), lit(0)).as("c")
    ).as[(Long, Int)].collect().toMap
    assert(viaExpr == viaBuiltins)
    assert(viaExpr.values.exists(_ > 1), "corpus should contain repeated bigrams")
  }

  test("custom expressions codegen cleanly with multiple instances in one projection") {
    // two instances of each expression in a single generated function:
    // fixed local names would make Janino reject the class ("Redefinition
    // of local variable") and the projection silently fall back to
    // interpreter mode — GenerateUnsafeProjection.generate throws instead
    // of falling back, so this asserts the compile succeeds
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types.{ArrayType, FloatType, StringType}
    import graft.functions.{CosineSimilarity, CountInSet, DotProduct, SrpBands, SrpBucket}
    val vec = BoundReference(0, ArrayType(FloatType), nullable = true)
    val words = BoundReference(1, ArrayType(StringType), nullable = true)
    val proj = GenerateUnsafeProjection.generate(Seq(
      CosineSimilarity(vec, vec), CosineSimilarity(vec, vec),
      DotProduct(vec, vec), DotProduct(vec, vec),
      SrpBucket(vec, 8, 42), SrpBucket(vec, 8, 43),
      SrpBands(vec, 4, 8, 42), SrpBands(vec, 4, 8, 43),
      CountInSet(words, Seq("a", "b")), CountInSet(words, Seq("c"))))
    assert(proj != null)
  }

  test("CountInSet expression matches the interpreted filter form exactly") {
    val markers = Seq("the", "and", "of", "to", "is", "with", "for")
    val viaExpr = docs.select(
      $"doc_id".cast("long").as("id"),
      TextOps.stopwordCount($"text", markers).as("c")
    ).as[(Long, Int)].collect().toMap
    val viaBuiltins = docs.select(
      $"doc_id".cast("long").as("id"),
      size(filter(split(lower(trim($"text")), "\\s+"), w => w.isInCollection(markers))).as("c")
    ).as[(Long, Int)].collect().toMap
    assert(viaExpr == viaBuiltins)
    // occurrence semantics, not set-intersection: repeats count each time
    val rep = Seq((1L, "the the the end")).toDF("doc_id", "text")
    assert(rep.select(TextOps.stopwordCount($"text", markers)).as[Int].head() == 3)
  }

  test("minhash banding finds every exact-Jaccard pair at its design threshold") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 5, 0.5, 100L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashNearDupPairs(docs, "doc_id", "text", 5, 64, 16, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // banding with b=16,r=4 has collision prob ≈1 at j≥0.5; verification
    // step then enforces the exact threshold — so lsh ⊆ exact and recall
    // should be high
    assert(lsh.subsetOf(exact))
    if (exact.nonEmpty) {
      val recall = lsh.intersect(exact).size.toDouble / exact.size
      assert(recall >= 0.8, s"recall=$recall exact=${exact.size} lsh=${lsh.size}")
    }
  }

  test("banded SRP LSH finds every planted near-dup and agrees with the block path") {
    // the x_dedup_embedding_lsh gate construction: every 5th vector gets
    // a perturbed copy at cos >= 0.9997 — both candidate generators must
    // surface all of them, and the exact-verify tail makes the two
    // paths' OUTPUTS identical whenever recall holds
    val e = embs.limit(400).select($"vec_id", $"embedding")
    val copies = e.where($"vec_id" % 5 === 0).select(
      ($"vec_id" + 1000000L).as("vec_id"),
      concat(
        array(element_at($"embedding", 1) * lit(1.05f)),
        slice($"embedding", lit(2), size($"embedding") - 1)).as("embedding"))
    val corpus = e.unionByName(copies)
    val planted = e.where($"vec_id" % 5 === 0).select("vec_id").as[Long].collect()
      .map(id => (id, id + 1000000L)).toSet
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val banded = pairs(Dedup.embeddingNearDupPairsLshBanded(
      corpus, "vec_id", "embedding", threshold = 0.9))
    val block = pairs(Dedup.embeddingNearDupPairsLsh(
      corpus, "vec_id", "embedding", threshold = 0.9))
    // the >200k-corpus geometry (LshWideBandCutover) on the same planted
    // corpus — the cutover volume itself is out of unit-test reach, but
    // the 64×20 parameters' recall contract is not
    val wide = pairs(Dedup.embeddingNearDupPairsLshBanded(
      corpus, "vec_id", "embedding", threshold = 0.9, bands = 64, bitsPerBand = 20))
    // the >1M-corpus rung (LshUltraWideBandCutover): same planted-recall
    // contract at 128×24-bit — the cutover volume is out of unit-test
    // reach, the parameters' recall is not
    val ultra = pairs(Dedup.embeddingNearDupPairsLshBanded(
      corpus, "vec_id", "embedding", threshold = 0.9, bands = 128, bitsPerBand = 24))
    assert(planted.subsetOf(banded), s"banded missed ${(planted -- banded).take(3)}")
    assert(banded == block, "exact-verified outputs must agree across generators")
    assert(wide == block, "wide-band geometry must agree with the block path")
    assert(ultra == block, "ultra-wide geometry must agree with the block path")
  }

  test("SRP block-LSH boundary recall at cos=0.9 rises with numBlocks (docstring claim)") {
    // deterministic boundary pairs: for each base vector v build
    // v' = cosθ·v̂ + sinθ·û with û ⊥ v̂ derived from a seeded direction —
    // cos(v, v') = 0.9 exactly (up to float), i.e. pairs AT the
    // threshold, where expected signature Hamming ≈ 64·θ/π ≈ 9.2 exceeds
    // the 8-block pigeonhole radius 7. The docstring states ~93%
    // any-block-match there and full coverage at wider radii — pin both.
    val theta = math.acos(0.9)
    val rnd = new scala.util.Random(7)
    val dim = 64
    val pairs = (0 until 250).map { i =>
      val v = Array.fill(dim)(rnd.nextGaussian())
      val nv = math.sqrt(v.map(x => x * x).sum)
      val vh = v.map(_ / nv)
      val e = Array.fill(dim)(rnd.nextGaussian())
      val dot = vh.zip(e).map { case (a, b) => a * b }.sum
      val u = e.zip(vh).map { case (b, a) => b - dot * a }
      val nu = math.sqrt(u.map(x => x * x).sum)
      val uh = u.map(_ / nu)
      val w = vh.zip(uh).map { case (a, b) =>
        (math.cos(theta) * a + math.sin(theta) * b).toFloat }
      (i.toLong, vh.map(_.toFloat), w)
    }
    val df = spark.createDataFrame(
      pairs.flatMap { case (i, a, b) => Seq((2 * i, a.toSeq), (2 * i + 1, b.toSeq)) })
      .toDF("vec_id", "embedding")
    def recallAt(blocks: Int): Double = {
      val found = Dedup
        .embeddingNearDupPairsLsh(df, "vec_id", "embedding", threshold = 0.89,
          numBlocks = blocks)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      pairs.count(p => found.contains((2 * p._1, 2 * p._1 + 1))).toDouble / pairs.size
    }
    val r8 = recallAt(8)
    val r16 = recallAt(16)
    // r8 ≈ 0.93 by the docstring's boundary analysis; r16's radius 15
    // covers the expected Hamming 9.2 structurally
    assert(r8 >= 0.80 && r8 < 1.0, s"boundary recall at 8 blocks: $r8")
    assert(r16 >= 0.95, s"boundary recall at 16 blocks: $r16")
    assert(r16 > r8, s"wider radius must not lose recall: r8=$r8 r16=$r16")
  }

  test("ml MinHashLSH pipeline recovers the exact-Jaccard pairs") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 5, 0.5, 100L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val ml = Dedup.minhashNearDupPairsMl(docs, "doc_id", "text", 5, 8, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    if (exact.nonEmpty) {
      val recall = ml.intersect(exact).size.toDouble / exact.size
      assert(recall >= 0.7, s"recall=$recall exact=${exact.size} ml=${ml.size}")
    }
  }

  test("AsOfJoin tolerance variant nulls out stale matches") {
    import graft.operators.AsOfJoin
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    val left = Seq((1L, ts("2025-06-14T01:00:00Z"), 10L))
      .toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts("2025-06-14T00:59:00Z"), 5L), // 1 min before → in tolerance
      (1L, ts("2025-06-14T00:00:00Z"), 1L)  // 1 hour before → stale
    ).toDF("user_id", "ts", "event_id")
    val in = AsOfJoin.backwardWithTolerance(
      left, right, Seq("user_id"), "ts", "event_id", Seq("event_id"), "5 MINUTES")
    assert(in.select("asof_event_id").head().getLong(0) == 5L)
    val out = AsOfJoin.backwardWithTolerance(
      left, right.where($"event_id" === 1L), Seq("user_id"), "ts", "event_id",
      Seq("event_id"), "5 MINUTES")
    assert(out.select("asof_event_id").head().isNullAt(0))
  }

  test("simhash near-dup pairs overlap the high-Jaccard ground truth") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 5, 0.7, 100L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sim = Dedup.simhashNearDupPairs(docs, "doc_id", "text", 5, 12)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    if (exact.nonEmpty) {
      val recall = sim.intersect(exact).size.toDouble / exact.size
      assert(recall >= 0.5, s"recall=$recall exact=${exact.size} sim=${sim.size}")
    }
  }

  test("verified simhash pair list equals the exact all-pairs Jaccard ground truth") {
    // both the unit-test corpus and the CORRECTNESS-gate corpus (sf0.01):
    // this is the loud stand-in for the gate's own oracle comparison
    for (dir <- Seq(sf0001, sfDir("sf0.01"))) {
      requireFixture(dir)
      val d = Tables.load(spark, dir, "documents")
      val exact = Dedup.ngramJaccardPairs(d, "doc_id", "text", 5, 0.4, Long.MaxValue)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val sim = Dedup.simhashNearDupPairsVerified(d, "doc_id", "text", 5, 0.4)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(sim == exact, s"$dir: missing=${exact -- sim} extra=${sim -- exact}")
    }
  }

  test("CORPUS PIN: every true near-dup pair sits inside the sketch gates' deterministic recall") {
    // The x_dedup_minhash / x_dedup_simhash oracles equal the exact
    // all-pairs Jaccard only because the corpus is friendly; this test
    // makes that data dependence fail HERE (loudly, with a diagnosis)
    // instead of in the correctness gate if the driver regenerates data.
    for (dir <- Seq(sf0001, sfDir("sf0.01"))) {
      requireFixture(dir)
      val d = Tables.load(spark, dir, "documents")
      val truePairs = Dedup.ngramJaccardPairs(d, "doc_id", "text", 5, 0.4, Long.MaxValue)
        .select($"id_a", $"id_b", $"jaccard")
      // (1) minhash pin: 16 bands × 4 rows has ≥ 0.996 collision prob at
      // j ≥ 0.7 but only ~0.34 at j = 0.4 — the gate corpus must have no
      // pairs in the low-recall band
      val lowBand = truePairs.where($"jaccard" < 0.7).collect()
      assert(lowBand.isEmpty,
        s"$dir: pairs in minhash low-recall band [0.4, 0.7): ${lowBand.mkString(", ")} — " +
          "the x_dedup_minhash oracle equality no longer holds by design; regenerate or re-band")
      // (2) simhash pin: the gate config (blocks=4, probeBits=2) guarantees
      // recall only through hamming 11 — every true pair must sit within it
      val hashes = Dedup.simhashes(Dedup.shingled(d, "doc_id", "text", 5))
      val maxHam = truePairs
        .join(hashes.select($"id".as("id_a"), $"sh".as("h_a")), Seq("id_a"))
        .join(hashes.select($"id".as("id_b"), $"sh".as("h_b")), Seq("id_b"))
        .select(max(bit_count($"h_a".bitwiseXOR($"h_b"))))
        .as[Int].head()
      assert(maxHam <= 11,
        s"$dir: true pair at simhash hamming $maxHam > guaranteed radius 11 — " +
          "the x_dedup_simhash oracle equality now rests on chance-found candidates; widen probes")
    }
  }

  test("aggregator top-k matches the window-ranked baseline exactly") {
    val queries = embs.where($"vec_id" < 20)
    val agg = Similarity.bruteForceTopK(embs, queries, "vec_id", "embedding", 5)
      .select("q_id", "n_id", "rank").as[(Long, Long, Int)].collect().toSet
    val win = Similarity.bruteForceTopKWindow(embs, queries, "vec_id", "embedding", 5)
      .select("q_id", "n_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(agg == win)
  }

  test("SRP-LSH top-k recall vs brute force tracks the probed fraction") {
    val queries = embs.where($"vec_id" < 20)
    val bf = Similarity.bruteForceTopK(embs, queries, "vec_id", "embedding", 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    // 4 planes + 1-bit multiprobe = 5/16 buckets probed (~31% of a
    // near-uniform corpus); recall must beat that scanned fraction —
    // the test data embeddings are random, so LSH's edge is modest but
    // must be present and the candidates must re-score exactly
    val lsh = Similarity.lshTopK(embs, queries, "vec_id", "embedding", 5, 4, 1)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = lsh.intersect(bf).size.toDouble / bf.size
    assert(recall >= 0.25, s"recall=$recall")
  }

  test("IVF top-k recall vs brute force") {
    val queries = embs.where($"vec_id" < 20)
    val bf = Similarity.bruteForceTopK(embs, queries, "vec_id", "embedding", 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val (indexed, centroids) = Similarity.ivfIndex(embs, "vec_id", "embedding", 16)
    val ivf = Similarity.ivfTopK(indexed, centroids, queries, "vec_id", "embedding", 5, 4)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = ivf.intersect(bf).size.toDouble / bf.size
    assert(recall >= 0.4, s"recall=$recall") // nProbe=4 of 16 centroids
  }

  test("ivfAssign: incremental inserts land in the cell a rebuild would give them") {
    val (indexed, centroids) = Similarity.ivfIndex(embs, "vec_id", "embedding", 16)
    // re-assign a slice of the ALREADY-indexed corpus through the
    // incremental path: the squared-euclidean argmin must reproduce
    // KMeans's own assignment for every vector
    val sample = embs.where($"vec_id" % 7 === 0)
    val reassigned = Similarity.ivfAssign(centroids, sample, "vec_id", "embedding")
      .select($"n_id", $"centroid_id".as("assigned"))
    val mismatches = indexed
      .join(reassigned, Seq("n_id"))
      .where($"centroid_id" =!= $"assigned")
      .count()
    assert(mismatches === 0L, s"$mismatches vectors landed in a different cell than the rebuild")
  }

  test("LSH-bucketed embedding near-dup recovers the brute-force pairs") {
    val bf = Dedup.embeddingNearDupPairs(embs, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // 16 planes / 8 blocks: pigeonhole guarantees candidates for pairs
    // within signature Hamming 7 of 16; a cos≥0.4 pair disagrees per
    // plane w.p. ~0.37, so P(Hamming ≤ 7) ≈ 0.8 — the recall dial at
    // this deliberately loose threshold; true near-dup thresholds
    // (≥0.9, Hamming concentrated near 0) sit deep inside the radius
    val lsh = Dedup.embeddingNearDupPairsLsh(
      embs, "vec_id", "embedding", 0.4, numPlanes = 16, numBlocks = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(bf)) // exact re-score ⇒ no false positives
    if (bf.nonEmpty) {
      val recall = lsh.intersect(bf).size.toDouble / bf.size
      assert(recall >= 0.6, s"recall=$recall bf=${bf.size} lsh=${lsh.size}")
    }
  }

  test("block-LSH embedding near-dup is exact for injected near-dup copies") {
    // the x_dedup_embedding_lsh gate contract in miniature: a corpus with
    // true near-dups (perturbed copies, cos ≈ 0.9997+) at threshold 0.9 —
    // copy pairs differ in ~0 signature bits, far inside the pigeonhole
    // radius, so LSH output == brute-force output exactly
    val copies = embs.where($"vec_id" % 5 === 0).select(
      ($"vec_id" + 1000000L).as("vec_id"),
      concat(
        array(element_at($"embedding", 1) * lit(1.05f)),
        slice($"embedding", 2, 63)).as("embedding"))
    val corpus = embs.select("vec_id", "embedding").unionByName(copies)
    val bf = Dedup.embeddingNearDupPairs(corpus, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingNearDupPairsLsh(corpus, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(bf.nonEmpty, "injected copies must qualify at 0.9")
    assert(lsh == bf, s"lsh=${lsh.size} bf=${bf.size} missed=${(bf -- lsh).take(5)}")
  }

  test("image perceptual-hash dedup: banded pairs equal brute force; planted copies pinned in radius") {
    val imgs = Multimodal.syntheticImages(spark, docs)
    val copies = Multimodal.perturbedImageCopies(
      imgs.filter($"media_id" % 4 === 0), idOffset = 100000L, rgbXor = 0x010101)
    val hashes = Multimodal.perceptualHashes(imgs.unionByName(copies)).toDF().cache()
    try {
      // grid contract: only images at least grid-sized are hashed
      val hashable = imgs.filter(r => r.width >= 9 && r.height >= 8).count() +
        copies.filter(r => r.width >= 9 && r.height >= 8).count()
      assert(hashes.count() === hashable)
      // CORPUS PIN (the simhash idiom): every planted (orig, perturbed)
      // pair must sit INSIDE the pigeonhole radius, or the gate's
      // banded-equals-brute-force equality would rest on chance
      val maxHam = hashes.as("a")
        .join(hashes.as("b"), col("b.media_id") === col("a.media_id") + 100000L)
        .select(bit_count(col("a.dhash").bitwiseXOR(col("b.dhash"))).cast("int").as("ham"))
        .agg(max($"ham")).as[Int].head()
      assert(maxHam <= 11,
        s"planted perturbed copy at dHash hamming $maxHam > guaranteed radius 11 — " +
          "x_dedup_image's recall would be partial; widen blocks/probes")
      // exactness: pigeonhole-banded join ≡ brute-force all-pairs
      val banded = Dedup.hammingNearDupPairs(hashes, "media_id", "dhash", radius = 11)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val bf = hashes.as("a")
        .join(hashes.as("b"), col("a.media_id") < col("b.media_id"))
        .where(bit_count(col("a.dhash").bitwiseXOR(col("b.dhash"))) <= 11)
        .select(col("a.media_id"), col("b.media_id")).as[(Long, Long)].collect().toSet
      assert(banded === bf, s"banded=${banded.size} bf=${bf.size} missed=${(bf -- banded).take(5)}")
      // recall on the planted ground truth: every hashable copy is found
      val nCopies = hashes.where($"media_id" >= 100000L).count()
      val recovered = banded.count { case (a, b) => b == a + 100000L }
      assert(recovered === nCopies, s"recovered=$recovered of $nCopies planted copies")
    } finally hashes.unpersist()
  }

  test("audio/video perceptual dedup: planted perturbed copies pinned inside the radius, banded = brute force") {
    import spark.implicits._
    // audio: LSB-flipped PCM copies
    val aud = Multimodal.syntheticAudio(spark, docs)
    val aCopies = Multimodal.perturbedAudioCopies(aud.filter($"media_id" % 3 === 0), 100000L)
    val aHashes = Multimodal.audioFingerprints(aud.unionByName(aCopies)).toDF().cache()
    // video: every frame pixel-XORed, container rebuilt
    val vid = Multimodal.syntheticVideo(spark, docs)
    val vCopies = Multimodal.perturbedVideoCopies(vid.filter($"media_id" % 3 === 0), 100000L, 0x010101)
    val vHashes = Multimodal.videoKeyframeHashes(vid.unionByName(vCopies)).toDF().cache()
    try {
      for ((hashes, hcol, label) <- Seq((aHashes, "fp", "audio"), (vHashes, "dhash", "video"))) {
        val maxHam = hashes.as("a")
          .join(hashes.as("b"), col("b.media_id") === col("a.media_id") + 100000L)
          .select(bit_count(col(s"a.$hcol").bitwiseXOR(col(s"b.$hcol"))).cast("int").as("ham"))
          .agg(max($"ham")).as[Int].head()
        assert(maxHam <= 11, s"$label planted copy at hamming $maxHam > radius 11")
        val banded = Dedup.hammingNearDupPairs(hashes, "media_id", hcol, radius = 11)
          .select("id_a", "id_b").as[(Long, Long)].collect().toSet
        val bf = hashes.as("a")
          .join(hashes.as("b"), col("a.media_id") < col("b.media_id"))
          .where(bit_count(col(s"a.$hcol").bitwiseXOR(col(s"b.$hcol"))) <= 11)
          .select(col("a.media_id"), col("b.media_id")).as[(Long, Long)].collect().toSet
        assert(banded === bf, s"$label banded=${banded.size} bf=${bf.size}")
        val nCopies = hashes.where($"media_id" >= 100000L).count()
        assert(banded.count { case (a, b) => b == a + 100000L } === nCopies,
          s"$label recall below 1.0 on planted copies")
      }
    } finally { aHashes.unpersist(); vHashes.unpersist() }
  }

  test("hammingAdmit: admission statuses equal keep-first dedup over index union batch") {
    import spark.implicits._
    val imgs = Multimodal.syntheticImages(spark, docs)
    val index = Multimodal.perceptualHashes(imgs).toDF().select("media_id", "dhash").cache()
    val bCopies = Multimodal.perturbedImageCopies(
      imgs.filter($"media_id" % 4 === 0), 100000L, 0x010101)
    val bNew = Multimodal.perturbedImageCopies(
      imgs.filter($"media_id" % 4 === 1), 300000L, 0x808080)
    val bNewDup = Multimodal.perturbedImageCopies(
      imgs.filter($"media_id" % 4 === 1), 400000L, 0x818181)
    val batch = Multimodal
      .perceptualHashes(bCopies.unionByName(bNew).unionByName(bNewDup)).toDF()
      .select("media_id", "dhash").cache()
    try {
      val admit = Dedup.hammingAdmit(index, batch, "media_id", "dhash", radius = 11)
        .select($"id", ($"status" =!= "new").as("dropped"))
        .as[(Long, Boolean)].collect().toMap
      // ground truth: keep-first over the union — b dropped iff some a < b
      // within the radius
      val union = index.unionByName(batch)
      val droppedFull = Dedup.hammingNearDupPairs(union, "media_id", "dhash", radius = 11)
        .where($"id_b" >= 100000L).select("id_b").as[Long].collect().toSet
      assert(admit.keySet === batch.select("media_id").as[Long].collect().toSet)
      val diff = admit.keySet.filter(id => admit(id) != droppedFull.contains(id))
      assert(diff.isEmpty, s"admission diverges at ${diff.take(5)}")
      // all three fates present
      val statuses = Dedup.hammingAdmit(index, batch, "media_id", "dhash", radius = 11)
        .select("status").distinct().as[String].collect().toSet
      assert(statuses === Set("dup_snapshot", "dup_batch", "new"), statuses.toString)
    } finally { index.unpersist(); batch.unpersist() }
  }

  test("hammingIndexBanded: persisted banded index reproduces inline admission; blocks=1 keys keep all 64 bits") {
    import spark.implicits._
    val imgs = Multimodal.syntheticImages(spark, docs)
    val index = Multimodal.perceptualHashes(imgs).toDF().select("media_id", "dhash").cache()
    val batch = Multimodal
      .perceptualHashes(Multimodal.perturbedImageCopies(
        imgs.filter($"media_id" % 4 === 0), 100000L, 0x010101)).toDF()
      .select("media_id", "dhash").cache()
    val dir = java.nio.file.Files.createTempDirectory("graft-banded-idx").toString
    try {
      // the persisted-artifact contract: banding → parquet → read-back →
      // admission must equal admission over the raw index
      Dedup.hammingIndexBanded(index, "media_id", "dhash").write
        .mode("overwrite").partitionBy("blk").parquet(dir)
      val stored = spark.read.parquet(dir)
      val viaStored = Dedup.hammingAdmitBanded(stored, batch, "media_id", "dhash", radius = 11)
        .select($"id", $"status").as[(Long, String)].collect().toMap
      val inline = Dedup.hammingAdmit(index, batch, "media_id", "dhash", radius = 11)
        .select($"id", $"status").as[(Long, String)].collect().toMap
      assert(viaStored === inline)
      // the width-64 mask regression: with blocks = 1 the single band key
      // must BE the hash (the pre-fix mask wrapped to 0 and zeroed it)
      val one = Dedup.hammingIndexBanded(index, "media_id", "dhash", blocks = 1)
        .select(($"key" === $"hh").as("ok")).as[Boolean].collect()
      assert(one.nonEmpty && one.forall(identity), "blocks=1 band key must equal the full hash")
    } finally {
      index.unpersist(); batch.unpersist()
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(dir)
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("video N-frame dedup: frame-0-replaced copies missed by the keyframe hash, caught via mid/last slots") {
    import spark.implicits._
    // multi-frame clips only (nf >= 2): the single-frame boundary case is
    // asserted separately below
    val vid = Multimodal.syntheticVideo(spark, docs.where($"n_chars" % 8 =!= 0))
      .filter($"width" >= 9 && $"height" >= 8)
    val copies = Multimodal.perturbedVideoCopiesFrame0(
      vid, idOffset = 100000L, frame0Xor = 0x808080, restXor = 0x010101)
    val all = vid.unionByName(copies)
    val nSrc = vid.count()
    // keyframe-only path: frame 0 is content-re-randomized, so NO planted
    // pair may surface
    val kf = Multimodal.videoKeyframeHashes(all).toDF()
    val kfPairs = Dedup.hammingNearDupPairs(kf, "media_id", "dhash", radius = 11)
      .where($"id_b" === $"id_a" + 100000L).count()
    assert(kfPairs === 0L, s"keyframe hash unexpectedly caught $kfPairs frame-0-replaced copies")
    // N-frame path: every planted copy pairs through a same-slot match
    val fh = Multimodal.videoSampledFrameHashes(all).toDF()
    val anyPairs = Dedup.hammingNearDupPairsAnySlot(fh, "media_id", "slot", "dhash", radius = 11)
      .where($"id_b" === $"id_a" + 100000L).count()
    assert(anyPairs === nSrc, s"N-frame caught $anyPairs of $nSrc frame-0-replaced copies")
    // single-frame boundary: all three slots ARE the replaced frame — the
    // miss is structural and must stay a miss (no false confidence)
    val vid1 = Multimodal.syntheticVideo(spark, docs.where($"n_chars" % 8 === 0))
      .filter($"width" >= 9 && $"height" >= 8)
    if (vid1.count() > 0) {
      val all1 = vid1.unionByName(Multimodal.perturbedVideoCopiesFrame0(
        vid1, idOffset = 100000L, frame0Xor = 0x808080, restXor = 0x010101))
      val fh1 = Multimodal.videoSampledFrameHashes(all1).toDF()
      val caught1 = Dedup.hammingNearDupPairsAnySlot(fh1, "media_id", "slot", "dhash", radius = 11)
        .where($"id_b" === $"id_a" + 100000L).count()
      assert(caught1 === 0L, "single-frame frame-0-replaced copy cannot be catchable")
    }
  }

  test("exactSubstringSpans: shared, copied, and self-repeated substrings, first kept") {
    import spark.implicits._
    val df = Seq(
      1L -> "w1 w2 w3 w4 w5 w6",           // the first occurrence — never flagged
      2L -> "z w3 w4 w5 w6 q",             // shares the 4-gram w3..w6 at pos 1
      3L -> "w1 w2 w3 w4 w5 w6",           // full copy — one merged span [0,6)
      4L -> "r1 r2 r3 r4 x r1 r2 r3 r4",   // intra-doc repeat — second copy flagged
      5L -> "a b c"                        // shorter than k — untouched
    ).toDF("doc_id", "text")
    val out = Dedup.exactSubstringSpans(df, "doc_id", "text", k = 4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_spans") === 0L)
    assert(out(2L).getAs[String]("spans") === "1:5")
    assert(out(2L).getAs[Long]("dup_tokens") === 4L)
    assert(out(3L).getAs[String]("spans") === "0:6") // 3 flagged grams merge
    assert(out(3L).getAs[Long]("dup_tokens") === 6L)
    assert(out(4L).getAs[String]("spans") === "5:9") // keep-first is intra-doc too
    assert(out(5L).getAs[Long]("n_spans") === 0L)
    assert(out(5L).getAs[Long]("n_tokens") === 3L)
    // hashKey form (the production shuffle shape) agrees exactly
    val hashed = Dedup.exactSubstringSpans(df, "doc_id", "text", k = 4, hashKey = true)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("spans")).toMap
    assert(hashed === out.view.mapValues(_.getAs[String]("spans")).toMap)
  }

  test("exactSubstringSpansIncremental: batch admission equals the full pipeline on the union") {
    import spark.implicits._
    val snapshot = docs.where($"doc_id" % 5 =!= 4).select($"doc_id", $"text")
    val batch = docs.where($"doc_id" % 5 === 4)
      .select(($"doc_id" + 100000L).as("doc_id"), $"text")
      .unionByName(docs.where($"doc_id" % 10 === 0)
        .select(($"doc_id" + 200000L).as("doc_id"),
          concat(lit("xdupsalt "), $"text").as("text")))
    for (hashKey <- Seq(false, true)) {
      val index = Dedup.substringGramIndex(snapshot, "doc_id", "text", k = 10, hashKey)
      val admit = Dedup
        .exactSubstringSpansIncremental(index, batch, "doc_id", "text", k = 10, hashKey)
        .select("doc_id", "n_tokens", "n_spans", "dup_tokens", "spans")
        .collect().map(r => r.getLong(0) -> r.toSeq).toMap
      val full = Dedup
        .exactSubstringSpans(snapshot.unionByName(batch), "doc_id", "text", k = 10, hashKey)
        .where($"doc_id" >= 100000L)
        .select("doc_id", "n_tokens", "n_spans", "dup_tokens", "spans")
        .collect().map(r => r.getLong(0) -> r.toSeq).toMap
      assert(admit === full, s"hashKey=$hashKey")
      // the planted salt-prefixed copies must be near-fully duplicated
      assert(admit.collect {
        case (id, row) if id >= 200000L => row(3).asInstanceOf[Long]
      }.forall(_ > 0), "planted copies must carry removable spans")
    }
  }

  test("stripSpans applies the spans positionally and passes span-free docs through") {
    import spark.implicits._
    val df = Seq(
      1L -> "w1 w2 w3 w4 w5 w6",
      2L -> "z w3 w4 w5 w6 q",
      3L -> "w1 w2 w3 w4 w5 w6",
      4L -> "r1 r2 r3 r4 x r1 r2 r3 r4",
      5L -> "a b c"
    ).toDF("doc_id", "text")
    val spans = Dedup.exactSubstringSpans(df, "doc_id", "text", k = 4).select("doc_id", "spans")
    val out = Dedup.stripSpans(df, "doc_id", "text", spans)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("stripped_text") === "w1 w2 w3 w4 w5 w6")
    assert(out(2L).getAs[String]("stripped_text") === "z q")
    assert(out(2L).getAs[Long]("kept_tokens") === 2L)
    assert(out(3L).getAs[String]("stripped_text") === "") // full copy stripped whole
    assert(out(3L).getAs[Long]("kept_tokens") === 0L)
    assert(out(4L).getAs[String]("stripped_text") === "r1 r2 r3 r4 x")
    assert(out(5L).getAs[String]("stripped_text") === "a b c")
    assert(out.values.forall(r =>
      r.getAs[Long]("kept_tokens") <= r.getAs[Long]("n_tokens")))
    // multi-span doc: two separated spans strip independently, numeric
    // span order (10:14 after 2:6) applies correctly past one digit
    val multi = Seq(6L -> "k0 d1 d2 d3 d4 k1 k2 k3 k4 k5 d1 d2 d3 d4 k6").toDF("doc_id", "text")
    val ms = Seq((6L, "1:5,10:14")).toDF("doc_id", "spans")
    val mo = Dedup.stripSpans(multi, "doc_id", "text", ms).collect().head
    assert(mo.getAs[String]("stripped_text") === "k0 k1 k2 k3 k4 k5 k6")
  }

  test("semanticDedup drops every planted copy into its source's cell, keeps sources") {
    // SemDeDup recall on planted structure: a ×1.05 first-component copy
    // sits at cos ≥ 0.9997 of its source, so whenever both land in the
    // same nearest-seed cell (they must — their seed cosines are nearly
    // identical and organic seed gaps dwarf the perturbation) the
    // keep-lowest-id prune drops exactly the copy
    val copies = embs.where($"vec_id" % 5 === 0).select(
      ($"vec_id" + 1000000L).as("vec_id"),
      concat(
        array(element_at($"embedding", 1) * lit(1.05f)),
        slice($"embedding", 2, 63)).as("embedding"))
    val corpus = embs.select("vec_id", "embedding").unionByName(copies)
    val out = Dedup.semanticDedup(corpus, "vec_id", "embedding", numClusters = 16, threshold = 0.9)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    val copyIds = copies.select("vec_id").as[Long].collect()
    assert(copyIds.nonEmpty)
    // the exact contract: a copy is dropped IFF it shares its source's
    // cell (cell-straddling pairs are SemDeDup's documented recall trade —
    // the perturbation can flip the argmax when a source's top-two seed
    // cosines are close); sources are never dropped (no higher-priority
    // match exists for them at τ = 0.9)
    val sameCell = copyIds.filter(c =>
      out(c).getAs[Long]("cluster") == out(c - 1000000L).getAs[Long]("cluster"))
    copyIds.foreach { c =>
      assert(out(c).getAs[Boolean]("kept") === !sameCell.contains(c),
        s"copy $c: kept must equal cell-straddling")
      assert(out(c - 1000000L).getAs[Boolean]("kept"), s"source of $c should be kept")
    }
    // near-dup copies overwhelmingly follow their source's cell — pin the
    // recall floor so a geometry regression can't silently zero it out
    assert(sameCell.length >= copyIds.length * 8 / 10,
      s"only ${sameCell.length}/${copyIds.length} copies kept their source's cell")
    // organic corpus (max pair cos ≈ 0.6) survives untouched at τ = 0.9
    assert(out.count(!_._2.getAs[Boolean]("kept")) === sameCell.length)
  }

  test("semanticDedup: join-form fallback is bit-identical to the group pass; null vectors are kept, never priors") {
    val copies = embs.where($"vec_id" % 5 === 0).select(
      ($"vec_id" + 1000000L).as("vec_id"),
      concat(
        array(element_at($"embedding", 1) * lit(1.05f)),
        slice($"embedding", 2, 63)).as("embedding"))
    val corpus = embs.select("vec_id", "embedding").unionByName(copies)
    def asMap(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("cluster"), r.getAs[Boolean]("kept"))).toMap
    // maxGroupRows = 0 forces the spillable self-join path (the
    // oversized-cell degradation); its per-item drop rule and cosine
    // (the CosineSimilarity expression itself) must match the group
    // pass row for row
    val grp = asMap(Dedup.semanticDedup(corpus, "vec_id", "embedding", 16, 0.9))
    val joinForm = asMap(Dedup.semanticDedupImpl(corpus, "vec_id", "embedding", 16, 0.9, 0L))
    assert(grp === joinForm)
    // a null vector must come back kept (null cosine never crosses the
    // threshold) and must not change any other row's fate — the group
    // pass dereferences vectors, so this pins the null routing
    val withNull = corpus.unionByName(
      Seq(9000000L).toDF("vec_id")
        .select($"vec_id", lit(null).cast("array<float>").as("embedding")))
    val out = asMap(Dedup.semanticDedup(withNull, "vec_id", "embedding", 16, 0.9))
    assert(out(9000000L)._2 === true)
    assert(out.view.filterKeys(_ != 9000000L).toMap === grp)
  }

  test("semanticAdmit: batch admission equals full-corpus semanticDedup on the union") {
    import spark.implicits._
    val e = embs.select("vec_id", "embedding")
    val copies = embs.where($"vec_id" % 5 === 0).select(
      ($"vec_id" + 1000000L).as("vec_id"),
      concat(
        array(element_at($"embedding", 1) * lit(1.05f)),
        slice($"embedding", lit(2), size($"embedding") - 1)).as("embedding"))
    val negs = embs.where($"vec_id" % 7 === 3).select(
      ($"vec_id" + 3000000L).as("vec_id"),
      transform($"embedding", x => -x).as("embedding"))
    val batch = copies.unionByName(negs)
    val k = 16
    // the O(batch) admission path
    val index = Dedup.semanticIndex(e, "vec_id", "embedding", k)
    val admit = Dedup.semanticAdmit(index, batch, "vec_id", "embedding", k, 0.9)
      .select($"id", ($"status" === "new").as("kept"))
      .as[(Long, Boolean)].collect().toMap
    // the from-scratch path over the union
    val full = Dedup.semanticDedup(e.unionByName(batch), "vec_id", "embedding", k, 0.9)
      .where($"id" >= 1000000L)
      .select($"id", $"kept").as[(Long, Boolean)].collect().toMap
    assert(admit.keySet === full.keySet)
    val diff = admit.keySet.filter(id => admit(id) != full(id))
    assert(diff.isEmpty, s"admission diverges from full dedup at ${diff.take(5)}")
    // and the batch really carries both fates
    assert(admit.values.exists(identity) && admit.values.exists(!_))
  }

  test("semanticAdmitStored: the persisted artifact validates K — a mismatch throws, a match equals the in-memory form") {
    import spark.implicits._
    val e = embs.select("vec_id", "embedding")
    val batch = embs.where($"vec_id" % 5 === 0).select(
      ($"vec_id" + 1000000L).as("vec_id"),
      concat(
        array(element_at($"embedding", 1) * lit(1.05f)),
        slice($"embedding", lit(2), size($"embedding") - 1)).as("embedding"))
    val k = 16
    val index = Dedup.semanticIndex(e, "vec_id", "embedding", k)
    val seeds = Dedup.semanticSeeds(e, "vec_id", "embedding", k)
    val dir = tempDir("semart")
    Dedup.writeSemanticIndex(index, seeds, dir)
    assert(Dedup.semanticIndexK(spark, dir) === k)
    // matching K (and the trust-the-artifact None form) reproduce the
    // in-memory stored-seed admission exactly
    val mem = Dedup.semanticAdmit(index, seeds, batch, "vec_id", "embedding", 0.9)
      .as[(Long, Long, String)].collect().toSet
    val stored = Dedup
      .semanticAdmitStored(spark, dir, batch, "vec_id", "embedding", 0.9, Some(k))
      .as[(Long, Long, String)].collect().toSet
    assert(stored === mem)
    val trusted = Dedup
      .semanticAdmitStored(spark, dir, batch, "vec_id", "embedding", 0.9)
      .as[(Long, Long, String)].collect().toSet
    assert(trusted === mem)
    // a mismatched K throws instead of probing wrong cells silently
    val ex = intercept[IllegalArgumentException] {
      Dedup.semanticAdmitStored(spark, dir, batch, "vec_id", "embedding", 0.9, Some(k / 2))
    }
    assert(ex.getMessage.contains(s"K=$k") && ex.getMessage.contains(s"K=${k / 2}"))
    // an unstamped directory is refused outright
    val bare = tempDir("semartbare")
    index.write.mode("overwrite").parquet(s"$bare/index")
    val ex2 = intercept[IllegalArgumentException] {
      Dedup.semanticAdmitStored(spark, bare, batch, "vec_id", "embedding", 0.9)
    }
    assert(ex2.getMessage.contains("marker"))
  }

  test("semanticContamination flags planted embedding leaks and clears negated vectors") {
    import spark.implicits._
    val e = embs.select("vec_id", "embedding")
    val train = e.where($"vec_id" % 3 =!= 0)
    // planted leaks: perturbed copies of train vectors (must flag);
    // negated vectors: semantically novel (must clear — background cos
    // flips sign, nothing in train comes near 0.9)
    val leaks = train.where($"vec_id" % 5 === 0).select(
      ($"vec_id" + 1000000L).as("vec_id"),
      concat(
        array(element_at($"embedding", 1) * lit(1.05f)),
        slice($"embedding", lit(2), size($"embedding") - 1)).as("embedding"))
    val clean = train.where($"vec_id" % 5 === 1).select(
      ($"vec_id" + 2000000L).as("vec_id"),
      transform($"embedding", x => -x).as("embedding"))
    val idx = Dedup.semanticIndex(train, "vec_id", "embedding", 16)
    val out = Dedup.semanticContamination(
        idx, leaks.unionByName(clean), "vec_id", "embedding", 16, 0.9)
      .select($"id", $"contaminated").as[(Long, Boolean)].collect().toMap
    val leakIds = leaks.select("vec_id").as[Long].collect().toSet
    val cleanIds = clean.select("vec_id").as[Long].collect().toSet
    // cell-approximation trade: a leak assigned off its source's cell is
    // missed — pin a high floor rather than exactness (the semanticDedup
    // recall idiom), and pin zero false positives on the negated side
    val flagged = leakIds.count(out(_))
    assert(flagged.toDouble / leakIds.size >= 0.8,
      s"leak recall ${flagged}/${leakIds.size} below the 0.8 floor")
    assert(cleanIds.forall(!out(_)), "a negated vector was falsely flagged")
  }

  test("embeddingLshCandidates is the pair functions' candidate stage") {
    // the stress harness prices candidate generation separately through
    // this API — it must be the SAME stage the pair function verifies
    // from: every verified pair is a candidate, and the adaptive
    // geometry is the documented three-rung ladder
    val cand = Dedup.embeddingLshCandidates(embs, "vec_id", "embedding")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val verified = Dedup.embeddingNearDupPairsLsh(embs, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(verified.subsetOf(cand),
      s"verified pairs must come from the candidate stage; extra=${(verified -- cand).take(3)}")
    assert(Dedup.lshGeometry(Dedup.LshBandingCutover) === ((8, 8)))
    assert(Dedup.lshGeometry(Dedup.LshBandingCutover + 1) === ((32, 16)))
    assert(Dedup.lshGeometry(Dedup.LshWideBandCutover) === ((32, 16)))
    assert(Dedup.lshGeometry(Dedup.LshWideBandCutover + 1) === ((64, 20)))
    assert(Dedup.lshGeometry(Dedup.LshUltraWideBandCutover) === ((64, 20)))
    assert(Dedup.lshGeometry(Dedup.LshUltraWideBandCutover + 1) === ((128, 24)))
  }

  test("custom functions are callable from SQL text") {
    embs.limit(50).createOrReplaceTempView("sql_embs")
    val viaSql = spark.sql(
      """SELECT a.vec_id, cosine_similarity(a.embedding, b.embedding) AS c,
        |       dot_product(a.embedding, b.embedding) AS d
        |FROM sql_embs a JOIN sql_embs b ON b.vec_id = a.vec_id + 1
        |ORDER BY a.vec_id LIMIT 5""".stripMargin).collect()
    assert(viaSql.length == 5)
    assert(viaSql.forall(r => !r.isNullAt(1) && !r.isNullAt(2)))
    val sh = spark.sql(
      "SELECT word_shingles('a b c d e f', 5) AS s").head().getSeq[String](0)
    assert(sh == Seq("a b c d e", "b c d e f"))
    val agg = spark.sql(
      """SELECT simhash_agg(s) AS h, minhash_agg(s, 16) AS m
        |FROM (SELECT explode(word_shingles('a b c d e f g h', 3)) AS s)""".stripMargin).head()
    assert(!agg.isNullAt(0) && agg.getSeq[Long](1).length == 16)
  }

  test("native one-pass sketch expressions match their Column-form definitions bit for bit") {
    import graft.functions.GraftFunctions
    // a texts fixture with the nasty corners: multi-space runs, tabs,
    // leading/trailing ws, short texts (< k / < w words), empty, and a
    // real document
    val texts = Seq(
      "alpha bravo charlie delta echo foxtrot golf hotel india juliet",
      "  one   two\tthree  ",
      "single",
      "",
      "   ",
      // edge NON-SPACE whitespace: trim strips spaces only, so split
      // emits empty edge tokens — the byte scan must reproduce them
      "alpha bravo charlie delta\n",
      "\talpha bravo charlie delta",
      "\talpha bravo charlie delta echo\n",
      "a b\n",
      "\ta b",
      "\n",
      "\n\t\n",
      " \r\nalpha bravo \r\n",
      docs.select("text").head().getString(0)
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    // word_gram_hashes ≡ xxhash64(concat_ws(slice(split)))) per position
    val k = 3
    val ws = split(trim($"text"), "\\s+")
    val colForm = when(size(ws) >= k,
      transform(sequence(lit(0), size(ws) - k),
        i => xxhash64(concat_ws(" ", slice(ws, i + 1, lit(k))))))
      .otherwise(array().cast("array<bigint>"))
    val gramRows = texts.select(
      GraftFunctions.word_gram_hashes($"text", k).as("native"), colForm.as("col"))
      .collect()
    gramRows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1), s"gram hash divergence: $r")
    }
    // winnowed_fingerprints ≡ the staged window-min selection (xxhash64)
    val w = 4; val win = 3
    val hs = transform(sequence(lit(0), greatest(size(ws) - w, lit(0))),
      i => xxhash64(concat_ws(" ", slice(ws, i + 1, lit(w)))))
    val stagedFps = array_distinct(transform(
      sequence(lit(0), greatest(size(hs) - win, lit(0))),
      i => array_min(slice(hs, i + 1, lit(win)))))
    val winRows = texts.select(
      GraftFunctions.winnowed_fingerprints($"text", w, win).as("native"),
      stagedFps.as("col")).collect()
    winRows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1), s"winnow fp divergence: $r")
    }
    // simhash_shingles ≡ simhash_agg over the exploded shingle array
    val sh = docs.limit(50).select($"doc_id",
      GraftFunctions.word_shingles($"text", 5).as("shingles"))
    val viaScalar = sh.select($"doc_id", GraftFunctions.simhash_shingles($"shingles").as("h"))
      .as[(Long, Long)].collect().toMap
    val viaAgg = sh.select($"doc_id", explode($"shingles").as("s"))
      .groupBy("doc_id").agg(GraftFunctions.simhash_agg($"s").as("h"))
      .as[(Long, Long)].collect().toMap
    assert(viaScalar === viaAgg)
    // minhash_shingles: deliberately a DIFFERENT family than minhash_agg
    // (one strong hash + derived mixes) — pin shape + the MinHash
    // identical-set property instead of value equality
    val m = sh.select(GraftFunctions.minhash_shingles($"shingles", 16).as("m")).head().getSeq[Long](0)
    assert(m.length === 16)
    val dup = sh.limit(1)
    val two = dup.unionByName(dup)
      .select(GraftFunctions.minhash_shingles($"shingles", 16).as("m"))
      .collect().map(_.getSeq[Long](0))
    assert(two(0) === two(1))
  }

  test("sketch/gram/winnow kernels run inside whole-stage codegen, not as fallback") {
    import graft.functions.GraftFunctions
    import org.apache.spark.sql.execution.debug._
    // these kernels sit in the engine's hottest scans (every sketch pass,
    // every per-trigger probe): a CodegenFallback would pay a virtual
    // interpreted eval per row and break the enclosing projection's
    // whole-stage span, so pin that the generated code calls the static
    // kernels directly
    // no limit() here — CollectLimit hoists the projection out of the
    // whole-stage span, which would void the assertion
    val df = docs.select(
      GraftFunctions.word_gram_hashes($"text", 10).as("g"),
      GraftFunctions.winnowed_fingerprints($"text", 5, 4).as("f"),
      GraftFunctions.top_shingle_count($"text", 3).as("t"))
    val planStr = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(planStr).isDefined,
      s"the kernel projection is not whole-stage-codegen'd:\n$planStr")
    val gen = df.queryExecution.debug.codegenToSeq().map(_._2).mkString("\n")
    assert(gen.contains("TextKernels.wordGramHashes"), "word_gram_hashes fell out of codegen")
    assert(gen.contains("TextKernels.winnowedFingerprints"), "winnowed_fingerprints fell out of codegen")
    assert(gen.contains("TextKernels.topShingleCount"), "top_shingle_count fell out of codegen")
    assert(df.where(size($"f") > 0).count() > 0) // and the generated code actually executes
    // the array-consuming sketch kernels are asserted over word_shingles'
    // MATERIALIZED output — the production shape: shingled()/the sketch
    // entry points keep the shingle projection its own operator below the
    // signature projection. word_shingles itself is DELIBERATELY
    // CodegenFallback (see its scaladoc — the fused explode-span form
    // measured consistently slower), so it must stay OUT of the span
    // while the kernels above it stay IN.
    val shingledDf = docs
      .select($"doc_id", GraftFunctions.word_shingles($"text", 5).as("shingles"))
      .where(size($"shingles") > 0)
    val df2 = shingledDf.select(
      GraftFunctions.minhash_shingles($"shingles", 16).as("m"),
      GraftFunctions.simhash_shingles($"shingles").as("s"),
      GraftFunctions.hashed_array($"shingles").as("h"))
    val plan2 = df2.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan2).isDefined,
      s"the sketch projection is not whole-stage-codegen'd:\n$plan2")
    val gen2 = df2.queryExecution.debug.codegenToSeq().map(_._2).mkString("\n")
    assert(gen2.contains("SketchKernels.minhashShingles"), "minhash_shingles fell out of codegen")
    assert(gen2.contains("SketchKernels.simhashShingles"), "simhash_shingles fell out of codegen")
    assert(gen2.contains("TextKernels.hashedArray"), "hashed_array fell out of codegen")
    assert(!gen2.contains("TextKernels.wordShingles"),
      "word_shingles must stay OUT of whole-stage codegen — its deliberate " +
        "CodegenFallback is what splits the shingle scan from the explode/sketch spans")
    assert(df2.where(size($"m") > 0).count() > 0)
  }

  test("winnowing fingerprints are stable and shrink with window size") {
    val text = lit("alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi")
    val row = spark.range(1).select(
      TextOps.winnowingFingerprints(text, 5, 4).as("w4"),
      TextOps.winnowingFingerprints(text, 5, 2).as("w2")
    ).head()
    val w4 = row.getSeq[Long](0); val w2 = row.getSeq[Long](1)
    assert(w4.nonEmpty && w2.nonEmpty && w4.size <= w2.size)
    assert(w4.toSet.subsetOf(w2.toSet)) // larger window selects a subset of mins
  }

  test("cosine_similarity expression: known values and codegen/eval agreement") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 1.0f), Array(1.0f, 1.0f)),
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f))
    ).toDF("a", "b")
    val got = df.select(graft.functions.GraftFunctions.cosine_similarity($"a", $"b")).as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1)) < 1e-12)
    assert(math.abs(got(2) - 1.0) < 1e-12)
    assert(got(3) == 0.0) // zero-norm convention
  }

  test("duplicateComponents computes the transitive closure with min-id representatives") {
    // chain 1-2-3-4 (diameter 3 — forces multiple propagation rounds)
    // plus a disjoint pair 10-11
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val comps = Dedup.duplicateComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("keepBestPerCluster keeps the max-score doc, breaks ties to min id, retains singletons") {
    // cluster {1,2,3}: scores 5, 9, 9 — 2 and 3 tie on score, 2 wins on id;
    // cluster {10,11}: null score loses to any non-null; 20 is a singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val scored = Seq(
      (1L, Some(5L)), (2L, Some(9L)), (3L, Some(9L)),
      (10L, None), (11L, Some(1L)), (20L, None)
    ).toDF("doc_id", "score")
    val got = Dedup.keepBestPerCluster(scored, pairs, "doc_id", "score")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got === Set(
      (1L, 1L, false), (2L, 1L, true), (3L, 1L, false),
      (10L, 10L, false), (11L, 10L, true),
      (20L, 20L, true)))
    // exactly one kept per canonical, and pair ids absent from the corpus
    // (no score to compete with) don't appear in the annotation
    val partial = Dedup.keepBestPerCluster(
      scored.where($"doc_id" =!= 2L), pairs, "doc_id", "score")
      .as[(Long, Long, Boolean)].collect()
    assert(partial.count(r => r._2 == 1L && r._3) === 1)
    assert(partial.filter(r => r._2 == 1L && r._3).map(_._1).toSeq === Seq(3L))
    assert(!partial.exists(_._1 == 2L))
  }

  test("hashSplit is deterministic, salt-sensitive, and tracks its fractions") {
    val split = TextOps.hashSplit($"doc_id", "graft", 0.9, 0.05)
    val counts = docs.select(split.as("split")).groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"), counts.toString)
    val n = counts.values.sum.toDouble
    assert(counts("train") / n > 0.8 && counts("train") / n < 0.97, counts.toString)
    // deterministic: two evaluations agree row for row
    val a = docs.select($"doc_id", split.as("s1"))
    val b = docs.select($"doc_id", TextOps.hashSplit($"doc_id", "graft", 0.9, 0.05).as("s2"))
    assert(a.join(b, "doc_id").where($"s1" =!= $"s2").isEmpty)
    // a different salt draws an independent split
    val rotated = docs.select($"doc_id", TextOps.hashSplit($"doc_id", "v2", 0.9, 0.05).as("s2"))
    assert(a.join(rotated, "doc_id").where($"s1" =!= $"s2").count() > 0)
  }

  test("duplicateComponents throws rather than returning a silent non-fixpoint") {
    // chain 1-2-3-4-5: diameter 4, so maxIter=1 (one join round after the
    // seeded neighborhood-min) cannot reach the fixpoint — the library must
    // refuse to return mid-propagation labels
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("id_a", "id_b")
    // the budget only governs the DISTRIBUTED loop — the adaptive local
    // union-find path (which this tiny graph takes by default) has no
    // iteration budget to exhaust
    intercept[IllegalStateException] {
      Dedup.duplicateComponents(pairs, maxIter = 1, localThreshold = 0L).collect()
    }
    // and the same chain converges with the default budget on BOTH paths
    val comps = Dedup.duplicateComponents(pairs).as[(Long, Long)].collect().toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
    val compsDist = Dedup.duplicateComponents(pairs, localThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(compsDist == comps)
  }

  test("hashKeep is deterministic, rate-tracking, and salt-independent") {
    val keep = TextOps.hashKeep($"doc_id", "strat", 0.25)
    val n = docs.count().toDouble
    val kept = docs.where(keep).count().toDouble
    assert(kept / n > 0.05 && kept / n < 0.5, s"kept=$kept of $n at rate 0.25")
    // deterministic across evaluations
    assert(docs.where(keep).select("doc_id").exceptAll(docs.where(keep).select("doc_id")).isEmpty)
    // frac >= 1 keeps everything; frac = 0 keeps nothing
    assert(docs.where(TextOps.hashKeep($"doc_id", "s", 1.0)).count() == n.toLong)
    assert(docs.where(TextOps.hashKeep($"doc_id", "s", 0.0)).count() == 0)
    // a different salt draws a (near-)independent sample
    val other = docs.where(TextOps.hashKeep($"doc_id", "other", 0.25)).select("doc_id")
    assert(other.exceptAll(docs.where(keep).select("doc_id")).count() > 0)
  }

  test("stratified sample keeps non-downsampled strata whole") {
    val sampled = docs.where(
      when($"lang" === "en", TextOps.hashKeep($"doc_id", "strat", 0.25))
        .when($"lang" === "fr", TextOps.hashKeep($"doc_id", "strat", 0.5))
        .otherwise(lit(true)))
    val restBefore = docs.where(!$"lang".isin("en", "fr")).count()
    val restAfter = sampled.where(!$"lang".isin("en", "fr")).count()
    assert(restBefore == restAfter)
    assert(sampled.where($"lang" === "en").count() < docs.where($"lang" === "en").count())
  }

  test("vocab top-k matches a local recomputation") {
    val topk = docs
      .select(explode(split(lower(trim($"text")), "\\s+")).as("token"))
      .where($"token" =!= "")
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"token".asc).limit(10)
      .as[(String, Long)].collect().toSeq
    val local = docs.select($"text").as[String].collect()
      .flatMap(t => t.trim.toLowerCase.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (tok, n) => (-n, tok) }.take(10)
    assert(topk == local)
  }

  test("exact percentile matches manual linear interpolation") {
    val vals = Seq(1.0, 3.0, 4.0, 10.0)
    val df = vals.toDF("v")
    val got = df.agg(expr("percentile(v, 0.5)"), expr("percentile(v, 0.75)"))
      .as[(Double, Double)].head()
    // p at rank p*(n-1): 0.5*3 = 1.5 -> 3 + 0.5*(4-3) = 3.5; 0.75*3 = 2.25 -> 4 + 0.25*6 = 5.5
    assert(got == ((3.5, 5.5)), got.toString)
  }

  test("fixture caches reject a dir built from different inputs") {
    // image cache: built for the sf0.001 documents, then asked for a
    // different documents table — must regenerate inline, not serve the
    // stale fixture
    val imgDir = tempDir("graft_imgcache")
    Multimodal.materializeImageCache(spark, docs, imgDir)
    try {
      assert(Multimodal.cachedSyntheticImages(spark, docs).count() == docs.count())
      val otherDir = sfDir("sf0.01")
      requireFixture(otherDir)
      val otherDocs = Tables.load(spark, otherDir, "documents")
      assert(Multimodal.cachedSyntheticImages(spark, otherDocs).count() == otherDocs.count())
    } finally spark.conf.unset(Multimodal.ImageCacheConfKey)
    // video cache: same rejection contract as the image cache
    val vidDir = tempDir("graft_vidcache")
    Multimodal.materializeVideoCache(spark, docs, vidDir)
    try {
      assert(Multimodal.cachedSyntheticVideo(spark, docs).count() == docs.count())
      val otherDir = sfDir("sf0.01")
      requireFixture(otherDir)
      val otherDocs = Tables.load(spark, otherDir, "documents")
      assert(Multimodal.cachedSyntheticVideo(spark, otherDocs).count() == otherDocs.count())
    } finally spark.conf.unset(Multimodal.VideoCacheConfKey)
    // IVF cache: same corpus but a different centroid count must rebuild
    val ivfDir = tempDir("graft_ivfcache")
    Similarity.materializeIvfCache(spark, embs, "vec_id", "embedding", nCentroids = 4, ivfDir)
    try {
      val (_, cHit) = Similarity.cachedIvfIndex(embs, "vec_id", "embedding", nCentroids = 4)
      assert(cHit.count() == 4)
      val (_, cMiss) = Similarity.cachedIvfIndex(embs, "vec_id", "embedding", nCentroids = 8)
      assert(cMiss.count() == 8)
    } finally spark.conf.unset(Similarity.IvfCacheConfKey)
  }

  test("fixture caches never trust a dir for a non-file-backed corpus") {
    // two different in-memory corpora have the same (empty) inputFiles —
    // the cache must refuse to serve one's fixture for the other, so an
    // unfingerprintable build always regenerates inline
    val memA = Seq((1L, "alpha beta", 10L), (2L, "gamma delta", 11L))
      .toDF("doc_id", "text", "n_chars")
    val memB = Seq((1L, "alpha beta", 10L), (2L, "gamma delta", 11L), (3L, "epsilon", 7L))
      .toDF("doc_id", "text", "n_chars")
    val dir = tempDir("graft_memcache")
    Multimodal.materializeImageCache(spark, memA, dir)
    try {
      assert(Multimodal.cachedSyntheticImages(spark, memB).count() == 3,
        "stale 2-row fixture served for a different in-memory corpus")
      assert(Multimodal.cachedSyntheticImages(spark, memA).count() == 2)
    } finally spark.conf.unset(Multimodal.ImageCacheConfKey)
  }

  test("chunkDedupStats keeps first occurrences and scores later repeats as duplicates") {
    // 12 words = chunks of (10, 2). doc 2 repeats doc 1's first chunk as
    // its own first chunk; doc 3 is doc 1 verbatim (every chunk a repeat).
    val w10 = (1 to 10).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (1L, s"$w10 tail one"),
      (2L, s"$w10 other words"),
      (3L, s"$w10 tail one"),
      (4L, "fully distinct words that never repeat any earlier chunk")
    ).toDF("doc_id", "text")
    val out = Dedup.chunkDedupStats(d, "doc_id", "text", chunkWords = 10)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 2L, 2L, 0.0)), out(1L).toString) // both chunks first
    assert(out(2L) == ((2L, 2L, 1L, 0.5)), out(2L).toString) // first chunk repeats doc 1
    assert(out(3L) == ((3L, 2L, 0L, 1.0)), out(3L).toString) // verbatim copy: all repeats
    assert(out(4L)._3 == 1L && out(4L)._4 == 0.0, out(4L).toString)
  }

  test("chunkDedupStats hashed-key scale form matches the exact-string form") {
    def collect(hashKey: Boolean) =
      Dedup.chunkDedupStats(docs, "doc_id", "text", chunkWords = 10, hashKey = hashKey)
        .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(collect(hashKey = true) == collect(hashKey = false))
  }

  test("incrementalDedup classifies batch docs against the snapshot fingerprint index") {
    val snapshot = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely different snapshot content about query engines")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"), // fp in snapshot
      (11L, "fresh unseen batch document with novel wording here"),
      (12L, "fresh unseen batch document with novel wording here"), // dup of 11 within batch
      (13L, "another genuinely new document nothing resembles at all")
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(snapshot, batch, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out == Map(
      10L -> "dup_snapshot", 11L -> "new", 12L -> "dup_batch", 13L -> "new"), out.toString)
  }

  test("repetitionStats matches hand-computed word and bigram repetition") {
    val d = Seq(
      (1L, "a a a b"), // bigrams: "a a","a a","a b" -> top 2/3
      (2L, "only"),    // one word: no bigrams
      (3L, ""),        // empty: all zeros
      (4L, "x y x y x") // bigrams: "x y","y x","x y","y x" -> top 2/4
    ).toDF("doc_id", "text")
    val out = TextOps.repetitionStats(d, "doc_id", "text")
      .as[(Long, Int, Int, Double, Int, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 4, 2, 0.5, 2, 0.6667)), out(1L).toString)
    assert(out(2L) == ((2L, 1, 1, 0.0, 0, 0.0)), out(2L).toString)
    assert(out(3L) == ((3L, 0, 0, 0.0, 0, 0.0)), out(3L).toString)
    assert(out(4L) == ((4L, 5, 2, 0.6, 2, 0.5)), out(4L).toString)
  }

  test("unigramScores weights each doc by corpus token frequencies") {
    val d = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    // vocab: a=2, b=2, c=1. doc1 = (2+2+2)/3, doc2 = (2+1)/2
    val out = TextOps.unigramScores(d, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 3L, 6L, 2.0)), out(1L).toString)
    assert(out(2L) == ((2L, 2L, 3L, 1.5)), out(2L).toString)
  }

  test("mixToWeights hits the target mix at max volume, deterministically") {
    val rows = (0 until 300).map { i =>
      (i.toLong, if (i < 100) "A" else if (i < 200) "B" else "C")
    }
    val d = rows.toDF("doc_id", "source")
    // A worth 2x B; C unweighted -> dropped. T = min(100/2, 100/1) = 50:
    // A keeps 2*50/100 = 100% (the thr>=65536 keep-all branch), B keeps 50%.
    val out = TextOps.mixToWeights(d, "doc_id", "source", Map("A" -> 2.0, "B" -> 1.0), "t")
      .select($"doc_id", $"source").as[(Long, String)].collect()
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc.getOrElse("A", 0) == 100, s"A must be kept whole: $bySrc")
    assert(!bySrc.contains("C"), s"unweighted stratum must be dropped: $bySrc")
    val b = bySrc.getOrElse("B", 0)
    assert(b > 25 && b < 75, s"B should be thinned to ~50%: $bySrc")
    // deterministic: the same call yields the same rows; a different salt
    // draws an independent sample
    val again = TextOps.mixToWeights(d, "doc_id", "source", Map("A" -> 2.0, "B" -> 1.0), "t")
      .select($"doc_id", $"source").as[(Long, String)].collect()
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    val other = TextOps.mixToWeights(d, "doc_id", "source", Map("A" -> 2.0, "B" -> 1.0), "u")
      .select($"doc_id").as[Long].collect().toSet
    assert(other != out.map(_._1).toSet)
  }

  test("contamination flags an eval doc duplicated from train and clears an unrelated one") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight", "train"),
      (2L, "the quick brown fox jumps over the lazy dog tonight", "test"), // verbatim leak
      (3L, "completely unrelated words about distributed query engines here", "test"),
      (4L, "the quick brown fox jumps over seven silver fences easily", "val") // partial overlap
    ).toDF("doc_id", "text", "split")
    val out = TextOps.contamination(d, "doc_id", "text", "split", w = 5)
      .select($"id", $"n_shingles", $"n_contaminated", $"rate")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(2L)._4 == 1.0, s"verbatim duplicate must be fully contaminated: ${out(2L)}")
    assert(out(3L)._3 == 0L && out(3L)._4 == 0.0, s"unrelated doc must be clean: ${out(3L)}")
    assert(out(4L)._3 > 0L && out(4L)._4 < 1.0, s"partial overlap must be in (0,1): ${out(4L)}")
    // 10 words, w=5 -> 6 distinct shingles per full-length doc
    assert(out(2L)._2 == 6L, out(2L).toString)
  }

  test("contaminationBloom is bit-identical to the exact join on the fixture corpus") {
    // the bloom is a prefilter + exact confirm: false positives are weeded
    // by the confirm join, false negatives don't exist, so the two plans
    // must produce the same rows — on a real corpus, not just a toy
    val d = docs.withColumn("split",
      TextOps.hashSplit($"doc_id", "graft", trainFrac = 0.9, valFrac = 0.05))
    val exact = TextOps.contamination(d, "doc_id", "text", "split", w = 5)
      .as[(Long, String, Long, Long, Double)].collect().sortBy(_._1).toSeq
    val bloom = TextOps.contaminationBloom(d, "doc_id", "text", "split", w = 5)
      .as[(Long, String, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(bloom == exact)
    assert(exact.exists(_._4 > 0L) || exact.nonEmpty, "fixture should exercise both branches")
  }

  test("qualityBins matches a local percentile-threshold recomputation") {
    val got = TextOps.qualityBins(docs, "doc_id", "text", nBins = 10)
      .as[(Long, Double, Int)].collect().sortBy(_._1)
    val scores = got.map(_._2)
    // Spark `percentile`'s definition: linear interpolation at p*(n-1)
    val sorted = scores.sorted
    def pct(p: Double): Double = {
      val idx = p * (sorted.length - 1)
      val lo = idx.toInt
      val hi = math.min(lo + 1, sorted.length - 1)
      val v = sorted(lo) + (idx - lo) * (sorted(hi) - sorted(lo))
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val thresholds = (1 until 10).map(p => pct(p / 10.0))
    got.foreach { case (id, q, bin) =>
      assert(bin == thresholds.count(q >= _), s"doc $id: q=$q bin=$bin vs $thresholds")
    }
    // ties always share a bin (the ntile hazard this operator avoids)
    got.groupBy(_._2).values.foreach(g => assert(g.map(_._3).distinct.length == 1))
    assert(got.map(_._3).distinct.length > 1, "fixture should spread across bins")
  }

  test("contaminationBloom with an empty train split reports zero contamination") {
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "test"),
      (2L, "one two three four five six seven", "val")
    ).toDF("doc_id", "text", "split")
    val out = TextOps.contaminationBloom(d, "doc_id", "text", "split", w = 5)
      .select($"id", $"n_contaminated", $"rate").as[(Long, Long, Double)].collect()
    assert(out.length == 2 && out.forall(r => r._2 == 0L && r._3 == 0.0), out.mkString(","))
  }

  test("shardOffsets equals the single-partition window cumsum and splits shards correctly") {
    // parity: the distributed two-phase cumsum must equal the declarative
    // window form (which is only safe at test scale)
    import org.apache.spark.sql.expressions.Window
    val got = TextOps.shardOffsets(docs, "doc_id", "text", shardTokens = 64)
      .select($"doc_id", $"start_offset").as[(Long, Long)].collect().toMap
    val expect = docs
      .select($"doc_id".cast("long").as("doc_id"), TextOps.tokenCount($"text").cast("long").as("n"))
      .withColumn("start_offset",
        coalesce(sum($"n").over(Window.orderBy($"doc_id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"doc_id", $"start_offset").as[(Long, Long)].collect().toMap
    assert(got == expect)
    // shard spanning: a doc crossing a boundary reports every shard it touches
    val tiny = Seq((1L, "a b c"), (2L, "d e f g"), (3L, "")).toDF("doc_id", "text")
    val out = TextOps.shardOffsets(tiny, "doc_id", "text", shardTokens = 4)
      .select($"doc_id", $"n_tokens", $"start_offset", $"shard_id", $"n_shards")
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 3L, 0L, 0L, 1L)), out(1L).toString)   // tokens 0-2, shard 0
    assert(out(2L) == ((2L, 4L, 3L, 0L, 2L)), out(2L).toString)   // tokens 3-6, spans shards 0-1
    assert(out(3L) == ((3L, 0L, 7L, 1L, 0L)), out(3L).toString)   // empty doc: no shards
  }

  test("shardOffsets results stay correct when re-read after a later invocation") {
    // regression: the stamp pass must not depend on live caches a later
    // call could evict — results are materialized with lineage truncated
    // at call time, so re-evaluating the FIRST result after a SECOND call
    // (and after the first evaluation) cannot re-sample range boundaries
    val a = TextOps.shardOffsets(docs, "doc_id", "text", shardTokens = 64)
    val first = a.select($"doc_id", $"start_offset").as[(Long, Long)].collect().toMap
    TextOps.shardOffsets(docs.limit(100), "doc_id", "text", shardTokens = 32).count()
    val again = a.select($"doc_id", $"start_offset").as[(Long, Long)].collect().toMap
    assert(first == again)
    // and the values are the true cumsum (not just stable garbage)
    import org.apache.spark.sql.expressions.Window
    val expect = docs
      .select($"doc_id".cast("long").as("doc_id"), TextOps.tokenCount($"text").cast("long").as("n"))
      .withColumn("start_offset",
        coalesce(sum($"n").over(Window.orderBy($"doc_id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"doc_id", $"start_offset").as[(Long, Long)].collect().toMap
    assert(again == expect)
  }

  test("word expressions split on regex-\\s whitespace only, like the oracles") {
    // an em-space (U+2003) is NOT \s: regex split keeps "a a" as one
    // word, and the native tokenizers must agree — Character.isWhitespace
    // would split it and silently diverge from the SQL oracle
    graft.functions.GraftFunctions.register(spark)
    val t = "a\u2003a a\u2003a a\u2003a"
    val d = Seq((1L, t)).toDF("doc_id", "text")
    val out = TextOps.repetitionStats(d, "doc_id", "text")
      .as[(Long, Int, Int, Double, Int, Double)].head()
    assert(out == ((1L, 3, 1, 0.6667, 2, 1.0)), out.toString)
    val sh = d.select(graft.functions.GraftFunctions.word_shingles($"text", 2).as("s"))
      .as[Seq[String]].head()
    assert(sh == Seq("a\u2003a a\u2003a"), sh.toString)
  }

  test("splitting by dedup representative keeps near-duplicates on one side of the split") {
    // the leakage-free composition the hashSplit doc prescribes: key the
    // split by the duplicate-cluster representative, not the raw id
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 5, 0.4, 100L)
      .select("id_a", "id_b")
    val comps = Dedup.duplicateComponents(pairs).withColumnRenamed("id", "doc_id")
    val withSplit = docs.join(comps, Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"rep", $"doc_id").as("rep"))
      .withColumn("split", TextOps.hashSplit($"rep", "graft", 0.9, 0.05))
    val bySide = pairs
      .join(withSplit.select($"doc_id".as("id_a"), $"split".as("split_a")), Seq("id_a"))
      .join(withSplit.select($"doc_id".as("id_b"), $"split".as("split_b")), Seq("id_b"))
    assert(pairs.count() > 0)
    assert(bySide.where($"split_a" =!= $"split_b").isEmpty)
  }

  test("portable md5 fingerprint matches a driver-side MessageDigest recomputation") {
    val rows = docs.limit(20)
      .select($"doc_id", TextOps.fingerprintPortable($"text", 5).as("fp"),
        Dedup.wordShingles($"text", 5).as("shingles"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val expect = r.getSeq[String](2)
        .map(s => md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString)
        .min
      assert(r.getString(1) == expect, s"doc ${r.getLong(0)}")
    }
  }

  test("spec-derived XxHash64Ref matches Spark's XXH64 across lengths and seeds") {
    import graft.functions.XxHash64Ref
    // every tail-path combination: 0-byte, <4, exactly 4, 4-7, exactly 8,
    // 8-31 (no stripe), exactly 32, 32+tails, multi-stripe, plus
    // multi-byte UTF-8 — and a non-default seed
    val samples =
      (0 to 40).map(n => "a" * n) ++
        Seq("", "x", "abc", "abcd", "abcdefg", "abcdefgh",
          "the quick brown fox jumps over the lazy dog",
          "naïve café — 中文測試 🚀", "tab\tand\nnewline",
          ("lorem ipsum " * 50).trim)
    for (s <- samples; seed <- Seq(0L, 42L, -1L)) {
      val bytes = s.getBytes("UTF-8")
      val spark64 = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
          bytes.length, seed)
      assert(XxHash64Ref.hash(bytes, seed) == spark64,
        s"mismatch len=${bytes.length} seed=$seed input=${s.take(30)}")
    }
  }

  test("XxHash64Ref equals Spark XXH64 on 2000 seeded random inputs") {
    // property sweep (seeded, deterministic — the CdcReplaySpec idiom):
    // random lengths 0-200 hit every stripe/tail combination many times
    // over, random bytes rule out value-dependent divergence, random
    // seeds rule out seed-handling divergence
    import graft.functions.XxHash64Ref
    val rnd = new scala.util.Random(42)
    (0 until 2000).foreach { i =>
      val len = rnd.nextInt(200)
      val bytes = new Array[Byte](len)
      rnd.nextBytes(bytes)
      val seed = rnd.nextLong()
      val expect = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, seed)
      assert(XxHash64Ref.hash(bytes, seed) == expect, s"case $i len=$len seed=$seed")
    }
  }

  test("production fingerprint matches the independent XxHash64Ref expected table") {
    val expected = graft.queries.ExtensionQueries
      .expectedTables("x_text_fingerprint_prod")(spark, sf0001)
    val got = TextOps.fingerprints(docs, "doc_id", "text", 5)
      .select($"id".as("doc_id"), $"fp")
    assert(got.count() == expected.count() && got.count() > 0)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("fingerprint is stable under a tail edit (min-shingle-hash property)") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"
    val edited = base + " omega"
    val df = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val fps = TextOps.fingerprints(df, "doc_id", "text", 5)
      .select("fp").as[Long].collect()
    // min over shared prefix shingles usually survives a tail append; at
    // minimum the computation is deterministic
    val again = TextOps.fingerprints(df, "doc_id", "text", 5).select("fp").as[Long].collect()
    assert(fps.toSeq == again.toSeq)
  }

  test("stub codec resize keeps a deterministic prefix proportional to the area ratio") {
    val payload = (0 until 1000).map(_.toByte).toArray
    val half = Multimodal.FakeCodec.resize(payload, fromArea = 100L, toArea = 50L)
    assert(half.length == 500 && half.toSeq == payload.take(500).toSeq)
    val same = Multimodal.FakeCodec.resize(payload, fromArea = 100L, toArea = 100L)
    assert(same.length == 1000)
    val up = Multimodal.FakeCodec.resize(payload, fromArea = 100L, toArea = 200L)
    assert(up.length == 1000) // never exceeds the source
    assert(Multimodal.FakeCodec.resize(null, 100L, 50L) == null)
  }

  test("multimodal decode plumbing is deterministic and batch-shaped") {
    val media = Multimodal.syntheticMedia(spark, docs.limit(50))
    val f1 = Multimodal.extractFeatures(media).collect().map(m => (m.media_id, m.checksum, m.feature.toSeq))
    val f2 = Multimodal.extractFeatures(media).collect().map(m => (m.media_id, m.checksum, m.feature.toSeq))
    assert(f1.sortBy(_._1).toSeq == f2.sortBy(_._1).toSeq)
    assert(f1.forall(_._3.length == 8))
  }

  test("HLL approx_count_distinct stays within its rsd bound of the exact count") {
    val li = Tables.load(spark, sf0001, "lineitem")
    val rows = li.groupBy("l_returnflag")
      .agg(
        approx_count_distinct($"l_partkey", 0.01).as("approx"),
        countDistinct($"l_partkey").as("exact"))
      .select($"approx", $"exact").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (approx, exact) =>
      val relErr = math.abs(approx - exact).toDouble / exact
      // rsd 0.01 ⇒ one-sigma 1%; 5% is the five-sigma bound the gate query
      // publishes as within_5pct
      assert(relErr <= 0.05, s"HLL rel err $relErr (approx=$approx exact=$exact)")
    }
  }

  test("t-digest approx_percentile stays within its rank-error bound of the exact percentile") {
    val ev = Tables.load(spark, sf0001, "events")
    // rank-error contract: accuracy 10000 bounds the RANK error at
    // n/10000 (< 1 position on these groups), but the sketch returns an
    // actual element, not an interpolated value — so the right assertion
    // is bracketing: the approx p-quantile must lie between the exact
    // quantiles at p ± 2% rank
    val rows = ev.groupBy("event_type")
      .agg(
        expr("approx_percentile(value, array(0.5, 0.95), 10000)").as("approx"),
        expr("percentile(value, array(0.48, 0.52, 0.93, 0.97))").as("brackets"),
        count(lit(1)).as("n"))
      .select($"approx", $"brackets", $"n")
      .as[(Seq[Double], Seq[Double], Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (approx, br, n) =>
      assert(approx(0) >= br(0) && approx(0) <= br(1),
        s"p50 ${approx(0)} outside exact [${br(0)}, ${br(1)}] (n=$n)")
      assert(approx(1) >= br(2) && approx(1) <= br(3),
        s"p95 ${approx(1)} outside exact [${br(2)}, ${br(3)}] (n=$n)")
    }
  }

  test("Count-Min estimates never undercount and respect the ε·N overestimate bound") {
    val toks = docs
      .select(explode(split(lower(trim($"text")), "\\s+")).as("tok"))
      .where(length($"tok") > 0)
    val total = toks.count()
    val eps = 0.001
    val sk = toks.agg(expr(s"count_min_sketch(tok, ${eps}d, 0.99d, 42)"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(sk))
    val exact = toks.groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(exact.length > 10)
    exact.foreach { case (tok, n) =>
      val est = cms.estimateCount(tok)
      assert(est >= n, s"CMS undercounted '$tok': $est < $n")
      assert(est <= n + math.ceil(eps * total).toLong,
        s"CMS overcount for '$tok' beyond eps*N: $est > $n + ${eps * total}")
    }
  }

  test("space-saving bounds under eviction: no undercount, tracked overcount, n/k-heavies present") {
    import graft.functions.GraftFunctions
    // skewed deterministic stream, k=8 far below the 40 distinct items:
    // heavy items h0..h3 dominate, the t* tail forces constant eviction
    val stream = (0 until 4).flatMap(h => Seq.fill(200 + 100 * h)(s"h$h")) ++
      (0 until 36).flatMap(t => Seq.fill(6 + (t % 5))(s"t$t"))
    val n = stream.size.toLong
    val k = 8
    val exact = stream.groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
    val df = spark.createDataset(stream)(org.apache.spark.sql.Encoders.STRING)
      .toDF("item").repartition(4) // force real partial-summary merges
    val summary = df.agg(GraftFunctions.space_saving_agg($"item", k).as("ss"))
      .select(explode($"ss").as("e"))
      .select($"e.item", $"e.est", $"e.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(summary.length <= k, s"summary exceeded capacity: ${summary.length} > $k")
    summary.foreach { case (item, est, err) =>
      val truth = exact.getOrElse(item, 0L)
      assert(est >= truth, s"'$item' undercounted: est $est < true $truth")
      assert(est - err <= truth, s"'$item' bound broken: est-err ${est - err} > true $truth")
    }
    // any item with true frequency > n/k must be in the summary
    val kept = summary.map(_._1).toSet
    exact.filter(_._2 > n / k).keys.foreach { heavy =>
      assert(kept.contains(heavy), s"heavy hitter '$heavy' (>${n / k}) evicted")
    }
    // k ≥ distinct degenerates to exact counting with err = 0
    val exactSummary = df.agg(GraftFunctions.space_saving_agg($"item", 64).as("ss"))
      .select(explode($"ss").as("e"))
      .select($"e.item", $"e.est", $"e.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(exactSummary.length === exact.size)
    exactSummary.foreach { case (item, est, err) =>
      assert(est === exact(item) && err === 0L, s"k≥distinct must be exact: $item $est±$err")
    }
  }

  test("UDDSketch: γ-bucket error bound, rank walk, and exact merge-order independence") {
    import graft.functions.{GraftFunctions, UddSketch}
    val g = UddSketch.DefaultGamma
    val alpha = (g - 1) / (g + 1)
    // bucket midpoint is within α relative error across magnitudes + signs
    Seq(0.004, 0.7, 1.0, 3.14, 599.9, -0.02, -250.0).foreach { v =>
      val est = UddSketch.valueOf(UddSketch.bucketOf(v, g), g)
      assert(math.abs(est - v) <= alpha * math.abs(v) * 1.0001,
        s"bucket midpoint for $v drifted: $est")
    }
    // rank walk on a known mixed stream incl. zeros and negatives
    val vals = Seq.tabulate(200)(i => (i - 50).toDouble) // -50..149, one zero
    val zero = vals.count(_ == 0.0).toLong
    val m = vals.filter(_ != 0.0).groupBy(v => UddSketch.bucketOf(v, g))
      .map { case (b, xs) => b -> xs.size.toLong }
    Seq(0.05, 0.5, 0.95).foreach { p =>
      val est = UddSketch.quantile(zero, m, p, g).get
      val exact = vals.sorted.apply(math.max(1, math.ceil(p * vals.size).toInt) - 1)
      assert(math.abs(est - exact) <= alpha * math.abs(exact) + 1e-9,
        s"p=$p est=$est exact=$exact")
    }
    // distributed: merged state equals direct state EXACTLY (no collapse ⇒
    // merge-order independent), under forced multi-partition combines
    val df = spark.createDataset(vals)(org.apache.spark.sql.Encoders.scalaDouble)
      .toDF("v").repartition(7)
    val direct = df.agg(GraftFunctions.udd_quantile(GraftFunctions.udd_sketch_agg($"v"), 0.5))
      .head().getDouble(0)
    val twoLevel = df
      .withColumn("part", $"v" % 5)
      .groupBy("part").agg(GraftFunctions.udd_sketch_agg($"v").as("sk"))
      .agg(GraftFunctions.udd_quantile(GraftFunctions.udd_merge_agg($"sk"), 0.5))
      .head().getDouble(0)
    assert(direct === twoLevel, "two-level merge must reproduce the direct sketch exactly")
  }

  test("UDDSketch rank: inverse accessor brackets the exact rank, round-trips quantile") {
    import graft.functions.{GraftFunctions, UddSketch}
    val g = UddSketch.DefaultGamma
    val vals = Seq.tabulate(200)(i => (i - 50).toDouble) // -50..149, one zero
    val zero = vals.count(_ == 0.0).toLong
    val m = vals.filter(_ != 0.0).groupBy(v => UddSketch.bucketOf(v, g))
      .map { case (b, xs) => b -> xs.size.toLong }
    // estimate ≥ exact fraction (x's whole bucket is counted) and within
    // that bucket's mass of it — probes cover negatives, zero, positives
    Seq(-20.0, 0.0, 1.0, 10.0, 75.0, 149.0).foreach { x =>
      val est = UddSketch.rank(zero, m, x, g).get
      val exact = vals.count(_ <= x).toDouble / vals.size
      val bucketMass =
        if (x == 0.0) 0.0
        else m.getOrElse(UddSketch.bucketOf(x, g), 0L).toDouble / vals.size
      assert(est >= exact - 1e-12, s"rank($x)=$est must cover exact=$exact")
      assert(est - exact <= bucketMass + 1e-12,
        s"rank($x)=$est overshoots exact=$exact by more than its bucket mass")
    }
    // rank(quantile(p)) ≥ p structurally, via the registered expressions
    val df = spark.createDataset(vals)(org.apache.spark.sql.Encoders.scalaDouble).toDF("v")
    Seq(0.05, 0.5, 0.95).foreach { p =>
      val r = df
        .agg(GraftFunctions.udd_sketch_agg($"v").as("sk"))
        .select(GraftFunctions.udd_rank($"sk", GraftFunctions.udd_quantile($"sk", p)))
        .head().getDouble(0)
      assert(r >= p, s"rank(quantile($p)) = $r must cover p")
    }
    // empty sketch → null, not NaN
    val empty = df.where($"v" > 1e9)
      .agg(GraftFunctions.udd_sketch_agg($"v").as("sk"))
      .select(GraftFunctions.udd_rank($"sk", lit(5.0)))
      .head()
    assert(empty.isNullAt(0))
  }

  test("t-digest: rank-error bound incl. tails, bounded size, merge within bound, Spark partials round-trip") {
    import graft.functions.{GraftFunctions, TDigest}
    val delta = TDigest.DefaultCompression
    val n = 100000
    var s = 12345L
    val vals = Array.fill(n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 11).toDouble / (1L << 53).toDouble) * 1000.0
    }
    val sorted = vals.sorted
    def exactRank(x: Double): Double = {
      var i = java.util.Arrays.binarySearch(sorted, x)
      if (i < 0) i = -i - 1 else { while (i < n && sorted(i) <= x) i += 1 }
      i.toDouble / n
    }
    // the aggregate's update loop, deterministically: singleton centroids
    // compressed per BufferSize block
    def digestOf(xs: Seq[Double]): Array[(Double, Long)] = {
      var d = Array.empty[(Double, Long)]
      xs.grouped(TDigest.BufferSize).foreach { blk =>
        d = TDigest.compress(d ++ blk.map(v => (v, 1L)), delta)
      }
      d
    }
    val dg = digestOf(vals.toSeq)
    // size bounded by the scale function (≤ ~2δ centroids at any n) and
    // weight conserved exactly
    assert(dg.length <= 2 * delta.toInt + 2, s"digest size ${dg.length}")
    assert(dg.map(_._2).sum === n.toLong)
    // rank error within the k1 bound (worst ≈ π/δ ≈ 3.1% at the median;
    // 2% asserted — margin below the gate's 3%), across the q range
    for (p <- Seq(0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99)) {
      val err = math.abs(exactRank(TDigest.quantile(dg, p).get) - p)
      assert(err <= 0.02, s"p=$p rank error $err")
    }
    // tail accuracy is the t-digest's selling point: clusters shrink as
    // q(1−q), so the 1%/99% estimates sit ~an order tighter
    for (p <- Seq(0.01, 0.99)) {
      val err = math.abs(exactRank(TDigest.quantile(dg, p).get) - p)
      assert(err <= 0.004, s"tail p=$p rank error $err")
    }
    // merge: halves → concat → compress stays within the bound (order-
    // DEPENDENT within it — the structural contrast to UDDSketch's
    // bit-exact merge that the gate's booleans, not equality, pin)
    val mergedD = TDigest.compress(
      digestOf(vals.take(n / 2).toSeq) ++ digestOf(vals.drop(n / 2).toSeq), delta)
    for (p <- Seq(0.05, 0.5, 0.95)) {
      val err = math.abs(exactRank(TDigest.quantile(mergedD, p).get) - p)
      assert(err <= 0.02, s"merged p=$p rank error $err")
    }
    // registered expressions through real shuffle partials, both levels
    val df = spark.createDataset(vals.toSeq)(org.apache.spark.sql.Encoders.scalaDouble)
      .toDF("v").repartition(7)
    val direct = df
      .agg(GraftFunctions.tdigest_quantile(GraftFunctions.tdigest_agg($"v"), 0.5))
      .head().getDouble(0)
    assert(math.abs(exactRank(direct) - 0.5) <= 0.02, s"spark direct p50 $direct")
    val twoLevel = df
      .withColumn("part", floor($"v" / 100.0))
      .groupBy("part").agg(GraftFunctions.tdigest_agg($"v").as("sk"))
      .agg(GraftFunctions.tdigest_quantile(GraftFunctions.tdigest_merge_agg($"sk"), 0.5))
      .head().getDouble(0)
    assert(math.abs(exactRank(twoLevel) - 0.5) <= 0.02, s"spark two-level p50 $twoLevel")
    // empty input → null, not NaN
    val empty = df.where($"v" > 1e9)
      .agg(GraftFunctions.tdigest_quantile(GraftFunctions.tdigest_agg($"v"), 0.5)).head()
    assert(empty.isNullAt(0))
  }

  test("t-digest rank: CDF inverse bounds, exact quantile round-trip, edge clamps") {
    import graft.functions.{GraftFunctions, TDigest}
    val delta = TDigest.DefaultCompression
    val n = 100000
    var s = 98765L
    val vals = Array.fill(n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 11).toDouble / (1L << 53).toDouble) * 1000.0
    }
    val sorted = vals.sorted
    def exactFrac(x: Double): Double = sorted.count(_ <= x).toDouble / n
    def digestOf(xs: Seq[Double]): Array[(Double, Long)] = {
      var d = Array.empty[(Double, Long)]
      xs.grouped(TDigest.BufferSize).foreach { blk =>
        d = TDigest.compress(d ++ blk.map(v => (v, 1L)), delta)
      }
      d
    }
    val dg = digestOf(vals.toSeq)
    // rank tracks the exact CDF within the same k1 bound as quantile
    for (x <- Seq(10.0, 100.0, 250.0, 500.0, 750.0, 990.0)) {
      val err = math.abs(TDigest.rank(dg, x).get - exactFrac(x))
      assert(err <= 0.02, s"x=$x rank error $err")
    }
    // the two accessors are exact linear inverses between distinct means:
    // rank(quantile(p)) == p up to FP in the generic interior case
    for (p <- Seq(0.1, 0.25, 0.5, 0.75, 0.9)) {
      val rt = TDigest.rank(dg, TDigest.quantile(dg, p).get).get
      assert(math.abs(rt - p) <= 1e-9, s"roundtrip p=$p got $rt")
    }
    // edge clamps mirror quantile's extreme-mean clamps
    assert(TDigest.rank(dg, sorted(0) - 1.0).contains(0.0))
    assert(TDigest.rank(dg, sorted(n - 1) + 1.0).contains(1.0))
    assert(TDigest.rank(Array.empty[(Double, Long)], 1.0).isEmpty)
    // single-centroid digest: midpoint semantics
    assert(TDigest.rank(Array((5.0, 10L)), 5.0).contains(0.5))
    // registered expression: null sketch/probe → null, not NaN
    GraftFunctions.register(spark)
    val df = spark.createDataset(vals.take(1000).toSeq)(org.apache.spark.sql.Encoders.scalaDouble).toDF("v")
    val viaSql = df
      .agg(GraftFunctions.tdigest_rank(GraftFunctions.tdigest_agg($"v"), lit(500.0)))
      .head().getDouble(0)
    assert(math.abs(viaSql - vals.take(1000).count(_ <= 500.0) / 1000.0) <= 0.05)
  }

  test("PQ: codes are well-formed, ADC+rerank matches brute force on planted copies, compression is real") {
    graft.functions.GraftFunctions.register(spark)
    val m = 4
    val ksub = 16
    val cb = Similarity.pqCodebooks(embs, "vec_id", "embedding", m, ksub)
    assert(cb.count() === (m * ksub).toLong)
    val codes = Similarity.pqEncode(embs, cb, "vec_id", "embedding", m, ksub)
    val rows = codes.collect()
    assert(rows.length.toLong === embs.count())
    // every vector yields exactly m codes, each a valid codebook entry —
    // the compressed representation is m small ints per vector (the 100 TB
    // memory story), never a partial or out-of-range assignment
    rows.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length === m)
      assert(cs.forall(c => c >= 0 && c < ksub), s"codes out of range: $cs")
    }
    // encode is the per-subspace argmin: re-derive one row's codes on the
    // driver from the collected codebook and compare exactly
    val cbLocal = Array.fill(m, ksub)(Array.empty[Float])
    cb.collect().foreach(r => cbLocal(r.getInt(0))(r.getInt(1)) = r.getSeq[Float](2).toArray)
    val v0 = embs.orderBy("vec_id").select("embedding").head().getSeq[Float](0).toArray
    val dsub = v0.length / m
    val expect0 = (0 until m).map { sIdx =>
      (0 until ksub).minBy { c =>
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val diff = v0(sIdx * dsub + i).toDouble - cbLocal(sIdx)(c)(i).toDouble
          d += diff * diff
          i += 1
        }
        (d, c)
      }
    }
    val got0 = codes.orderBy("n_id").head().getSeq[Int](1)
    assert(got0 === expect0, "driver-side argmin re-derivation disagrees with the encode projection")
    // planted-copy retrieval: PQ candidates + exact rerank must agree with
    // brute force's rank-1 (the identity mapping) on every planted query
    val queries = embs.where($"vec_id" % 20 === 0).select(
      ($"vec_id" + 1000000L).as("vec_id"),
      concat(
        array(element_at($"embedding", 1) * lit(1.05f)),
        slice($"embedding", lit(2), size($"embedding") - 1)).as("embedding"))
    val pq = Similarity
      .pqTopK(codes, cb, embs, queries, "vec_id", "embedding", k = 1, m = m, ksub = ksub, candidates = 16)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toMap
    val brute = Similarity
      .bruteForceTopK(embs, queries, "vec_id", "embedding", k = 1)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toMap
    assert(pq === brute, "PQ+rerank disagrees with brute force on planted copies")
    assert(pq.forall { case (q, nId) => q - 1000000L === nId }, "planted mapping is not the identity")
  }

  test("pqCodebooks: sampled training (coded default path) agrees with full-corpus training on planted copies; sub-ksub subspaces pad") {
    graft.functions.GraftFunctions.register(spark)
    val m = 4
    val ksub = 16
    val n = embs.count()
    val cbFull = Similarity
      .pqCodebooks(embs, "vec_id", "embedding", m, ksub, maxTrainRows = Long.MaxValue)
    // force REAL sampling (a quarter of the corpus) — the 100 TB recipe
    val cbSampled = Similarity
      .pqCodebooks(embs, "vec_id", "embedding", m, ksub, maxTrainRows = math.max(1L, n / 4))
    assert(cbSampled.count() === (m * ksub).toLong)
    val queries = embs.where($"vec_id" % 20 === 0).select(
      ($"vec_id" + 1000000L).as("vec_id"),
      concat(
        array(element_at($"embedding", 1) * lit(1.05f)),
        slice($"embedding", lit(2), size($"embedding") - 1)).as("embedding"))
    val brute = Similarity.bruteForceTopK(embs, queries, "vec_id", "embedding", k = 1)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toMap
    def top1(cb: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
      val codes = Similarity.pqEncode(embs, cb, "vec_id", "embedding", m, ksub)
      Similarity
        .pqTopK(codes, cb, embs, queries, "vec_id", "embedding",
          k = 1, m = m, ksub = ksub, candidates = 16)
        .select($"q_id", $"n_id").as[(Long, Long)].collect().toMap
    }
    assert(top1(cbFull) === brute, "full-corpus codebooks lost planted copies")
    assert(top1(cbSampled) === brute, "sampled codebooks lost planted copies")
    // a corpus with fewer distinct subvectors than ksub pads the codebook
    // to rectangular instead of aborting at probe time
    val tiny = embs.where($"vec_id" < 8)
    val cbTiny = Similarity.pqCodebooks(tiny, "vec_id", "embedding", m, ksub)
    assert(cbTiny.count() === (m * ksub).toLong)
    assert(Similarity.pqEncode(tiny, cbTiny, "vec_id", "embedding", m, ksub).count()
      === tiny.count())
  }

  test("IVF-PQ: composed pruning still matches brute force on planted copies") {
    graft.functions.GraftFunctions.register(spark)
    val m = 4
    val ksub = 16
    val (indexed, centroids) = Similarity.ivfIndex(embs, "vec_id", "embedding", nCentroids = 16)
    val cb = Similarity.pqCodebooks(embs, "vec_id", "embedding", m, ksub)
    val codes = Similarity.pqEncode(embs, cb, "vec_id", "embedding", m, ksub)
    val queries = embs.where($"vec_id" % 20 === 0).select(
      ($"vec_id" + 1000000L).as("vec_id"),
      concat(
        array(element_at($"embedding", 1) * lit(1.05f)),
        slice($"embedding", lit(2), size($"embedding") - 1)).as("embedding"))
    val ivfpq = Similarity
      .ivfPqTopK(indexed, centroids, codes, cb, queries, "vec_id", "embedding",
        k = 1, nProbe = 4, m = m, ksub = ksub, candidates = 16)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toMap
    val brute = Similarity
      .bruteForceTopK(embs, queries, "vec_id", "embedding", k = 1)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toMap
    assert(ivfpq === brute, "IVF-PQ disagrees with brute force on planted copies")
    // the cell pruning is real: with nProbe=1 the scan touches at most
    // one cell's share of the corpus per query (candidate counts bound
    // it observably — a query can surface no more rows than its single
    // probed cell holds)
    val cellSizes = indexed.groupBy("centroid_id").count()
      .as[(Int, Long)].collect().toMap
    val oneProbe = Similarity
      .ivfPqTopK(indexed, centroids, codes, cb, queries, "vec_id", "embedding",
        k = 1000, nProbe = 1, m = m, ksub = ksub, candidates = 1000)
      .groupBy("q_id").count().as[(Long, Long)].collect()
    val maxCell = cellSizes.values.max
    oneProbe.foreach { case (q, n) =>
      assert(n <= maxCell, s"query $q surfaced $n rows > largest cell $maxCell — pruning not applied")
    }
    // the STORED layout (codes partitioned by centroid_id, probe reads
    // only probed cells' partitions) returns the same result
    val store = tempDir("ivfpqstore")
    Similarity.materializeIvfPqIndex(indexed, codes, s"$store/codes")
    val stored = Similarity
      .ivfPqTopKStored(spark, s"$store/codes", indexed, centroids, cb, queries,
        "vec_id", "embedding", k = 1, nProbe = 4, m = m, ksub = ksub, candidates = 16)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toMap
    assert(stored === brute, "stored-layout IVF-PQ disagrees with brute force")
  }

  test("weightedSample: explode-reference parity, per-stratum bounds, weight-monotone inclusion") {
    val n = 15
    // weight must be DECORRELATED from the stratum striping: the fixture
    // assigns doc_ids as source_index + 20*j, so `doc_id % 4` is CONSTANT
    // per source (every stratum all-one-weight-class → inclusion counts
    // between classes are fixed by the per-stratum n, not by the weights,
    // and no monotonicity assert can bite). `doc_id div 20` recovers j,
    // which cycles 0..24 within every source, so each stratum genuinely
    // mixes all four weight classes (7/6/6/6 docs of weight 1/2/3/4).
    val weight = lit(1) + floor($"doc_id" / 20) % 4
    val got = TextOps.weightedSample(docs, "doc_id", "source", weight, n, "wspec")
      .as[(String, Long, Int)].collect().toSeq.sortBy(r => (r._1, r._3))
    // reference: the same draw via an EXPLODED copy table and a window —
    // the composed form the map-only operator must match exactly
    val ref = docs
      .select($"source", $"doc_id", explode(sequence(lit(1), weight)).as("c"))
      .select($"source", $"doc_id",
        md5(concat_ws(":", lit("wspec"), $"doc_id".cast("string"), $"c".cast("string"))).as("u"))
      .groupBy("source", "doc_id")
      .agg(max($"u").as("k"))
      .select($"source", $"doc_id",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("source")
          .orderBy(substring($"k", 1, 13).desc, $"doc_id".asc)).as("rank"))
      .where($"rank" <= n)
      .as[(String, Long, Int)].collect().toSeq.sortBy(r => (r._1, r._3))
    assert(got === ref, "map-only weighted sample must equal the exploded-window reference")
    // bounds: at most n per stratum, ids unique within a stratum
    got.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.size <= n, s"$src oversampled")
      assert(rows.map(_._2).distinct.size === rows.size, s"$src sampled an id twice")
    }
    // weight-monotone inclusion, pinned on the deterministic fixture
    // draw: weight-4 docs (doc_id div 20 % 4 == 3, 6 per stratum) must be
    // sampled strictly more often than weight-1 docs (== 0, 7 per
    // stratum) across all strata — every stratum mixes both classes, so
    // A-ES's 4× inclusion odds dominate despite weight-1's larger share
    // of the corpus (140 vs 120 docs) at this sample size (15 of 25)
    val byW = got.groupBy(r => ((r._2 / 20) % 4).toInt).view.mapValues(_.size).toMap
    assert(byW.getOrElse(3, 0) > byW.getOrElse(0, 0),
      s"weight-4 inclusion ${byW.getOrElse(3, 0)} not above weight-1 ${byW.getOrElse(0, 0)}")
  }

  test("bigramLmScore: hand-computed integer probabilities; empty model scores zero; short docs emit zero rows") {
    import spark.implicits._
    val fixture = Seq(
      (0L, "a b a b c"),
      (1L, "a b x"),
      (2L, "z")).toDF("doc_id", "text")
    // refFraction = 1.0 → the model IS the corpus:
    //   c1: a→3, b→3;  c2: (a,b)→3, (b,a)→1, (b,c)→1, (b,x)→1
    // doc 0 bigrams (a,b)(b,a)(a,b)(b,c): p_e6 = 1e6, 333333, 1e6, 333333
    // doc 1 bigrams (a,b)(b,x): p_e6 = 1e6, 333333
    // doc 2: a single token — zero bigrams, all-zero row
    val got = TextOps.bigramLmScore(fixture, "doc_id", "text", refFraction = 1.0)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (d, a, b2, c, s) => d -> ((a, b2, c, s)) }.toMap
    assert(got(0L) === ((4L, 4L, 4L, 2666666L)))
    assert(got(1L) === ((2L, 2L, 2L, 1333333L)))
    assert(got(2L) === ((0L, 0L, 0L, 0L)))
    // an EMPTY reference slice (fraction 0) scores every bigram 0 with
    // zero context hits — the harshest-backoff contract, not an error
    val none = TextOps.bigramLmScore(fixture, "doc_id", "text", refFraction = 0.0)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (d, a, b2, c, s) => d -> ((a, b2, c, s)) }.toMap
    assert(none(0L) === ((4L, 0L, 0L, 0L)))
    assert(none(2L) === ((0L, 0L, 0L, 0L)))
    // corpus sanity: n_bigrams = tokenCount − 1, probabilities bounded
    val corpus = TextOps.bigramLmScore(docs, "doc_id", "text")
      .join(docs.select($"doc_id", TextOps.tokenCount($"text").cast("long").as("nt")), "doc_id")
    assert(corpus.where($"n_bigrams" =!= $"nt" - 1).count() === 0)
    assert(corpus.where($"sum_p_e6" > $"n_bigrams" * 1000000L).count() === 0)
    assert(corpus.where($"n_hit" > $"n_ctx" || $"n_ctx" > $"n_bigrams").count() === 0)
  }

  test("bm25TopK: exact e6 scores and ranking vs an independent reference on a hand fixture; planted rare-term top-1 on the corpus") {
    import spark.implicits._
    val texts = Map(
      0L -> "apple banana apple",
      1L -> "banana cherry",
      2L -> "apple apple apple durian",
      3L -> "cherry cherry banana banana")
    val docsDf = texts.toSeq.toDF("doc_id", "text")
    val queriesDf = Seq((100L, "apple banana")).toDF("q_id", "qtext")
    val got = TextOps.bm25TopK(docsDf, "doc_id", "text", queriesDf, "q_id", "qtext", k = 4)
      .orderBy("rank").as[(Long, Long, Int, Long, Long, Long)].collect().toSeq
    // independent reference: plain-Scala BM25 with the same formula tree
    val toks = texts.view.mapValues(_.split("\\s+").toSeq).toMap
    val n = texts.size.toDouble
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    val qset = Seq("apple", "banana")
    def dfOf(t: String) = toks.values.count(_.contains(t)).toDouble
    def ref(d: Long): (Long, Long, Long) = {
      var s = 0L; var tfs = 0L; var nt = 0L
      for (t <- qset) {
        val tf = toks(d).count(_ == t)
        if (tf > 0) {
          val idf = math.log(1 + (n - dfOf(t) + 0.5) / (dfOf(t) + 0.5))
          val part = tf * (1.2 + 1) / (tf + 1.2 * ((1 - 0.75) + 0.75 * toks(d).size / avgdl))
          s += math.floor(idf * part * 1e6 + 0.5).toLong; tfs += tf; nt += 1
        }
      }
      (s, tfs, nt)
    }
    val exp = texts.keys.toSeq.map(d => (d, ref(d))).filter(_._2._3 > 0)
      .sortBy { case (d, (s, _, _)) => (-s, d) }
    assert(got.map(_._2) === exp.map(_._1), "ranking diverges from the reference")
    got.zip(exp).zipWithIndex.foreach { case (((qid, did, rank, s, tfs, nt), (ed, (es, etfs, ent))), i) =>
      assert(qid === 100L && did === ed && rank === i + 1)
      assert(s === es, s"doc $did score_e6 $s != reference $es")
      assert(tfs === etfs && nt === ent)
    }
    // corpus leg: a planted df=1 tail term must put the source doc at
    // rank 1 for every query (the driver gate's margin argument)
    val corpus = docs.select($"doc_id",
      when($"doc_id" % 50 === 7, concat($"text", lit(" zzq"), $"doc_id"))
        .otherwise($"text").as("text"))
    val queries = docs.where($"doc_id" % 50 === 7)
      .select($"doc_id".as("q_id"),
        concat(lit("zzq"), $"doc_id", lit(" "),
          array_join(slice(split(trim($"text"), "\\s+"), 1, 4), " ")).as("qtext"))
    val top1 = TextOps.bm25TopK(corpus, "doc_id", "text", queries, "q_id", "qtext", k = 1)
      .select($"q_id", $"doc_id").as[(Long, Long)].collect().toMap
    assert(top1.nonEmpty && top1.forall { case (q, d) => q === d },
      s"planted rare-term queries did not rank their source first: $top1")
    // the STORED inverted index (postings/dict partitioned by term-hash
    // bucket, bucket count from the artifact marker) reproduces the
    // inline result exactly — full rows, not just top-1 identity
    val store = tempDir("bm25store")
    TextOps.materializeBm25Index(corpus, "doc_id", "text", store, numBuckets = 8)
    val inline = TextOps.bm25TopK(corpus, "doc_id", "text", queries, "q_id", "qtext", k = 3)
      .as[(Long, Long, Int, Long, Long, Long)].collect().toSet
    val stored = TextOps.bm25TopKStored(spark, store, queries, "q_id", "qtext", k = 3)
      .as[(Long, Long, Int, Long, Long, Long)].collect().toSet
    assert(stored === inline, "stored-index BM25 diverges from the inline form")
    // an unstamped directory is refused
    val ex = intercept[IllegalArgumentException] {
      TextOps.bm25TopKStored(spark, tempDir("bm25bare"), queries, "q_id", "qtext", k = 1)
    }
    assert(ex.getMessage.contains("marker"))
  }

  test("bm25TopKStored block-max early termination: bit-identical to the full scan across block sizes, ks and the guard") {
    // skewed deterministic corpus: a df=N stopword-ish 'hot' term on even
    // docs, a 7-way 'rare' family, a 17-word shared lexicon with varying
    // doc lengths (so per-block (max_tf, min_dl) bounds actually vary),
    // and MULTI-TERM queries whose top docs combine a high-impact block
    // of one term with LOW-impact blocks of another — the completion
    // case the exactness certificate exists for
    val corpus = (1 to 150).map { i =>
      val words = (0 until (i % 25 + 8)).map(j => s"w${(i * (j + 3) + j * j) % 17}") ++
        Seq(s"rare${i % 7}") ++ (if (i % 2 == 0) Seq("hot", "hot") else Nil)
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    val queries = Seq(
      (1L, "hot rare3 w5"), (2L, "rare1 w2 w9"), (3L, "hot hot w0"),
      (4L, "absentterm w4"), (5L, "absentonly"), (6L, "rare0 rare1 rare2 hot w1"))
      .toDF("q_id", "qtext")
    def run(store: String, k: Int, frac: Option[Double]) =
      TextOps.bm25TopKStored(spark, store, queries, "q_id", "qtext", k, 1.2, 0.75, frac)
        .as[(Long, Long, Int, Long, Long, Long)].collect().toSet
    for (blockSize <- Seq(1, 2, 7, 4096); k <- Seq(1, 5, 500)) {
      val store = tempDir(s"bm25bm_${blockSize}_$k")
      TextOps.materializeBm25Index(corpus, "doc_id", "text", store,
        numBuckets = 4, blockSize = blockSize)
      // the full-path twin: SAME artifact, block-max sidecar disarmed
      val full = tempDir(s"bm25bmf_${blockSize}_$k")
      TextOps.materializeBm25Index(corpus, "doc_id", "text", full,
        numBuckets = 4, blockSize = blockSize)
      assert(new java.io.File(s"$full/_GRAFT_BM25_BLOCKMAX").delete())
      assert(run(store, k, None) === run(full, k, None),
        s"block-max diverged from the full scan at blockSize=$blockSize k=$k")
      assert(run(store, k, Some(0.4)) === run(full, k, Some(0.4)),
        s"guarded block-max diverged at blockSize=$blockSize k=$k")
      // ... and from the inline scorer (k ≤ matches only: inline and
      // stored agree on ALL matches, so k=500 returns every match)
      val inline = TextOps
        .bm25TopK(corpus, "doc_id", "text", queries, "q_id", "qtext", k)
        .as[(Long, Long, Int, Long, Long, Long)].collect().toSet
      assert(run(store, k, None) === inline,
        s"block-max diverged from inline at blockSize=$blockSize k=$k")
    }
  }

  test("bm25TopKStored stopword guard: planted stopword dropped from the probe, top-1 identity preserved, pure-stopword query empty") {
    // every doc carries the planted stopword (df = N), every 50th a df=1
    // rare tail term; queries mix the stopword with the rare term
    val corpus = docs.select($"doc_id",
      concat($"text", lit(" xthe"),
        when($"doc_id" % 50 === 7, concat(lit(" zzq"), $"doc_id")).otherwise(lit("")))
        .as("text"))
    val queries = docs.where($"doc_id" % 50 === 7)
      .select($"doc_id".as("q_id"),
        concat(lit("xthe zzq"), $"doc_id", lit(" "),
          array_join(slice(split(trim($"text"), "\\s+"), 1, 4), " ")).as("qtext"))
    val store = tempDir("bm25guard")
    TextOps.materializeBm25Index(corpus, "doc_id", "text", store, numBuckets = 8)
    val unguarded = TextOps.bm25TopKStored(spark, store, queries, "q_id", "qtext", k = 1)
      .select($"q_id", $"doc_id").as[(Long, Long)].collect().toMap
    val guarded = TextOps.bm25TopKStored(spark, store, queries, "q_id", "qtext", k = 1,
        maxQueryTermDfFrac = Some(0.5))
      .select($"q_id", $"doc_id").as[(Long, Long)].collect().toMap
    // dropping the ≈0-idf stopword cannot move the rare-term-anchored
    // top-1 (the driver gate's margin argument, guarded form)
    assert(guarded.nonEmpty && guarded === unguarded,
      "stopword guard changed top-1 identity")
    // the guard really removed the stopword's contribution: matched-term
    // diagnostics drop by exactly the stopword on the top hit
    val ntUnguarded = TextOps.bm25TopKStored(spark, store, queries, "q_id", "qtext", k = 1)
      .select($"q_id", $"n_terms").as[(Long, Long)].collect().toMap
    val ntGuarded = TextOps.bm25TopKStored(spark, store, queries, "q_id", "qtext", k = 1,
        maxQueryTermDfFrac = Some(0.5))
      .select($"q_id", $"n_terms").as[(Long, Long)].collect().toMap
    assert(ntGuarded.forall { case (q, nt) => nt < ntUnguarded(q) },
      "stopword still matched under the guard")
    // a pure-stopword query has nothing discriminative to rank by
    val pure = Seq((999L, "xthe")).toDF("q_id", "qtext")
    assert(TextOps.bm25TopKStored(spark, store, pure, "q_id", "qtext", k = 5,
      maxQueryTermDfFrac = Some(0.5)).count() === 0L)
    // a nonsense fraction is refused
    val ex = intercept[IllegalArgumentException] {
      TextOps.bm25TopKStored(spark, store, queries, "q_id", "qtext", k = 1,
        maxQueryTermDfFrac = Some(1.5))
    }
    assert(ex.getMessage.contains("maxQueryTermDfFrac"))
  }

  test("boilerplateStrip: frequency-thresholded paragraph removal with order-preserving reassembly") {
    val rows = Seq(
      (1L, "alpha one\nCOMMON\nbeta one"),
      (2L, "alpha two\nCOMMON\nbeta two"),
      (3L, "COMMON\ngamma three"),
      (4L, "delta four\nCOMMON"),
      (5L, "COMMON"),
      (6L, "epsilon six\nNEARLY\nzeta six"),
      (7L, "NEARLY"),
      (8L, "NEARLY"),
      (9L, "NEARLY")
    ).toDF("doc_id", "text")
    val out = TextOps.boilerplateStrip(rows, "doc_id", "text", minDocs = 5)
      .as[(Long, Int, Int, String)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    // COMMON lives in 5 distinct docs -> boilerplate everywhere; organic
    // paragraphs survive in original order
    assert(out(1L) === ((3, 2, "alpha one\nbeta one")))
    assert(out(4L) === ((2, 1, "delta four")))
    // a document that was ALL boilerplate strips to empty
    assert(out(5L) === ((1, 0, "")))
    // NEARLY lives in only 4 docs (< minDocs) -> kept, even standalone
    assert(out(6L) === ((3, 3, "epsilon six\nNEARLY\nzeta six")))
    assert(out(9L) === ((1, 1, "NEARLY")))
    // regex-special separators are taken literally
    val piped = Seq((1L, "a|X|b"), (2L, "X"), (3L, "X|c")).toDF("doc_id", "text")
    val pout = TextOps.boilerplateStrip(piped, "doc_id", "text", minDocs = 2, sep = "|")
      .as[(Long, Int, Int, String)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(pout(1L) === ((3, 2, "a|b")) && pout(2L) === ((1, 0, "")) && pout(3L) === ((2, 1, "c")))
    // minDocs=1 would strip every paragraph — refused
    val ex = intercept[IllegalArgumentException] {
      TextOps.boilerplateStrip(rows, "doc_id", "text", minDocs = 1)
    }
    assert(ex.getMessage.contains("minDocs"))
  }

  test("winnowContamination: edited train leak flagged, unrelated eval clean, train df cap silences boilerplate") {
    val train = Seq(
      (0L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november"),
      // boilerplate: identical text across >maxDf train docs — its
      // fingerprints must be capped out of the evidence set
      (2L, "common header line repeated across many documents every time exactly the same words here"),
      (4L, "common header line repeated across many documents every time exactly the same words here"),
      (6L, "common header line repeated across many documents every time exactly the same words here")
    ).toDF("doc_id", "text")
    val evalSplit = Seq(
      // light-edit leak of train doc 0: the shared 13-token prefix run
      // is ≥ w + windowSize − 1, so fingerprints are guaranteed shared
      (1L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike zzedited"),
      (3L, "totally different unique words nothing shared with training corpus at all whatsoever right"),
      // overlaps train ONLY through the boilerplate text
      (5L, "common header line repeated across many documents every time exactly the same words here")
    ).toDF("doc_id", "text")
    val got = graft.ext.Dedup
      .winnowContamination(train, evalSplit, "doc_id", "text",
        w = 4, windowSize = 3, minShared = 2, maxDf = 2L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(3)))).toMap
    assert(got(1L)._2, s"edited train copy must be contaminated: $got")
    assert(got(1L)._1 === 1L, s"exactly one matching train doc expected: $got")
    assert(!got(3L)._2, s"unrelated eval doc must be clean: $got")
    assert(!got(5L)._2, s"boilerplate-only overlap must be silenced by the train df cap: $got")
  }

  test("winnowContaminationStored: fresh build equals inline; append-advanced equals inline over the union") {
    import graft.ext.Dedup
    val boiler = "common header line repeated across many documents every time exactly the same words here"
    val leakSrc = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november"
    val train1 = Seq(
      (0L, leakSrc), (2L, boiler), (4L, boiler), (6L, boiler)
    ).toDF("doc_id", "text")
    val evalSplit = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike zzedited"),
      (3L, "totally different unique words nothing shared with training corpus at all whatsoever right"),
      (5L, boiler)
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_winnow_decontam_idx").toString
    Dedup.writeWinnowIndex(train1, "doc_id", "text", dir,
      w = 4, windowSize = 3, maxDf = 2L, buckets = 8, portable = false)
    def asMap(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    def inline(train: org.apache.spark.sql.DataFrame) =
      asMap(Dedup.winnowContamination(train, evalSplit, "doc_id", "text",
        w = 4, windowSize = 3, minShared = 2, maxDf = 2L))
    val stored1 = asMap(Dedup.winnowContaminationStored(
      spark, dir, evalSplit, "doc_id", "text", minShared = 2))
    assert(stored1 === inline(train1), "fresh stored build must equal the inline form")
    assert(stored1(1L)._3 && !stored1(3L)._3 && !stored1(5L)._3)
    // two appended copies of the leak source push its fingerprints to
    // df = 3 > maxDf = 2 ACROSS the append: the probe-side cumulative
    // cap must silence them exactly as a rebuild over the union would —
    // the leak flips to clean on both paths
    val train2 = Seq((8L, leakSrc), (10L, leakSrc)).toDF("doc_id", "text")
    Dedup.appendWinnowIndex(spark, dir, train2, "doc_id", "text")
    val storedU = asMap(Dedup.winnowContaminationStored(
      spark, dir, evalSplit, "doc_id", "text", minShared = 2))
    assert(storedU === inline(train1.unionByName(train2)),
      "append-advanced store must equal inline over the union corpus")
    assert(!storedU(1L)._3, "fingerprints turned hot across the append must be re-capped at probe")
  }

  test("winnowingNearDupPairs: one-token edit recovered, unrelated docs silent, hot-fingerprint cap bounds candidates") {
    import graft.ext.Dedup
    val words = (1 to 40).map(i => s"w$i")
    val docA = words.mkString(" ")
    val docB = words.updated(19, "EDIT").mkString(" ")
    val docC = (1 to 40).map(i => s"z$i").mkString(" ")
    val trio = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")
    for (portable <- Seq(false, true)) {
      val pairs = Dedup.winnowingNearDupPairs(
        trio, "doc_id", "text", minShared = 3, maxDf = 8, portable = portable)
        .as[(Long, Long, Long)].collect().toSet
      // the edit splits the doc into two long shared runs — winnowing
      // guarantees shared fingerprints from both; the unrelated doc
      // shares nothing
      assert(pairs.map(p => (p._1, p._2)) === Set((1L, 2L)),
        s"portable=$portable: expected exactly the edited pair, got $pairs")
      assert(pairs.head._3 >= 3)
    }
    // identical docs share their ENTIRE fingerprint set...
    val clones = (1L to 9L).map(i => (i, docA)).toDF("doc_id", "text")
    val nFps = trio.where($"doc_id" === 1L)
      .select(size(graft.ext.TextOps.winnowingFingerprints($"text")))
      .head().getInt(0)
    val open = Dedup.winnowingNearDupPairs(
      clones, "doc_id", "text", minShared = 3, maxDf = 20, portable = false)
      .as[(Long, Long, Long)].collect()
    assert(open.length === 36 && open.forall(_._3 === nFps)) // C(9,2) pairs
    // ...but at df=9 > maxDf=8 every fingerprint is non-discriminative
    // boilerplate and the cap silences the quadratic candidate blowup
    val capped = Dedup.winnowingNearDupPairs(
      clones, "doc_id", "text", minShared = 1, maxDf = 8, portable = false)
    assert(capped.count() === 0)
  }

  test("winnowAdmitStored: statuses with snapshot precedence, stamped layout validated, build-time df cap") {
    import graft.ext.Dedup
    val words = (1 to 40).map(i => s"w$i")
    val docA = words.mkString(" ")
    val docAEdit = words.updated(19, "EDIT").mkString(" ")
    val docNew = (1 to 40).map(i => s"n$i").mkString(" ")
    val corpus = Seq((1L, docA)).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-winnow-idx").toString
    Dedup.writeWinnowIndex(corpus, "doc_id", "text", dir, maxDf = 8, buckets = 4)
    assert(Dedup.winnowIndexLayout(spark, dir) === ((5, 4, 8L, 4, false)))
    // 10: edited copy of the stored doc → dup_snapshot; 11/12: in-batch
    // clones of an unseen doc → first new, second dup_batch; 13:
    // unrelated → new; 14: matches BOTH the store and batch doc 10 —
    // snapshot wins the precedence
    val batch = Seq(
      (10L, docAEdit), (11L, docNew), (12L, docNew),
      (13L, (1 to 40).map(i => s"z$i").mkString(" ")), (14L, docAEdit)
    ).toDF("doc_id", "text")
    val got = Dedup.winnowAdmitStored(spark, dir, batch, "doc_id", "text", minShared = 3)
      .as[(Long, String)].collect().toMap
    assert(got === Map(
      10L -> "dup_snapshot", 11L -> "new", 12L -> "dup_batch",
      13L -> "new", 14L -> "dup_snapshot"))
    // build-time df cap: an index of 9 clones has every fingerprint at
    // df=9 > maxDf=8 — all postings dropped as boilerplate, so even an
    // exact copy probes clean
    val boiler = (1L to 9L).map(i => (i, docA)).toDF("doc_id", "text")
    val dir2 = java.nio.file.Files.createTempDirectory("graft-winnow-idx2").toString
    Dedup.writeWinnowIndex(boiler, "doc_id", "text", dir2, maxDf = 8, buckets = 4)
    val got2 = Dedup.winnowAdmitStored(
      spark, dir2, Seq((20L, docA)).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got2 === Map(20L -> "new"))
    // no marker → hard refusal, never a guessed layout
    val bare = java.nio.file.Files.createTempDirectory("graft-winnow-bare").toString
    val ex = intercept[IllegalArgumentException] {
      Dedup.winnowAdmitStored(spark, bare, batch, "doc_id", "text")
    }
    assert(ex.getMessage.contains("marker"))
  }

  test("appendWinnowIndex: admit-then-append equals one-shot rebuild over the union; hot fingerprints excluded on both paths") {
    import graft.ext.Dedup
    def mk(prefix: String) = (1 to 40).map(i => s"$prefix$i").mkString(" ")
    val docP = mk("p"); val docQ = mk("q"); val docR = mk("r")
    val docS = mk("s"); val docT = mk("t")
    val docREdit = (1 to 40).map(i => s"r$i").updated(19, "EDIT").mkString(" ")
    // initial corpus: P at df 2 (kept at maxDf=3), Q unique, S at df 5
    // (dropped at build AND recorded in the persisted hot set)
    val c0 = (Seq((1L, docP), (2L, docP), (3L, docQ)) ++
      (4L to 8L).map(i => (i, docS))).toDF("doc_id", "text")
    // appended batch: P crosses maxDf only cumulatively (2 stored + 2
    // appended = 4 > 3 — the probe-side count must exclude it); S would
    // sit at an innocent-looking df 2 in the store if the build-hot set
    // did not block the append; R is fresh
    val b1 = Seq((11L, docP), (12L, docP), (13L, docR), (14L, docS), (15L, docS))
      .toDF("doc_id", "text")
    // probe: copies of P (hot-after-build), R (live), S (hot-at-build),
    // an unrelated doc, and an in-batch clone pair of unseen T
    val b2 = Seq(
      (21L, docP), (22L, docREdit), (23L, mk("z")), (24L, docS),
      (25L, docT), (26L, docT)).toDF("doc_id", "text")
    val appended = java.nio.file.Files.createTempDirectory("graft-winnow-app").toString
    Dedup.writeWinnowIndex(c0, "doc_id", "text", appended, maxDf = 3, buckets = 4)
    Dedup.appendWinnowIndex(spark, appended, b1, "doc_id", "text")
    val oneShot = java.nio.file.Files.createTempDirectory("graft-winnow-one").toString
    Dedup.writeWinnowIndex(c0.unionByName(b1), "doc_id", "text", oneShot, maxDf = 3, buckets = 4)
    def probe(dir: String) = Dedup
      .winnowAdmitStored(spark, dir, b2, "doc_id", "text", minShared = 3)
      .as[(Long, String)].collect().toMap
    val viaAppend = probe(appended)
    assert(viaAppend === probe(oneShot),
      "append-advanced store diverged from the one-shot rebuild over the union")
    assert(viaAppend === Map(
      21L -> "new",          // P hot after build: cumulative probe count 4 > 3
      22L -> "dup_snapshot", // R appended live, edited copy still pairs
      23L -> "new",
      24L -> "new",          // S hot at build: hot set blocked the append
      25L -> "new", 26L -> "dup_batch"))
    // the build-hot set really blocked S's appended postings (not just
    // the probe count): the store holds zero S postings
    val stored = spark.read.parquet(s"$appended/posts")
      .join(Seq((0L, docS)).toDF("doc_id", "text")
        .select(explode(graft.ext.TextOps.winnowingFingerprints($"text")).as("fp"))
        .distinct(), Seq("fp"), "left_semi")
    assert(stored.count() === 0L, "build-hot fingerprints leaked into the append")
  }

  test("appendWinnowIndex: a crashed-then-retried append with an appendId is idempotent") {
    import graft.ext.Dedup
    def mk(prefix: String) = (1 to 40).map(i => s"$prefix$i").mkString(" ")
    // P sits at df 2 in the store; one legitimate appended copy takes the
    // cumulative probe count to 3 = maxDf (still live); a DOUBLE-written
    // append would take it to 4 > maxDf and flip the probe to 'new'
    val c0 = Seq((1L, mk("p")), (2L, mk("p")), (3L, mk("q"))).toDF("doc_id", "text")
    val b1 = Seq((11L, mk("p")), (12L, mk("r"))).toDF("doc_id", "text")
    val probeBatch = Seq((21L, mk("p")), (22L, mk("r"))).toDF("doc_id", "text")
    def build(retry: Boolean, appendId: Long) = {
      val dir = java.nio.file.Files.createTempDirectory("graft-winnow-retry").toString
      Dedup.writeWinnowIndex(c0, "doc_id", "text", dir, maxDf = 3, buckets = 4)
      Dedup.appendWinnowIndex(spark, dir, b1, "doc_id", "text", appendId)
      if (retry) Dedup.appendWinnowIndex(spark, dir, b1, "doc_id", "text", appendId)
      Dedup.winnowAdmitStored(spark, dir, probeBatch, "doc_id", "text", minShared = 3)
        .as[(Long, String)].collect().toMap
    }
    val once = build(retry = false, appendId = 7L)
    assert(once === Map(21L -> "dup_snapshot", 22L -> "dup_snapshot"))
    assert(build(retry = true, appendId = 7L) === once,
      "retried append with the same appendId changed probe decisions")
    // the legacy blind append really does double-count — the failure
    // mode the appendId partition exists to prevent
    assert(build(retry = true, appendId = -1L)(21L) === "new",
      "expected the legacy double-append to trip the df cap (test premise)")
  }

  test("compactWinnowAppendStore: aseq fold is probe-invisible, bounds the per-append dirs, and later appends resume") {
    import graft.ext.Dedup
    import graft.streaming.CdcStream
    def mk(prefix: String) = (1 to 40).map(i => s"$prefix$i").mkString(" ")
    val c0 = Seq((1L, mk("p")), (2L, mk("q"))).toDF("doc_id", "text")
    val probeBatch = Seq((21L, mk("p")), (22L, mk("r")), (23L, mk("s")))
      .toDF("doc_id", "text")
    def probe(dir: String) =
      Dedup.winnowAdmitStored(spark, dir, probeBatch, "doc_id", "text", minShared = 3)
        .as[(Long, String)].collect().toMap
    val dir = java.nio.file.Files.createTempDirectory("graft-winnow-apfold").toString
    Dedup.writeWinnowIndex(c0, "doc_id", "text", dir, maxDf = 5, buckets = 4)
    // ten appends = ten aseq dirs (the admission-loop growth pattern);
    // distinct texts so no fingerprint crosses the probe-side df cap
    for (i <- 0 until 10)
      Dedup.appendWinnowIndex(
        spark, dir,
        Seq((100L + i, if (i == 0) mk("r") else mk(s"u${i}x"))).toDF("doc_id", "text"),
        "doc_id", "text", appendId = i.toLong)
    val before = probe(dir)
    assert(before(22L) === "dup_snapshot", "appended postings not probed (premise)")
    CdcStream.compactWinnowAppendStore(spark, dir, upToSeq = 9L)
    assert(new java.io.File(s"$dir/apost").listFiles
      .filter(_.getName.startsWith("aseq=")).map(_.getName).toSet === Set("aseq=9"),
      "apost not folded to one aseq partition")
    assert(probe(dir) === before, "apost fold changed probe decisions")
    // the loop resumes past the fold: a later append lands in its own
    // partition and is probed together with the folded rows
    Dedup.appendWinnowIndex(
      spark, dir, Seq((200L, mk("s"))).toDF("doc_id", "text"),
      "doc_id", "text", appendId = 10L)
    val after = probe(dir)
    assert(after(23L) === "dup_snapshot", "post-fold append not probed")
    assert(after(21L) === before(21L) && after(22L) === before(22L))
  }

  test("nbQualityScore: hand-computed Laplace posteriors, neutral OOV, empty-doc retention") {
    val positives = Seq((100L, "good good fine")).toDF("doc_id", "text")
    val negatives = Seq((200L, "bad awful")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "good bad new"), // known-pos, known-neg, OOV
      (2L, "good good"),
      (3L, "")              // empty doc stays in the corpus with zeros
    ).toDF("doc_id", "text")
    val out = TextOps.nbQualityScore(docs, "doc_id", "text", positives, negatives)
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    // good: (2+1)/(2+0+2) = 3/4 -> 750000; bad: 1/3 -> 333333 (half-up);
    // OOV: 1/2 -> neutral 500000, known=0
    assert(out(1L) === ((3L, 2L, 750000L + 333333L + 500000L)))
    assert(out(2L) === ((2L, 2L, 1500000L)))
    assert(out(3L) === ((0L, 0L, 0L)))
    // the posterior is monotone in the likelihood ratio: a pure-positive
    // doc outranks a pure-negative one under the SAME model
    val rank = TextOps.nbQualityScore(
      Seq((1L, "good fine"), (2L, "bad awful")).toDF("doc_id", "text"),
      "doc_id", "text", positives, negatives)
      .as[(Long, Long, Long, Long)].collect().map(t => t._1 -> t._4).toMap
    assert(rank(1L) > rank(2L))
  }

  test("canonicalUrl: rule set pinned on hand cases, null/non-URL safe, idempotent") {
    val cases = Seq(
      // case-folding, default port, tracking params, sort, fragment
      "HTTP://A.COM:80/x/?utm_source=1&b=2&a=1#f" -> "http://a.com/x?a=1&b=2",
      "https://B.com:443" -> "https://b.com/",
      // explicit non-default port survives; :8080 is not :80
      "http://a.com:8080/p" -> "http://a.com:8080/p",
      // trailing slashes collapse; root stays root
      "https://a.com///" -> "https://a.com/",
      "https://a.com/a//" -> "https://a.com/a",
      // only-tracking query drops the '?' entirely
      "https://a.com/p?utm_campaign=z" -> "https://a.com/p",
      "https://a.com/p?gclid=1&fbclid=2&z=9" -> "https://a.com/p?z=9",
      // no scheme → passthrough
      "not a url" -> "not a url",
      "" -> ""
    )
    val df = spark.createDataFrame(cases.map(c => Tuple1(c._1))).toDF("u")
      .select($"u", TextOps.canonicalUrl($"u").as("c"))
    val got = df.as[(String, String)].collect().toMap
    cases.foreach { case (in, want) =>
      assert(got(in) === want, s"canonicalUrl($in)")
    }
    // idempotent: canonicalizing a canonical url is a fixpoint
    val twice = spark.createDataFrame(cases.map(c => Tuple1(c._2))).toDF("u")
      .select($"u", TextOps.canonicalUrl($"u").as("c"))
      .as[(String, String)].collect()
    twice.foreach { case (in, out) => assert(out === in, s"not idempotent on $in") }
    // null-safe
    val n = spark.sql("SELECT CAST(NULL AS STRING) AS u")
      .select(TextOps.canonicalUrl($"u")).head()
    assert(n.isNullAt(0))
  }

  test("gate pin: (user_id, ts) is unique at µs grain on the gate corpora") {
    // x_time_bucket_agg's min_by/max_by determinism rests on this — a
    // data change that introduces per-user µs ties must fail HERE, not
    // as a silent gate hash mismatch
    for (dir <- Seq(sf0001, sfDir("sf0.01"))) {
      requireFixture(dir)
      val ev = Tables.load(spark, dir, "events")
      val ties = ev.groupBy("user_id", "ts").count().where($"count" > 1).count()
      assert(ties === 0L, s"$dir has $ties per-user µs timestamp ties")
    }
  }

  test("ImageCodec PNG encode→decode round-trips dims and pixels exactly; resize repaints to target dims") {
    import Multimodal.ImageCodec
    val png = ImageCodec.encodePng(32, 24, seed = 7L)
    val d = ImageCodec.decode(png).get
    assert(d.width == 32 && d.height == 24)
    assert(d.pixelSum > 0L)
    // PNG is lossless and the pixel stream is seed-deterministic: a second
    // encode of the same (dims, seed) decodes to the identical pixel sum
    assert(ImageCodec.decode(ImageCodec.encodePng(32, 24, seed = 7L)).get == d)
    // a different seed changes content but not dims
    val d2 = ImageCodec.decode(ImageCodec.encodePng(32, 24, seed = 8L)).get
    assert(d2.width == 32 && d2.height == 24 && d2.pixelSum != d.pixelSum)
    // real resize: decoded dims are the requested dims; deterministic repaint
    val resized = ImageCodec.resizePng(png, 16, 12)
    val dr = ImageCodec.decode(resized).get
    assert(dr.width == 16 && dr.height == 12)
    assert(ImageCodec.decode(ImageCodec.resizePng(png, 16, 12)).get == dr)
    // undecodable payloads are None, not a crash
    assert(ImageCodec.decode("not a png".getBytes).isEmpty)
    assert(ImageCodec.decode(null).isEmpty)
  }

  test("AudioCodec WAV encode→decode round-trips stream parameters and samples exactly") {
    import Multimodal.AudioCodec
    val wav = AudioCodec.encodeWav(nSamples = 800, sampleRate = 8000, seed = 7L)
    assert(wav.length == 44 + 800 * 2)
    val d = AudioCodec.decode(wav).get
    assert(d.nSamples == 800 && d.sampleRate == 8000 && d.channels == 1)
    assert(d.durationMs == 100L)
    // PCM is lossless and the sample stream is seed-deterministic
    assert(AudioCodec.decode(AudioCodec.encodeWav(800, 8000, seed = 7L)).get == d)
    // a different seed changes content but not the stream parameters
    val d2 = AudioCodec.decode(AudioCodec.encodeWav(800, 8000, seed = 8L)).get
    assert(d2.nSamples == 800 && d2.sampleSum != d.sampleSum)
    // a javasound-independent check that the header is conformant RIFF:
    // the chunk walker must also tolerate an extra chunk before data
    val extra = {
      val base = AudioCodec.encodeWav(10, 8000, seed = 1L)
      val buf = java.nio.ByteBuffer.allocate(base.length + 12).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put(base, 0, 12) // RIFF size WAVE
      buf.put("LIST".getBytes("US-ASCII")).putInt(4).putInt(0) // foreign chunk
      buf.put(base, 12, base.length - 12)
      buf.array()
    }
    assert(AudioCodec.decode(extra).get.nSamples == 10)
    // undecodable payloads are None, not a crash
    assert(AudioCodec.decode("not a wav".getBytes).isEmpty)
    assert(AudioCodec.decode(null).isEmpty)
  }

  test("AudioCodec rejects malformed fmt chunks and honors RIFF word alignment") {
    import java.nio.{ByteBuffer, ByteOrder}
    import Multimodal.AudioCodec
    // fmt chunk declaring len=8 (< the 16-byte PCM body): must be None,
    // not a BufferUnderflowException killing the task
    val shortFmt = {
      val buf = ByteBuffer.allocate(44).order(ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36).put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(8).putLong(0L)
      buf.put("fill".getBytes("US-ASCII")).putInt(8).putLong(0L)
      buf.array()
    }
    assert(AudioCodec.decode(shortFmt).isEmpty)
    // a conformant writer pads odd-length chunks to word boundaries; the
    // walker must skip len + pad, or every later chunk tag misparses
    val oddChunk = {
      val base = AudioCodec.encodeWav(10, 8000, seed = 1L)
      val buf = ByteBuffer.allocate(base.length + 12).order(ByteOrder.LITTLE_ENDIAN)
      buf.put(base, 0, 12) // RIFF size WAVE
      buf.put("odd ".getBytes("US-ASCII")).putInt(3).put(Array[Byte](1, 2, 3, 0)) // 3 bytes + pad
      buf.put(base, 12, base.length - 12)
      buf.array()
    }
    assert(AudioCodec.decode(oddChunk).get.nSamples == 10)
  }

  test("decodeAudio recovers the synthetic stream parameters through the real decoder") {
    val clips = Multimodal.syntheticAudio(spark, docs.limit(40))
    val decoded = Multimodal.decodeAudio(clips).collect().map(a => a.media_id -> a).toMap
    val expected = docs.limit(40).select($"doc_id".cast("long"), $"n_chars".cast("long"))
      .as[(Long, Long)].collect()
    assert(decoded.size == expected.length)
    expected.foreach { case (id, nChars) =>
      val a = decoded(id)
      val n = (1L + nChars % 4001).toInt
      assert(a.n_samples == n && a.sample_rate == 8000 && a.duration_ms_decoded == n.toLong * 1000 / 8000,
        s"doc $id: $a")
    }
  }

  test("VideoCodec GRVI encode→decode round-trips container structure and frame pixels") {
    import Multimodal.{ImageCodec, VideoCodec}
    val clip = VideoCodec.encode(width = 16, height = 12, nFrames = 5, seed = 7L)
    val m = VideoCodec.decodeMeta(clip).get
    assert(m.nFrames == 5 && m.width == 16 && m.height == 12)
    // every frame is a genuine PNG whose pixels equal an independent
    // encode of the same (dims, per-frame seed)
    (0 until 5).foreach { i =>
      val d = VideoCodec.decodeFrame(clip, m, i).get
      assert(d.width == 16 && d.height == 12)
      assert(d == ImageCodec.decode(ImageCodec.encodePng(16, 12, 7L * 131L + i)).get)
    }
    // frames differ from each other (per-frame seeds)
    val sums = (0 until 5).map(i => VideoCodec.decodeFrame(clip, m, i).get.pixelSum)
    assert(sums.distinct.size == 5)
    // structural rejection: bad magic, truncated payload, out-of-range frame
    assert(VideoCodec.decodeMeta("not a video".getBytes).isEmpty)
    assert(VideoCodec.decodeMeta(java.util.Arrays.copyOf(clip, clip.length - 3)).isEmpty)
    assert(VideoCodec.decodeFrame(clip, m, 5).isEmpty)
    assert(VideoCodec.decodeMeta(null).isEmpty)
    // malformed header with a huge nFrames: 4*n wraps Int negative, which
    // must not sneak past the frame-index bound check — None, not a throw
    val hugeFrames = {
      val buf = java.nio.ByteBuffer.allocate(24)
      buf.put("GRVI".getBytes("US-ASCII")).putInt(1).putInt(Int.MaxValue).putInt(2).putInt(2).putInt(0)
      buf.array()
    }
    assert(VideoCodec.decodeMeta(hugeFrames).isEmpty)
  }

  test("decodeVideo and real frame sampling recover the synthetic clip geometry") {
    val clips = Multimodal.syntheticVideo(spark, docs.limit(30))
    val decoded = Multimodal.decodeVideo(clips).collect().map(v => v.media_id -> v).toMap
    val expected = docs.limit(30).select($"doc_id".cast("long"), $"n_chars".cast("long"))
      .as[(Long, Long)].collect()
    assert(decoded.size == expected.length)
    expected.foreach { case (id, nChars) =>
      val v = decoded(id)
      val (w, h, n) = ((1L + nChars % 32).toInt, (1L + nChars % 24).toInt, (1L + nChars % 8).toInt)
      assert(v.n_frames == n && v.width_decoded == w && v.height_decoded == h, s"doc $id: $v")
      assert(v.n_px_total == n.toLong * w * h)
      assert(v.pixel_sum_total > 0L)
    }
    // frame sampling decodes real pixels: each sampled frame's feature
    // carries the clip's true dims, not stub byte statistics
    val frames = Multimodal.sampleFrames(clips, everyMs = 40).collect()
    assert(frames.nonEmpty)
    frames.foreach { f =>
      val (_, nChars) = expected.find(_._1 == f.media_id).get
      assert(f.feature(0) == (1L + nChars % 32).toFloat && f.feature(1) == (1L + nChars % 24).toFloat)
    }
  }

  test("decodeImages recovers the synthetic dims through the real decoder") {
    val imgs = Multimodal.syntheticImages(spark, docs.limit(40))
    val decoded = Multimodal.decodeImages(imgs).collect().map(i => i.media_id -> i).toMap
    val meta = imgs.collect().map(m => m.media_id -> m).toMap
    assert(decoded.keySet == meta.keySet && decoded.nonEmpty)
    decoded.values.foreach { i =>
      val m = meta(i.media_id)
      assert(i.width_decoded == m.width && i.height_decoded == m.height)
      assert(i.n_px == m.width.toLong * m.height)
      assert(i.pixel_sum > 0L)
    }
  }

  test("extractFeaturesReal runs the real codec on every modality") {
    val media = Multimodal.syntheticMediaMixed(spark, docs.limit(60))
    val feats = Multimodal.extractFeaturesReal(media).collect().map(f => f.media_id -> f).toMap
    val decoded = Multimodal.decodeImages(media).collect().map(i => i.media_id -> i).toMap
    assert(decoded.nonEmpty)
    // image checksums are the REAL decoded pixel sums, not the byte stub
    decoded.foreach { case (id, i) =>
      assert(feats(id).checksum == i.pixel_sum)
      assert(feats(id).feature.take(3).toSeq == Seq(i.width_decoded.toFloat, i.height_decoded.toFloat, i.n_px.toFloat))
    }
    // audio checksums are the REAL decoded PCM sample sums
    val audio = media.filter(_.kind == "audio").collect()
    assert(audio.nonEmpty)
    audio.foreach { m =>
      val d = Multimodal.AudioCodec.decode(m.payload).get
      assert(feats(m.media_id).checksum == d.sampleSum)
      assert(feats(m.media_id).feature.take(2).toSeq == Seq(d.nSamples.toFloat, d.sampleRate.toFloat))
    }
    // video checksums are the REAL summed per-frame pixel sums
    val video = media.filter(_.kind == "video").collect()
    assert(video.nonEmpty)
    video.foreach { m =>
      val vm = Multimodal.VideoCodec.decodeMeta(m.payload).get
      val expectSum = (0 until vm.nFrames)
        .flatMap(i => Multimodal.VideoCodec.decodeFrame(m.payload, vm, i)).map(_.pixelSum).sum
      assert(feats(m.media_id).checksum == expectSum)
      assert(feats(m.media_id).feature(0) == vm.nFrames.toFloat)
    }
  }

  test("frame sampling emits duration/interval frames per video") {
    val media = Multimodal.syntheticMedia(spark, docs.limit(30))
    val frames = Multimodal.sampleFrames(media, everyMs = 500)
    val perVideo = frames.groupByKey(_.media_id).count().collect().toMap
    val expected = media.filter(_.kind == "video").collect()
      .map(m => m.media_id -> math.max(1L, m.duration_ms / 500)).toMap
    assert(perVideo == expected)
  }

  test("text operators are null- and empty-safe") {
    val weird = Seq(
      (1L, "normal text with several words here"),
      (2L, ""),
      (3L, "   "),
      (4L, null.asInstanceOf[String]),
      (5L, "one")
    ).toDF("doc_id", "text")
    // shingles: null text → null array; empty/blank → one empty shingle
    val sh = Dedup.shingled(weird, "doc_id", "text", 5).collect()
    assert(sh.length == 5)
    val counts = weird.select(
      $"doc_id",
      TextOps.tokenCount($"text").as("n"),
      TextOps.qualityScore($"text").as("q"),
      TextOps.langId($"text").as("l")
    ).orderBy("doc_id").collect()
    assert(counts(1).getInt(1) == 0) // empty → 0 tokens
    assert(counts(2).getInt(1) == 0) // blank → 0 tokens
    assert(counts(3).isNullAt(1))    // null propagates
    assert(counts(4).getInt(1) == 1)
    // jaccard pipeline doesn't throw on the weird rows
    assert(Dedup.ngramJaccardPairs(weird, "doc_id", "text", 5, 0.1, 100L).count() >= 0)
  }

  test("exactKeepFirst keeps the min-order row per key") {
    val df = Seq((1, 10, "a"), (1, 5, "b"), (2, 7, "c")).toDF("k", "ord", "v")
    val kept = Dedup.exactKeepFirst(df, Seq("k"), "ord")
      .select("k", "v").as[(Int, String)].collect().toSet
    assert(kept == Set((1, "b"), (2, "c")))
  }

  test("langId identifies marker-bearing text and falls back to und") {
    // the driver's synthetic documents carry random lang labels over an
    // English-ish vocabulary, so accuracy-vs-label is meaningless; test the
    // operator on real sentences instead
    val samples = Seq(
      (1L, "the quick brown fox and the lazy dog went to the market", "en"),
      (2L, "le chat et la souris sont dans les jardins de la ville", "fr"),
      (3L, "el perro y los gatos viven en una casa para siempre", "es"),
      (4L, "der hund und die katze sind mit dem kind im haus", "de"),
      (5L, "qwzx bnm vrtp", "und")
    ).toDF("id", "text", "expected")
    val got = samples.select($"expected", TextOps.langId($"text").as("pred")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
    // and over the corpus: every prediction is a valid code
    val preds = docs.select(TextOps.langId($"text")).distinct().as[String].collect().toSet
    assert(preds.subsetOf(Set("en", "fr", "es", "de", "zh", "und")))
  }
}
