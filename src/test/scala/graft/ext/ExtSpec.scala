package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariants for the dedup / similarity / text operators that the
  * DuckDB oracle can't express directly (planted duplicates, metric
  * properties). */
class ExtSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("test")).withColumn("n_chars", length(col("text")))

  test("minhash LSH finds an exact duplicate pair (jaccard 1.0)") {
    // identical word sets → identical signatures → same bands → verified 1.0
    val d = docs(
      (0L, "spark table scan join filter group merge sort window batch", "en"),
      (1L, "spark table scan join filter group merge sort window batch", "en"),
      (2L, "completely different words entirely unrelated tokens here now", "en"))
    val sigs = Dedup.minhashSignatures(d)
    val s = sigs.collect().map(r => r.getLong(0) -> (1 to 16).map(i => r.getLong(r.fieldIndex(s"m_$i"))))
    assert(s.toMap.apply(0L) == s.toMap.apply(1L))
    assert(s.toMap.apply(0L) != s.toMap.apply(2L))
  }

  test("simhash of identical docs is identical; different docs differ") {
    val d = docs(
      (0L, "spark table scan join filter group merge sort window batch", "en"),
      (1L, "spark table scan join filter group merge sort window batch", "en"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en"))
    val sh = Dedup.simhashes(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) == sh(1L))
    assert(sh(0L) != sh(2L))
  }

  test("graft_dot matches a hand-computed dot product and survives codegen") {
    graft.functions.VectorFunctions.register(spark)
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b").selectExpr("graft_dot(a, b) as d")
    assert(df.head().getDouble(0) == 32.0)
  }

  test("graft_dot rejects non-double arrays at analysis time") {
    graft.functions.VectorFunctions.register(spark)
    val bad = Seq((Array(1, 2), Array(3, 4))).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      bad.selectExpr("graft_dot(a, b)").collect()
    }
  }

  test("dedup clusters: near-dup components share one min-id label, singletons excluded") {
    val out = Dedup.dedupClusters(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(out.nonEmpty)
    // labels are component minima: every label is itself a member doc
    val docs = out.map(_._1).toSet
    assert(out.map(_._2).toSet.subsetOf(docs))
    assert(out.forall { case (doc, label) => label <= doc })
    // consistency with the pair graph: both endpoints of every edge
    // carry the same cluster label
    val labelOf = out.toMap
    val pairs = Dedup.minhashPairs(spark, sfDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.forall { case (a, b) => labelOf(a) == labelOf(b) })
  }

  test("simhash raises on documents beyond the 32767-token lane-packing bound") {
    val ok = docs((0L, Array.fill(32767)("w").mkString(" "), "en"))
    assert(Dedup.simhashes(ok).collect().length == 1) // boundary still computes
    val over = docs((1L, Array.fill(32768)("w").mkString(" "), "en"))
    intercept[Exception] { Dedup.simhashes(over).collect() }
  }

  test("codegen hyperplane bands equal the lambda spec key-for-key") {
    val e = graft.ops.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val viaCodegen = Dedup.hyperplaneBands(e)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    val viaLambda = e.select(col("vec_id"),
      posexplode(array((0 until 4).map(b => expr(Dedup.planeBandSpec(b * 8, 8))): _*))
        .as(Seq("band_idx", "band_key")))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(viaCodegen.nonEmpty && viaCodegen == viaLambda)
  }

  test("embedding near-dup: banded-LSH pairs are a subset of the exact all-pairs result") {
    val exact = Dedup.embeddingNearDupsExact(spark, sfDir)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingNearDups(spark, sfDir)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact),
      s"LSH produced pairs the exact scan did not: ${lsh.diff(exact).take(5)}")
  }

  test("exact dedup groups identical normalized text") {
    val d = docs(
      (0L, "same text here", "en"),
      (1L, "Same Text Here", "en"), // differs only by case → same after lower()
      (2L, "other text", "en"))
    val out = Dedup.exactDedupOn(d).collect()
    assert(out.length == 2)
    val dupGroup = out.find(_.getLong(2) == 2L).get
    assert(dupGroup.getLong(1) == 0L) // keeper = min doc_id
  }

  test("quality filter keeps ~top-75% and never invents rows; near-dedup keeps cluster minima") {
    val docs = graft.ops.Tables.documents(spark, sfDir)
    val n = docs.count()
    val kept = TextAnalysis.qualityFilteredCorpus(spark, sfDir)
    // kept is a subset of the corpus and roughly the top three quartiles
    assert(kept.join(docs, Seq("doc_id"), "left_anti").count() == 0)
    assert(kept.count() >= (n * 70) / 100 && kept.count() <= n)
    // greedy near-dedup: every doc that survives has no smaller near-dup;
    // in particular every minhash-cluster minimum survives
    val cleanedIds = Dedup.cleanedNearCorpus(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    val clusterMinima = Dedup.dedupClusters(spark, sfDir)
      .select("cluster").as[Long].collect().toSet
    assert(clusterMinima.subsetOf(cleanedIds))
  }

  test("IVF train step: means recompute exactly from the assignment on a toy codebook") {
    graft.functions.VectorFunctions.register(spark)
    val step = Similarity.ivfTrainStep(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    assert(step.nonEmpty && step.keys.map(_._2).max == 63) // all 64 dims present
    // membership counts are consistent across dimensions of one centroid
    step.groupBy(_._1._1).foreach { case (_, dims) =>
      assert(dims.values.map(_._2).toSet.size == 1)
    }
    // total membership equals the corpus size (every vector assigned once)
    val total = step.filter(_._1._2 == 0).values.map(_._2).sum
    assert(total == graft.ops.Tables.embeddings(spark, sfDir).count())
  }

  test("multi-step IVF train: every vector stays assigned and the codebook moves") {
    graft.functions.VectorFunctions.register(spark)
    val n = graft.ops.Tables.embeddings(spark, sfDir).count()
    val trained = Similarity.ivfTrain(spark, sfDir, k = 16, steps = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    assert(trained.nonEmpty && trained.keys.map(_._2).max == 63)
    // membership counts are consistent across dims; total = corpus size
    trained.groupBy(_._1._1).foreach { case (_, dims) =>
      assert(dims.values.map(_._2).toSet.size == 1)
    }
    assert(trained.filter(_._1._2 == 0).values.map(_._2).sum == n)
    // three Lloyd iterations move the codebook away from the one-step
    // result (the corpus is random — a fixed point after one step would
    // mean the loop isn't feeding the trained book back in)
    val oneStep = Similarity.ivfTrainStep(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(trained.exists { case (key, (mean, _)) =>
      oneStep.get(key).exists(_ != mean)
    })
  }

  test("text quality: uniq_ratio and stop_ratio are exact fractions") {
    val d = docs((0L, "the the the a word", "en"))
    val q = TextAnalysis.qualityScoresOn(d).head()
    assert(q.getAs[Int]("n_tokens") == 5)
    assert(q.getAs[Int]("n_uniq") == 3)
    assert(q.getAs[Double]("stop_ratio") == 4.0 / 5.0)
  }

  test("language heuristic is deterministic on stopword-heavy text") {
    val d = docs((0L, "the a the a the a the a the a", "xx"))
    assert(TextAnalysis.langIdOn(d).head().getAs[String]("lang_pred") == "en")
  }

  test("shuffle order: a seeded permutation — every doc once, contiguous per-shard positions") {
    val d = docs((0L until 200L).map(i => (i, s"doc number $i", "en")): _*)
    val o = TextAnalysis.shuffleOrderOn(d, nShards = 8).collect()
    assert(o.length == 200 && o.map(_.getLong(0)).toSet.size == 200)
    o.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // deterministic: same seed reproduces the exact order; a different
    // seed permutes differently
    val o2 = TextAnalysis.shuffleOrderOn(d, nShards = 8).collect()
    assert(o.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      o2.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
    val o3 = TextAnalysis.shuffleOrderOn(d, nShards = 8, seed = "other").collect()
    assert(o.map(r => (r.getLong(0), r.getLong(1))).toSet !=
      o3.map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("hash embeddings: unit norm, identical docs get identical vectors") {
    val d = docs(
      (0L, "alpha beta alpha", "en"),
      (1L, "alpha beta alpha", "en"),
      (2L, "gamma", "en"))
    val e = TextAnalysis.hashEmbeddingsOn(d, dim = 8).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq)
      .toMap
    assert(e(0L) == e(1L))                       // determinism: same text → same vector
    assert(e(2L).map(_._3) == Seq(1000000L))     // single token: weight exactly 1
    // unit norm (within the micro-unit floor of each component)
    val n0 = math.sqrt(e(0L).map(x => (x._3 / 1e6) * (x._3 / 1e6)).sum)
    assert(math.abs(n0 - 1.0) < 1e-5)
    // tf of the doubled token is 2 (unless alpha/beta collide in 8 buckets)
    if (e(0L).size == 2) assert(e(0L).map(_._2).sorted == Seq(1L, 2L))
  }

  test("batch perceptron: separable planted corpus converges to zero errors, deterministic") {
    // en docs say "good", others say "bad" — linearly separable unless
    // the two words hash-collide (they don't at dim=8; determinism of
    // md5 makes this a stable pin, not a flaky one)
    val d = docs(
      (0L until 20L).map(i =>
        (i, if (i % 2 == 0) "good signal here" else "bad noise there",
          if (i % 2 == 0) "en" else "xx")): _*)
    val out = TextAnalysis.perceptronTrainOn(d, dim = 8, epochs = 5).collect()
    val errors = out.head.getLong(2)
    assert(out.forall(_.getLong(2) == errors)) // error count constant across rows
    assert(errors == 0L, s"separable corpus should converge, got $errors errors")
    val again = TextAnalysis.perceptronTrainOn(d, dim = 8, epochs = 5).collect()
    assert(out.map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      again.map(r => (r.getInt(0), r.getLong(1))).toSeq)
  }

  test("length buckets: boundary token counts land on the closed upper edge") {
    // 16 tokens → bucket 16 (closed); 17 → bucket 32
    val d = docs(
      (0L, Seq.fill(16)("w").mkString(" "), "en"),
      (1L, Seq.fill(17)("w").mkString(" "), "en"))
    val b = TextAnalysis.lengthBucketsOn(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(b(16L) == ((1L, 0L)))   // exactly full: zero padding
    assert(b(32L) == ((1L, 15L)))  // 17 padded to 32
  }

  test("image near-dup: planted duplicates pair at hamming 0, near-dups at small hamming") {
    def png(edit: Boolean, seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        36, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 36; y <- 0 until 32)
        img.setRGB(x, y, ((x * seed + y * 7) % 200) * 0x010101)
      // touch-up lands ON a sampled cell: the 9x8 nearest-neighbor grid
      // samples x in {0,4,8,...}, y in {0,4,...} of the 36x32 image
      if (edit) img.setRGB(8, 8, 0xFFFFFF)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val media = Seq(
      (0L, "image", png(edit = false, seed = 31)),
      (1L, "image", png(edit = true, seed = 31)),   // near-dup of 0
      (2L, "image", png(edit = false, seed = 113)), // unrelated
      (3L, "image", png(edit = false, seed = 31)))  // exact dup of 0
      .toDF("media_id", "kind", "content")
    val pairs = Multimodal.imageNearDupsOn(media, Multimodal.ImageIoDecoder)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((0L, 3L)) == 0)        // byte-identical → hamming 0
    assert(pairs.contains((0L, 1L)) && pairs((0L, 1L)) > 0 && pairs((0L, 1L)) <= 10)
    assert(pairs((1L, 3L)) == pairs((0L, 1L))) // 3 is 0's twin
    assert(!pairs.keySet.exists { case (a, b) => a == 2L || b == 2L })
    // stub path: identical payload bytes also land at hamming 0
    val stub = Seq(
      (0L, "image", Array.fill[Byte](32)(7)),
      (1L, "image", Array.fill[Byte](32)(7)),
      (2L, "image", Array.tabulate[Byte](32)(i => (i * 41).toByte)))
      .toDF("media_id", "kind", "content")
    val sp = Multimodal.imageNearDupsOn(stub)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(sp((0L, 1L)) == 0 && !sp.contains((0L, 2L)))
  }

  test("audio near-dup: planted jingles pair at hamming 0; sample jitter stays near") {
    // stub-decode path over explicit payloads: identical bytes →
    // identical pcm → hamming 0; one flipped payload byte perturbs the
    // few lag-8 comparisons that read it (small hamming); an unrelated
    // payload must not pair at all.
    // byte 5 (= 196 unsigned) feeds pcm[i] for i ≡ 2 (mod 32); as the
    // LEFT operand its lag-8 partner is byte 29 (= 80): dropping it to
    // 50 crosses that threshold and flips exactly the 4 in-range bits
    // m ∈ {2, 34, 66, 98} — a controlled small-hamming perturbation.
    val base = Array.tabulate[Byte](32)(i => ((i * 37 + 11) % 251).toByte)
    val jitter = base.clone(); jitter(5) = 50.toByte
    val media = Seq(
      (0L, "audio", base),
      (1L, "audio", base.clone()),                              // exact dup
      (2L, "audio", jitter),                                    // 1-byte edit
      (3L, "audio", Array.tabulate[Byte](32)(i => (i * 101 + 3).toByte)))
      .toDF("media_id", "kind", "content")
    val pairs = Multimodal.bandedHammingPairs(
      Multimodal.audioFingerprintsOn(media), maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((0L, 1L)) == 0)
    assert(pairs.contains((0L, 2L)) && pairs((0L, 2L)) > 0 && pairs((0L, 2L)) <= 10,
      s"1-byte jitter must land at small positive hamming: $pairs")
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L })
    // corpus path: the planted jingle rows pair completely
    val k = Multimodal.audioTable(spark, sfDir)
      .filter(col("media_id") % 48 === 1).count()
    val corpus = Multimodal.audioNearDups(spark, sfDir).collect()
    assert(corpus.length == k * (k - 1) / 2,
      s"expected C($k,2) planted pairs, got ${corpus.length}")
    corpus.foreach { r =>
      assert(r.getLong(0) % 48 == 1 && r.getLong(1) % 48 == 1 && r.getInt(2) == 0, r.toString)
    }
  }

  test("frame-level near-dup: videos sharing the planted intro pair; same-video excluded") {
    val frames = Multimodal.videoFrameTable(spark, sfDir)
    // frame keys decompose back to (video, frame)
    val planted = frames.filter(col("media_id") % 1024 === 0)
    assert(planted.count() > 0)
    val pairs = Multimodal.videoFrameNearDups(spark, sfDir).collect()
    assert(pairs.nonEmpty, "the planted intro card must produce cross-video pairs")
    pairs.foreach { r =>
      assert(r.getAs[Long]("media_a") < r.getAs[Long]("media_b"))
      assert(r.getAs[Int]("min_hamming") == 0,
        s"only the byte-identical intro card exists in this corpus: $r")
    }
    // every pair is between intro-planted videos (vid % 24 == 2)
    pairs.foreach { r =>
      assert(r.getAs[Long]("media_a") % 24 == 2 && r.getAs[Long]("media_b") % 24 == 2, r.toString)
    }
    // planted videos pair completely: k intro videos -> k(k-1)/2 pairs
    val k = Multimodal.videoFrameTable(spark, sfDir)
      .filter(expr("media_id % 1024 = 0 AND (media_id DIV 1024) % 24 = 2"))
      .count()
    assert(pairs.length == (k * (k - 1)) / 2, s"expected complete pairing of $k intro videos")
  }

  test("suffix-lcp: planted shared span reports its exact length, capped at 8") {
    val shared6 = "alpha beta gamma delta epsilon zeta"    // 6 words
    val d = docs(
      (0L, s"intro words here $shared6 tail0", "en"),
      (1L, s"$shared6 completely different ending", "en"),
      (2L, "unrelated text with no overlap at all whatsoever", "en"),
      (3L, "x1 " + ("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10") + " y1", "en"),
      (4L, "z1 " + ("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10") + " y2", "en"))
    val out = Dedup.suffixLcpPairsOn(d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getInt(2), r.getLong(3))).toMap
    // docs 0/1 share exactly 6 words => max_lcp 6
    assert(out((0L, 1L))._1 == 6, s"expected lcp 6: ${out.get((0L, 1L))}")
    // docs 3/4 share a 10-word run, but suffixes cap at 8
    assert(out((3L, 4L))._1 == 8, s"expected capped lcp 8: ${out.get((3L, 4L))}")
    // no pair involves the unrelated doc
    assert(!out.keySet.exists { case (a, b) => a == 2L || b == 2L })
  }

  test("quality-aware near-dedup keeps the higher-quality twin, not the lower id") {
    // docs 0/1 share the same word SET (near-dup at jaccard 1.0); doc 1
    // repeats words, so its uniq_ratio — hence quality — is lower. The
    // id-greedy rule would keep 0 anyway; flip the ids to prove quality
    // decides: now the LOWER-quality doc has the LOWER id.
    val rich = "spark table scan join filter group merge sort window batch"
    val d = docs(
      (0L, s"$rich $rich", "en"),  // same word set, half the uniq_ratio
      (1L, rich, "en"),
      (2L, "completely unrelated text that matches nothing else at all", "en"))
    val kept = Dedup.qualityDedupCorpusOn(d).collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L), s"got $kept")
    // sanity: the pair orients 0 < 1, so the id-greedy rule would have
    // dropped doc 1 (the dominated larger id) — the opposite outcome
    val dominated = Dedup.minhashPairsOn(d)
      .select(col("doc_b")).as[Long].collect().toSet
    assert(dominated == Set(1L))
  }

  test("image quality: flat frames flag, brightness is the grid mean luma") {
    def png(rgb: (Int, Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        18, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 18; y <- 0 until 16) img.setRGB(x, y, rgb(x, y, 0))
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val media = Seq(
      (0L, "image", png((_, _, _) => 0x808080)),          // flat mid-gray
      // gradient, not a checkerboard: the 9x8 grid samples only even
      // coordinates of the 18x16 image, which would alias a parity
      // pattern back to a constant
      (1L, "image", png((x, y, _) => (x * 14 % 256) * 0x010101)))
      .toDF("media_id", "kind", "content")
    val q = Multimodal.imageQualityOn(media, Multimodal.ImageIoDecoder)
      .collect().map(r => r.getLong(0) -> r).toMap
    // constant 0x80: luma = (128*299+128*587+128*114)/1000 = 128 exactly
    // (micro-units: floor(1e6 * 128) and zero contrast)
    assert(q(0L).getLong(1) == 128000000L)
    assert(q(0L).getLong(2) == 0L)
    assert(q(0L).getBoolean(3)) // flat
    // gradient: visible contrast (>10 in micro-units), not flat
    assert(q(1L).getLong(2) > 10000000L)
    assert(!q(1L).getBoolean(3))
  }

  test("span excision matches a Scala reference model on random colliding corpora") {
    // Tiny vocabulary + short docs → k-shingles collide across docs
    // naturally; the model recomputes coverage word-by-word, so any
    // interval-merge mistake in the HOF rebuild diverges immediately.
    val k = 8
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d")
    (0 until 10).foreach { trial =>
      val corpus: Seq[(Long, Seq[String])] = (0L until 8L).map { id =>
        id -> Seq.fill(5 + rnd.nextInt(16))(vocab(rnd.nextInt(vocab.size)))
      }
      // model: a position p of doc d is covered iff some k-window of d
      // containing p also occurs (as a word sequence) in ANOTHER doc
      val shingles: Map[String, Set[Long]] = corpus
        .flatMap { case (id, ws) => ws.sliding(k).filter(_.length == k)
          .map(sh => (sh.mkString(" "), id)) }
        .groupBy(_._1).map { case (sh, xs) => sh -> xs.map(_._2).toSet }
      val expected = corpus.map { case (id, ws) =>
        val starts = (0 to ws.length - k).filter { i =>
          val key = ws.slice(i, i + k).mkString(" ")
          ws.length >= k && (shingles(key) - id).nonEmpty
        }
        val kept = ws.zipWithIndex.collect {
          case (w, p) if !starts.exists(s => p >= s && p < s + k) => w
        }
        id -> kept.mkString(" ")
      }.toMap
      val d = docs(corpus.map { case (id, ws) => (id, ws.mkString(" "), "en") }: _*)
      val got = Dedup.spanExcisedCorpusOn(d, k).collect()
        .map(r => r.getLong(0) -> r.getString(r.fieldIndex("kept_text"))).toMap
      assert(got == expected, s"trial $trial: $corpus")
    }
  }

  test("multimodal: real javax.imageio PNG decode runs through the same boundary") {
    // a generated 17x9 PNG (deterministic pixels) — no checked-in binary
    val img = new java.awt.image.BufferedImage(
      17, 9, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 17; y <- 0 until 9) img.setRGB(x, y, (x * 31 + y * 7) << 8)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    val media = Seq(
      (1L, "image", png),
      (2L, "audio", Array.tabulate[Byte](32)(_.toByte)))
      .toDF("media_id", "kind", "content")
    val feats = Multimodal.decodeFeatures(media, Multimodal.ImageIoDecoder)
      .collect().sortBy(_.media_id)
    // the real codec read actual pixel dimensions out of the PNG
    assert(feats(0).width == 17 && feats(0).height == 9)
    assert(feats(0).n_frames == 1 && feats(0).n_bytes == png.length)
    // non-image kinds still flow through the stub, same plumbing
    assert(feats(1) == Multimodal.MediaFeatures(
      2L, "audio", 0 * 256 + 1, 2 * 256 + 3, 4, 5000, 32))
  }

  test("audio chunks: duration-bounded fan-out, exact energy, silence flag, zero-length dropped") {
    import spark.implicits._
    def payload(v: Int) = Array.fill(32)(v.toByte)
    val media = Seq(
      (1L, "audio", payload(50)),   // 50 s → 2 chunks, energy 50 000 (silent)
      (2L, "audio", payload(200)),  // 200 s → 7 chunks, energy 200 000 (voiced)
      (3L, "audio", payload(0)),    // 0 ms → no chunks
      (4L, "video", payload(200))   // non-audio: excluded
    ).toDF("media_id", "kind", "content")
    val out = Multimodal.audioChunksOn(media).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getInt(1))).toMap
    assert(!out.contains(3L) && !out.contains(4L))
    assert(out(1L).length == 2 && out(2L).length == 7)
    assert(out(1L).forall(r => r.getLong(4) == 50000L && r.getBoolean(5)))
    assert(out(2L).forall(r => r.getLong(4) == 200000L && !r.getBoolean(5)))
    // last chunk clamps to the true duration
    assert(out(1L).last.getInt(3) == 50000 && out(1L).last.getInt(2) == 30000)
    assert(out(2L).last.getInt(3) == 200000)
  }

  test("multimodal: stubbed decode plumbing is deterministic and typed") {
    val media = Multimodal.mediaTable(spark, sfDir)
    assert(media.schema("content").dataType.typeName == "binary")
    val feats = Multimodal.decodeFeatures(media).collect()
    assert(feats.length == media.count())
    assert(feats.forall(f => f.n_bytes == 32 && f.width >= 0 && f.width <= 65535))
    // determinism: same input → same features
    val again = Multimodal.decodeFeatures(media).collect()
    assert(feats.sortBy(_.media_id).toSeq == again.sortBy(_.media_id).toSeq)
  }

  test("multimodal: frame sampling only applies to videos") {
    val f = Multimodal.mediaFeatures(spark, sfDir)
    assert(f.filter(col("kind") =!= "video" && col("frame_samples").isNotNull).count() == 0)
    val vid = f.filter(col("kind") === "video" && col("n_frames") >= 4).head()
    val samples = vid.getSeq[Int](vid.fieldIndex("frame_samples"))
    assert(samples.nonEmpty && samples.length <= 6)
  }

  test("pii scrub: planted email/ip/phone are counted and redacted; clean text untouched") {
    val d = docs(
      (0L, "contact alice.smith@example.com or 192.168.1.250 via 555-867-5309 x", "en"),
      (1L, "no personal data in this perfectly ordinary sentence at all", "en"))
    val out = TextAnalysis.piiScrubOn(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    val dirty = out(0L)
    assert(dirty.getInt(dirty.fieldIndex("n_emails")) == 1)
    assert(dirty.getInt(dirty.fieldIndex("n_ips")) == 1)
    assert(dirty.getInt(dirty.fieldIndex("n_phones")) == 1)
    val cleaned = dirty.getString(dirty.fieldIndex("clean_text"))
    assert(cleaned == "contact <EMAIL> or <IP> via <PHONE> x")
    val clean = out(1L)
    assert(clean.getInt(clean.fieldIndex("n_emails")) == 0)
    assert(clean.getString(clean.fieldIndex("clean_text")) ==
      "no personal data in this perfectly ordinary sentence at all")
  }

  test("decontamination: a train doc sharing a 4-gram with the eval slice drops; others keep") {
    // doc 0 is eval (doc_id % 50 == 0); doc 1 shares the 4-gram
    // "alpha beta gamma delta"; doc 2 shares at most 3-grams.
    val d = docs(
      (0L, "alpha beta gamma delta epsilon zeta eta theta", "en"),
      (1L, "totally new prefix alpha beta gamma delta something else", "en"),
      (2L, "alpha beta gamma other delta epsilon words here", "en"))
    val kept = Dedup.decontaminatedCorpusOn(d).collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L))
  }

  test("incremental near-dedup: bloom prefilter is result-neutral vs planted expectations") {
    import spark.implicits._
    // base (src0): one doc; new batch: src10 doc near-dups it (identical
    // word set → jaccard 1.0), src11 doc is unrelated and survives.
    val d = Seq(
      (0L, "spark table scan join filter group merge sort window batch", "en", "src0"),
      (100L, "spark table scan join filter group merge sort window batch", "en", "src10"),
      (101L, "entirely unrelated vocabulary with nothing shared at all here", "en", "src11"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    val kept = Dedup.incrementalCleanedOn(d).collect().map(_.getLong(0)).toSet
    assert(kept == Set(101L))
  }

  test("rule filter: first-hit attribution counts a multi-violation doc exactly once") {
    // doc 0: 5 words AND 0 stopwords AND fully repetitive — violates
    // three rules, must be attributed ONLY to too_short (first in
    // priority). doc 1: long enough, has 'the'+'a', distinct words —
    // survives. doc 2: 31 distinct-ish words with stopwords but
    // dup-frac > 0.6 — attributed to repetitive.
    val d = docs(
      (0L, "word word word word word", "en"),
      (1L, ("the a " + (1 to 40).map(i => s"w$i").mkString(" ")), "en"),
      (2L, ("the a " + Seq.fill(38)("dup").mkString(" ")), "en"))
    val kept = TextAnalysis.ruleFilteredCorpusOn(d).collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L))
    val audit = TextAnalysis.ruleAuditOn(d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(audit("too_short") == (1L, 1L)) // doc 0, attributed here
    assert(audit("low_stopword")._1 == 1L) // doc 0 also violates...
    assert(audit("low_stopword")._2 == 0L) // ...but is not attributed here
    assert(audit("repetitive") == (2L, 1L)) // docs 0+2 violate; only 2 attributed
    assert(audit.values.map(_._2).sum == 2L) // attribution partitions the dropped set
  }

  test("pq: codebook vectors encode to themselves with zero distance") {
    val self = Similarity.pqCodes(spark, sfDir)
      .filter(col("vec_id") < 16).collect()
    assert(self.length == 16 * 8)
    assert(self.forall { r =>
      r.getLong(r.fieldIndex("code_id")) == r.getLong(r.fieldIndex("vec_id")) &&
        r.getDouble(r.fieldIndex("dist")) == 0.0
    })
  }

  test("pq adc top-k: k rows per query, ranked by ascending approximate distance") {
    val rows = Similarity.pqTopK(spark, sfDir).collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.keySet == Set(16L, 17L, 18L, 19L, 20L))
    byQuery.values.foreach { qs =>
      assert(qs.length == 10)
      val ordered = qs.sortBy(_.getInt(3))
      assert(ordered.map(r => r.getDouble(r.fieldIndex("adist"))).toSeq ==
        ordered.map(r => r.getDouble(r.fieldIndex("adist"))).sorted.toSeq)
    }
  }

  test("dup span audit flags cross-doc spans, ignores self-repetition") {
    val shared = "one two three four five six seven eight" // one 8-gram
    val d = docs(
      (0L, s"$shared alpha beta gamma delta epsilon zeta eta theta", "en"),
      (1L, s"prefix padding words here also extra filler stuff $shared", "en"),
      (2L, "totally unrelated text with completely different words here now", "en"),
      // the SAME 8-gram twice within one doc — not a cross-doc dup
      (3L, "a b c d e f g h ZZZ a b c d e f g h", "en"))
    val out = Dedup.dupSpanAuditOn(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // docs 0 and 1 each contain the shared span exactly once
    assert(out(0L)._2 == 1L && out(1L)._2 == 1L)
    assert(out(2L)._2 == 0L)
    // doc 3: 10 spans, 2 of them the repeated self-gram — zero flagged
    assert(out(3L) == ((10L, 0L)))
    // span counts: doc 0 has 16 words → 9 spans
    assert(out(0L)._1 == 9L)
    // a doc shorter than k emits no row at all
    val short = Dedup.dupSpanAuditOn(docs((9L, "only seven words in this doc here", "en")))
    assert(short.count() == 0L)
  }

  test("span-cleaned corpus drops mostly-boilerplate docs, keeps short ones") {
    val boiler = "one two three four five six seven eight nine ten"
    val d = docs(
      (0L, boiler, "en"),                       // 3 spans, all shared → dropped
      (1L, s"$boiler eleven twelve thirteen fourteen fifteen sixteen seventeen", "en"),
      // ^ 10 spans, 3 shared → 6/10 not > 1/2... 3*2=6 !> 10 → kept
      (2L, "totally unrelated words that never repeat anywhere else here", "en"),
      (3L, "tiny doc", "en"))                   // no spans → kept
    val kept = Dedup.spanCleanedCorpusOn(d).collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L))
  }

  test("span-excised corpus cuts the duplicated span, keeps the remainder") {
    val shared = "one two three four five six seven eight" // exactly one 8-gram
    val d = docs(
      (0L, s"$shared alpha beta gamma", "en"),   // span at pos 0 → keep tail 3 words
      (1L, s"pre amble $shared post", "en"),     // span at pos 2 → keep 'pre amble' + 'post'
      (2L, "totally unrelated text with completely different words here now", "en"),
      (3L, shared, "en"),                        // doc IS the span → empty remainder
      (4L, "tiny doc", "en"))                    // shorter than k → untouched
    val out = Dedup.spanExcisedCorpusOn(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size == 5) // a transform, not a filter: every doc keeps a row
    def text(id: Long) = out(id).getString(out(id).fieldIndex("kept_text"))
    def kw(id: Long) = out(id).getLong(out(id).fieldIndex("kept_words"))
    assert(text(0L) == "alpha beta gamma" && kw(0L) == 3L)
    assert(text(1L) == "pre amble post" && kw(1L) == 3L)
    assert(text(2L) == "totally unrelated text with completely different words here now")
    assert(text(3L) == "" && kw(3L) == 0L &&
      out(3L).getLong(out(3L).fieldIndex("kept_chars")) == 0L)
    assert(text(4L) == "tiny doc" && kw(4L) == 2L)
    // accounting: n_words reflects the ORIGINAL length
    assert(out(3L).getLong(out(3L).fieldIndex("n_words")) == 8L)
    // overlapping duplicated spans merge their coverage: two docs share
    // a 9-word run → two overlapping 8-gram spans, excised as one block
    val o = docs(
      (10L, "z1 one two three four five six seven eight nine z2", "en"),
      (11L, "one two three four five six seven eight nine", "en"))
    val ex = Dedup.spanExcisedCorpusOn(o).collect().map(r => r.getLong(0) -> r).toMap
    assert(ex(10L).getString(ex(10L).fieldIndex("kept_text")) == "z1 z2")
    assert(ex(11L).getString(ex(11L).fieldIndex("kept_text")) == "")
  }

  test("dsir: docs made of target-corpus words outscore off-target docs") {
    // target (en) vocabulary dominates docs 0-2; doc 3 reuses ONLY the
    // en vocabulary (an on-target doc that merely isn't labeled en —
    // exactly what DSIR is for: selection by content, not by label);
    // doc 4 is off-target vocabulary. logw(3) must exceed logw(4).
    val d = docs(
      (0L, "the cat sat on the mat and the dog ran", "en"),
      (1L, "the dog sat on the mat and the cat ran", "en"),
      (2L, "the cat and the dog sat on the mat", "en"),
      (3L, "the cat the dog the mat", "xx"),
      (4L, "zorp blek fnord quux zix blek zorp", "xx"))
    val out = TextAnalysis.dsirWeightsOn(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    def w(id: Long) = out(id).getLong(out(id).fieldIndex("logw_micro"))
    def sel(id: Long) = out(id).getBoolean(out(id).fieldIndex("selected"))
    assert(w(3L) > w(4L),
      s"on-target vocabulary must outscore off-target: ${w(3L)} vs ${w(4L)}")
    assert(!sel(4L), "the off-target doc cannot be in the selected quartile")
    // DSIR weights are RELATIVE (the raw distribution includes the
    // target, so absolute sign is meaningless); the defining property
    // is ordering: every on-target-vocabulary doc beats the off-target
    // one by a wide margin
    Seq(0L, 1L, 2L, 3L).foreach(id =>
      assert(w(id) > w(4L) + 1000000, s"doc $id: ${w(id)} vs off-target ${w(4L)}"))
  }
}
