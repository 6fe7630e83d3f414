package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Measured LSH recall vs the exact (unregistered) baselines — turning
  * the banding-math predictions in [[Dedup]]'s docs into tested numbers.
  * Both LSH families verify the TRUE similarity on candidates (word-set
  * Jaccard / exact cosine), so their outputs are exact-baseline subsets
  * and recall is well-defined: |lsh| / |exact|. Hash families and
  * hyperplanes are deterministic and the corpora fixed, so every
  * measured recall is a fixed number, not a random draw — the pins are
  * exact-regression guards, the floors are the banding theory.
  *
  * Banding math (where the floors come from):
  *  - MinHash 2 bands × 8 rows: P(candidate | jaccard s) = 1-(1-s⁸)²;
  *    at the s = 0.9 verify threshold that is 0.675, rising steeply
  *    (s = 0.95 → 0.874, s = 1.0 → 1.0).
  *  - Hyperplane LSH 4 bands × 8 planes: a pair at angle θ agrees on one
  *    plane w.p. 1-θ/π, so P(candidate | cos c) = 1-(1-(1-θ/π)⁸)⁴;
  *    cos 0.95 → 0.891 (the docstring's p ≈ 0.89), cos 0.9 → 0.743,
  *    cos 0.4 → 0.097 — the sub-threshold tail is sacrificed by design.
  */
class RecallSpec extends SparkSpec {
  import spark.implicits._

  private val sf001 = "/root/testdata/sf0.01"

  test("minhash LSH recall vs exact Jaccard >= 0.9 meets the 2x8 banding floor") {
    val exact = Dedup.minhashPairsExact(spark, sf001)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashPairs(spark, sf001)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact),
      s"verified LSH pairs must be exact-baseline subset; extras: ${lsh.diff(exact).take(5)}")
    assert(exact.nonEmpty, "corpus has no true near-dup pairs; recall undefined")
    val recall = lsh.size.toDouble / exact.size
    info(f"minhash recall = ${lsh.size}/${exact.size} = $recall%.4f")
    // 0.675 is the banding probability AT the 0.9 boundary (the worst
    // stratum); measured on the sf0.01 corpus: 1943/2359 = 0.8237.
    assert(recall >= 0.675, f"recall $recall%.4f below 2x8-banding floor 0.675")
    assert(recall >= 0.82, f"recall $recall%.4f regressed below the measured 0.8237 pin")
  }

  test("embedding LSH recall on the corpus tail matches the 4x8 banding prediction") {
    // The driver corpus's true cos>=0.4 pairs all sit in 0.4..0.55 —
    // the near-orthogonal tail where 4x8 banding predicts only ~10-18%
    // catch probability. Low tail recall is the DESIGN (banding spends
    // its candidate budget on near-dups); this test pins that the
    // realized value sits where the math says, not at zero.
    val exact = Dedup.embeddingNearDupsExact(spark, sf001)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingNearDups(spark, sf001)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact))
    assert(exact.nonEmpty, "corpus has no true cos>=0.4 pairs; recall undefined")
    val recall = lsh.size.toDouble / exact.size
    info(f"embedding recall (cos>=0.4 tail) = ${lsh.size}/${exact.size} = $recall%.4f")
    // theory at the 0.4 boundary = 0.097; measured: 6/59 = 0.1017
    assert(recall >= 0.09, f"tail recall $recall%.4f below the 0.4-boundary prediction 0.097")
  }

  test("simhash block-banding catches planted Hamming<=8 pairs at the analytical per-stratum rate") {
    // Hamming distance can't be controlled through text, so the planted
    // pairs feed the banding+verify stage directly: 400 base 60-bit
    // hashes per stratum h ∈ 1..8, each with a twin at EXACTLY h flipped
    // bits (positions uniform). 4 blocks × 15 bits catch a pair iff at
    // least one block contains no flipped bit; with positions uniform
    // that probability is inclusion-exclusion over clean blocks:
    //   P(h) = [4·C(45,h) − 6·C(30,h) + 4·C(15,h)] / C(60,h)
    // (h=1 → 1.0, h=4 → 0.896, h=8 → 0.323 — the sacrificed worst
    // stratum). Seeded PRNG → every measured rate is a fixed number.
    val rnd = new scala.util.Random(7)
    def comb(n: Int, k: Int): Double =
      if (k > n) 0.0 else (0 until k).map(i => (n - i).toDouble / (i + 1)).product
    def analytical(h: Int): Double =
      (4 * comb(45, h) - 6 * comb(30, h) + 4 * comb(15, h)) / comb(60, h)
    val perH = 1500
    val planted = (1 to 8).flatMap { h =>
      (0 until perH).map { i =>
        val base = rnd.nextLong() & ((1L << 60) - 1)
        val twin = rnd.shuffle((0 until 60).toList).take(h)
          .foldLeft(base)((v, b) => v ^ (1L << b))
        val id = (h * perH + i).toLong * 2
        (h, id, base, twin)
      }
    }
    val sh = planted.flatMap { case (_, id, b, t) => Seq((id, b), (id + 1, t)) }
      .toDF("doc_id", "simhash")
    val pairs = Dedup.simhashPairsFromHashes(sh, maxHamming = 8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    (1 to 8).foreach { h =>
      val caught = planted.filter(_._1 == h)
        .count { case (_, id, _, _) => pairs.contains((id, id + 1)) }
      val recall = caught.toDouble / perH
      val theory = analytical(h)
      info(f"simhash planted recall h=$h: $caught/$perH = $recall%.4f (theory $theory%.4f)")
      // binomial sd at n=1500 is <= 0.013; 0.05 is ~4 sd (the seed is
      // fixed, so this is an exact regression pin with noise headroom)
      assert(math.abs(recall - theory) <= 0.05,
        f"h=$h recall $recall%.4f deviates from the 4x15-banding analysis $theory%.4f")
    }
  }

  test("simhash LSH recall vs the exact Hamming<=8 all-pairs baseline on the corpus") {
    val sh = Dedup.simhashes(graft.ops.Tables.documents(spark, sf001))
    val a = sh.select(col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
    val b = sh.select(col("doc_id").as("doc_b"), col("simhash").as("sh_b"))
    val exact = a.join(b, col("doc_a") < col("doc_b"))
      .filter(bit_count(col("sh_a").bitwiseXOR(col("sh_b"))) <= 8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.simhashPairs(spark, sf001)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact),
      s"verified simhash pairs must be exact-baseline subset; extras: ${lsh.diff(exact).take(5)}")
    assert(exact.nonEmpty, "corpus has no Hamming<=8 pairs; recall undefined")
    val recall = lsh.size.toDouble / exact.size
    info(f"simhash corpus recall = ${lsh.size}/${exact.size} = $recall%.4f")
    // 0.323 is the analytical catch rate at the h=8 boundary stratum —
    // the floor for ANY distance mix; near-dup text clusters sit at
    // much lower h, so the measured value should clear it comfortably.
    assert(recall >= 0.323, f"recall $recall%.4f below the h=8 banding floor 0.323")
  }

  test("embedding LSH catches planted cos-0.95 near-dups at the predicted ~0.89 rate") {
    // The corpus has no high-cos pairs, so the headline claim needs a
    // planted one: 200 base vectors, each with an exact-cos-0.95 twin
    // (twin = 0.95·u + sqrt(1-0.95²)·w with w ⊥ u unit — cosine is
    // exactly 0.95 by construction). Seeded PRNG + deterministic
    // hyperplanes → the measured recall is a fixed number.
    val rnd = new scala.util.Random(42)
    val dim = 64
    val c = 0.95
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val rows = (0 until 200).flatMap { i =>
      val u = unit(Array.fill(dim)(rnd.nextGaussian()))
      val w0 = Array.fill(dim)(rnd.nextGaussian())
      val proj = u.indices.map(j => u(j) * w0(j)).sum
      val w = unit(u.indices.map(j => w0(j) - proj * u(j)).toArray)
      val twin = u.indices.map(j => c * u(j) + math.sqrt(1 - c * c) * w(j)).toArray
      Seq((2L * i, u), (2L * i + 1, twin))
    }
    val e = rows.toDF("vec_id", "v")
    val lsh = Dedup.embeddingNearDupsOn(e, minCos = 0.9)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val caught = (0 until 200).count(i => lsh.contains((2L * i, 2L * i + 1)))
    val recall = caught / 200.0
    info(f"planted cos-0.95 recall = $caught/200 = $recall%.4f (theory 0.891)")
    assert(recall >= 0.80, f"planted recall $recall%.4f well below the 0.891 prediction")
  }

  test("IVFADC recovers same-cluster neighbors on a clustered corpus") {
    // IVFADC's claim is CONDITIONAL on coarse structure existing: the
    // trained coarse quantizer routes queries to the right inverted
    // list, residuals are then small, and ADC ranks within the list.
    // (On the registered near-uniform random corpus the claim is only
    // determinism — neighbor gaps there are smaller than any 4-bit
    // quantizer's error, which is why this spec plants 16 tight
    // clusters instead: seeded PRNG => exact regression pin.)
    // id scheme: vec_id = member*16 + cluster, so the trainer's seeds
    // (vec_id < 16) land one per cluster and Lloyd locks onto centers.
    val rnd = new scala.util.Random(7)
    val dim = 64
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val centers = Array.fill(16)(unit(Array.fill(dim)(rnd.nextGaussian())))
    val rows = for (m <- 0 until 30; cl <- 0 until 16) yield {
      val v = unit(centers(cl).map(_ + 0.1 * rnd.nextGaussian()))
      (m.toLong * 16 + cl, v)
    }
    val e = Similarity.vecsOf(spark, rows.toDF("vec_id", "v"))
    // queries = member-1 of every cluster (vec_id in [16, 32))
    val adc = Similarity.ivfPqTopKOn(e, nprobe = 2, k = 3, qLo = 16, qHi = 32)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id")))
    assert(adc.length == 16 * 3)
    val sameCluster = adc.count { case (q, c) => q % 16 == c % 16 }
    info(s"IVFADC same-cluster hits = $sameCluster/${adc.length}")
    // nprobe=2 also probes one wrong list, but its candidates' ADC
    // distances carry the full inter-center gap — same-cluster must win
    assert(sameCluster == adc.length,
      s"IVFADC leaked cross-cluster results: ${adc.filterNot { case (q, c) => q % 16 == c % 16 }.take(5).toSeq}")
  }

  test("SQ8 top-k agrees with the exact brute-force ranking almost everywhere") {
    // 8-bit midpoint dequantization perturbs each cosine by O(range/256)
    // per dim — far below typical neighbor gaps, so the quantized top-3
    // should reproduce the exact top-3 nearly verbatim. Deterministic
    // corpus => this is an exact regression pin, not a flaky bound.
    val exact = Similarity.bruteForceTopK(spark, sf001, k = 3).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))).toSet
    val sq8 = Similarity.sq8TopK(spark, sf001, k = 3).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))).toSet
    val overlap = (exact intersect sq8).size / exact.size.toDouble
    info(f"SQ8 top-3 overlap with exact = $overlap%.4f")
    assert(exact.size == 30 && sq8.size == 30)
    assert(overlap >= 0.8, f"SQ8 ranking degraded: overlap $overlap%.4f")
  }

  test("dim-truncation audit: full-width prefix is the identity, overlap grows with width") {
    // d = 64 is the whole vector → overlap EXACTLY 10^6 (identity pin);
    // the registered 8/16/32 sweep must be monotone non-decreasing —
    // more prefix can only add information on this deterministic corpus.
    val full = Similarity.dimTruncationAudit(spark, sf001, dims = Seq(64)).collect().head
    assert(full.getAs[Long]("overlap_micro") == 1000000L &&
      full.getAs[Long]("hits") == 50L)
    val sweep = Similarity.dimTruncationAudit(spark, sf001).collect()
      .map(r => r.getAs[Int]("dim") -> r.getAs[Long]("overlap_micro")).sortBy(_._1)
    info(sweep.map { case (d, m) => s"d=$d: ${m / 10000.0}%" }.mkString(", "))
    assert(sweep.map(_._1).sameElements(Array(8, 16, 32)))
    assert(sweep.sliding(2).forall { case Array((_, a), (_, b)) => a <= b })
  }
}
