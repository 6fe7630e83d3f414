package graft.ext

import graft.SparkSpec

/** Lineage contract for the BPE training loop (r8): each merge stacks
  * one `replace` projection onto the histogram plan, so a realistic
  * k needs periodic `localCheckpoint` truncation or the driver drowns
  * in plan-tree work. These tests pin (a) a k = 50 run completing with
  * the full merge table — impossible to sit through with an unbounded
  * 50-layer plan re-analyzed 50 times — and (b) checkpoint cadence
  * being invisible to results. */
class BpeTrainSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  // One 62-symbol word (a-z, A-Z, 0-9): 61 distinct adjacent pairs, every
  // count equal, so 50 merges always exist and the (n desc, pair asc)
  // argmax is fully deterministic.
  private def longCorpus = {
    import spark.implicits._
    val word = (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9')).mkString
    Seq((0L, word)).toDF("doc_id", "text")
  }

  test("k=50 training completes with bounded plan depth and a full merge table") {
    val out = TextAnalysis.bpeTrainOn(longCorpus, steps = 50).collect()
    assert(out.length == 50)
    assert(out.map(_.getInt(0)).toSeq == (1 to 50))
    // every merge on this corpus joins two adjacent symbols exactly once
    out.foreach(r => assert(r.getLong(2) == 1L))
  }

  test("checkpoint cadence does not change the merge table") {
    val every1 = TextAnalysis.bpeTrainOn(longCorpus, steps = 12, checkpointEvery = 1)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    val never = TextAnalysis.bpeTrainOn(longCorpus, steps = 12, checkpointEvery = 1000)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(every1 == never)
  }

  test("checkpointed run still exhausts gracefully on a tiny corpus") {
    import spark.implicits._
    // "ab" admits exactly one merge; steps=10 must stop at 1 row even
    // with the checkpoint path active from step 1.
    val docs = Seq((0L, "ab")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTrainOn(docs, steps = 10, checkpointEvery = 1).collect()
    assert(out.length == 1)
    assert(out.head.getString(1) == "a b")
  }

  test("encode applies trained merges in order with per-doc accounting") {
    import spark.implicits._
    // "ab ab cd": merges train as step1 'a b' (n=2), step2 'c d' (n=1).
    val docs = Seq((0L, "ab ab cd")).toDF("doc_id", "text")
    // full table: every word compresses to one token
    val full = TextAnalysis.bpeEncodeOn(docs, steps = 2).collect().head
    assert((full.getLong(1), full.getLong(2), full.getLong(3)) == ((3L, 3L, 6L)))
    // truncated table (step 1 only): cd stays two symbols
    val partial = TextAnalysis.bpeEncodeOn(docs, steps = 1).collect().head
    assert((partial.getLong(1), partial.getLong(2), partial.getLong(3)) == ((3L, 4L, 6L)))
    // encoding is vocab-level: repeated words cost one encode, and the
    // join-back multiplies per occurrence — 10 repeats, same per-word tokens
    val rep = Seq((1L, Seq.fill(10)("ab").mkString(" "))).toDF("doc_id", "text")
    val r = TextAnalysis.bpeEncodeOn(rep, steps = 1).collect().head
    assert((r.getLong(1), r.getLong(2)) == ((10L, 10L)))
  }

  test("greedy encode matches the replace-fold path away from same-symbol runs") {
    import spark.implicits._
    // varied words, no symbol run >= 5 — the two application orders agree
    val docs = Seq(
      (0L, "spark batch window table scan"),
      (1L, "spark table scan scan window"),
      (2L, "filter join merge sort batch spark")).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows(TextAnalysis.bpeEncodeGreedyOn(docs, steps = 8)) ==
      rows(TextAnalysis.bpeEncodeOn(docs, steps = 8)))
    // k=50: the greedy path's plan is k-independent (one mapPartitions),
    // so a tokenizer-sized table encodes without plan blowup — and the
    // 62-symbol word compresses by exactly the 50 applied merges
    val out = TextAnalysis.bpeEncodeGreedyOn(longCorpus, steps = 50).collect().head
    assert(out.getLong(2) == 62L - 50L) // n_tokens
    assert(out.getLong(3) == 62L)       // n_symbols
  }

  test("greedy/fold encode equivalence holds on randomized run-free corpora") {
    import spark.implicits._
    // Randomized (seeded) corpora over a small alphabet, words capped
    // at 8 symbols with no adjacent repeats: the documented divergence
    // needs a same-symbol run >= 5, which can't form — single chars
    // never repeat adjacently by construction, and a run of k merged
    // symbols needs word length >= 2k+2. Within that domain the two
    // application orders must agree EXACTLY, for any trained table.
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val words = Seq.fill(40) {
        val len = 3 + rnd.nextInt(6)
        val sb = new StringBuilder
        var last = ' '
        while (sb.length < len) {
          val c = ('a' + rnd.nextInt(6)).toChar
          if (c != last) { sb.append(c); last = c }
        }
        sb.toString
      }
      val docs = words.grouped(10).zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
        .toDF("doc_id", "text")
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val steps = 6 + trial * 4
      assert(rows(TextAnalysis.bpeEncodeGreedyOn(docs, steps)) ==
        rows(TextAnalysis.bpeEncodeOn(docs, steps)),
        s"divergence at trial=$trial steps=$steps seed=42")
    }
  }

  test("train split is deterministic, exhaustive, and respects percentages") {
    import spark.implicits._
    val docs = (0L until 200L).map(i =>
      (i, s"w$i text", if (i % 3 == 0) "en" else "de", "src", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val a = TextAnalysis.trainSplitOn(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val b = TextAnalysis.trainSplitOn(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(a == b) // same corpus → identical assignment, run to run
    assert(a.toSeq.map(_._3).sum == 200L) // every doc lands somewhere
    val bySplit = a.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"))
    // zero-width splits collapse to train-only
    val only = TextAnalysis.trainSplitOn(docs, testPct = 0, valPct = 0)
      .select("split").distinct().collect().map(_.getString(0)).toSeq
    assert(only == Seq("train"))
  }
}
