package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BpeOps

/** The merge-table BPE encoder (BpeOps.encode, lowest-rank-first) against
  * the TRAINING segmentation (encodeSequential: each rule once, in rank
  * order) — the equivalence q_bpe_encode's oracle gate relies on, pinned
  * here at a merge-table size two orders beyond the catalog query's 16
  * (the production regime the chained-fold encoder could not reach).
  * The table is produced by a real BPE trainer (pure-Scala mirror of the
  * TextAnalysis loop: max-count pair, ties → lexicographically smaller
  * pair, applied once per round), so it has the part-predates-whole
  * structure the equivalence argument requires. */
class BpeOpsSpec extends AnyFunSuite {

  /** Pure-Scala BPE trainer over a weighted word list (the TextAnalysis
    * recursion without Spark): returns `n` merges in creation order. */
  private def train(
      words: Seq[(String, Long)], n: Int): Seq[(String, String)] = {
    var vocab: Seq[(Array[String], Long)] = words.map { case (w, c) =>
      ((w.map(String.valueOf(_)) :+ BpeOps.EndOfWord).toArray, c)
    }
    val merges = Seq.newBuilder[(String, String)]
    var k = 0
    var exhausted = false
    while (k < n && !exhausted) {
      val counts = new scala.collection.mutable.HashMap[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val (p1, p2) = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head._1
        merges += ((p1, p2))
        vocab = vocab.map { case (syms, c) =>
          val out = new Array[String](syms.length)
          var w = 0
          var s = 0
          while (s < syms.length) {
            if (s < syms.length - 1 && syms(s) == p1 && syms(s + 1) == p2) {
              out(w) = p1 + p2; w += 1; s += 2
            } else { out(w) = syms(s); w += 1; s += 1 }
          }
          (java.util.Arrays.copyOf(out, w), c)
        }
        k += 1
      }
    }
    merges.result()
  }

  /** Deterministic synthetic corpus: repeated morphemes so merges chain
    * deep (multi-char tokens composing into longer ones). */
  private val words: Seq[(String, Long)] = {
    val roots = Seq("inter", "nation", "al", "iz", "ation", "pre", "post",
      "fix", "ing", "ed", "er", "est", "un", "re", "do", "able", "ment",
      "ly", "ness", "ful", "anti", "dis", "establish", "arian")
    val combos = for {
      (a, i) <- roots.zipWithIndex
      (b, j) <- roots.zipWithIndex
      if (i + j) % 3 == 0
    } yield (a + b, (i * 31 + j * 7 + 1).toLong % 97 + 1)
    val triples = for {
      (a, i) <- roots.zipWithIndex
      (b, j) <- roots.zipWithIndex
      if (i * 5 + j) % 11 == 0
    } yield (a + b + roots((i + j) % roots.size), (i + 2L * j + 3) % 41 + 1)
    (roots.map(r => (r, 50L)) ++ combos ++ triples)
      .groupBy(_._1).map { case (w, cs) => (w, cs.map(_._2).sum) }.toSeq
      .sortBy(_._1)
  }

  test("lowest-rank-first encode == training segmentation across a 300-merge table") {
    val merges = train(words, 300)
    assert(merges.size >= 256,
      s"trainer exhausted at ${merges.size} merges — widen the corpus")
    val ranks = BpeOps.rankTable(merges)
    words.foreach { case (w, _) =>
      val fast = BpeOps.encode(w, ranks).toSeq
      val ref = BpeOps.encodeSequential(w, merges).toSeq
      assert(fast == ref, s"word '$w': $fast != $ref")
    }
  }

  test("out-of-vocabulary words still encode identically (the serving-path case)") {
    val merges = train(words, 300)
    val ranks = BpeOps.rankTable(merges)
    val oov = Seq("internationalization", "prefixation", "xyzzy", "a",
      "disestablishmentarianism", "zzzz", "internment", "redoable")
    oov.foreach { w =>
      val fast = BpeOps.encode(w, ranks).toSeq
      val ref = BpeOps.encodeSequential(w, merges).toSeq
      assert(fast == ref, s"oov '$w': $fast != $ref")
    }
  }

  test("edge shapes: single char, repeated chars, marker-only") {
    val merges = train(words, 64)
    val ranks = BpeOps.rankTable(merges)
    Seq("a", "aa", "aaaaaaa", "ee", "ing").foreach { w =>
      assert(BpeOps.encode(w, ranks).toSeq ==
        BpeOps.encodeSequential(w, merges).toSeq, s"edge '$w'")
    }
    // empty word degenerates to the bare marker — nothing to merge
    assert(BpeOps.encode("", ranks).toSeq == Seq(BpeOps.EndOfWord))
  }

  test("rank table keeps the EARLIEST rank for a duplicated pair") {
    val t = BpeOps.rankTable(Seq(("a", "b"), ("c", "d"), ("a", "b")))
    assert(t.get("a\u0000b").intValue == 0 && t.get("c\u0000d").intValue == 1)
  }
}
