package graft.operators

/** BPE ENCODING against a rank-ordered merge table — the serving-path
  * kernel behind q_bpe_encode.
  *
  * r14 encoded by CHAINING one map-only `aggregate(...)` fold per merge
  * with the pair baked in as literals — correct and all-codegen at 16
  * merges, but the plan grows one projection PER RULE: a production
  * tokenizer has 32k merges, and 32k chained HOF projections blow up
  * analysis time and codegen size long before execution starts (measured
  * at 256/1024 merges, SCALE.md §26). This kernel instead carries the
  * WHOLE table as one hash map per partition and encodes each word by
  * the canonical lowest-rank-first iteration — O(len²) table lookups per
  * word, INDEPENDENT of table size.
  *
  * Equivalence to training (the property the oracle gate proves): the
  * training segmentation of a word is "apply merge 1..N in creation
  * order, once each, left-to-right" (a pair matching rule r that only
  * appears after rule k > r ran is never merged in training). The
  * lowest-rank-first iteration gives the same result for any table
  * produced by BPE training, because a rule's PARTS always predate the
  * rule itself: a merge can only create pairs involving its output
  * token, and every rule consuming that token was learned later (higher
  * rank) — so no merge ever creates a pair that an earlier-ranked rule
  * would have claimed, and applying rules in rank order one-at-a-time ≡
  * once-each in sequence. (BpeOpsSpec checks the two implementations
  * against each other across a real trained table; the q_bpe_encode
  * oracle re-derives the training recursion independently in SQL.)
  *
  * This is a deliberate mapPartitions seam (the "(d) last resort" tier):
  * a 32k-rule sequential rewrite system is not expressible as a
  * bounded-size Catalyst expression tree — the tree would scale with the
  * RULE COUNT, which is exactly the failure being replaced. The frame it
  * maps over is the (lang, word) VOCABULARY (Heaps-bounded metadata ≪
  * corpus); every corpus-sized pass around it stays declarative.
  */
object BpeOps {

  /** End-of-word marker, the trainer's convention (TextAnalysis). */
  val EndOfWord = "</w>"

  // NUL can never occur inside a symbol (symbols are whitespace-split
  // word chars + the marker), so the joined key is collision-free
  private def key(p1: String, p2: String): String = p1 + "\u0000" + p2

  /** Pair → rank lookup table (lower rank = earlier merge = higher
    * priority). Build once per partition, share across rows. Values are
    * EXPLICIT java.lang.Integer: a HashMap[String, Int] in Scala unboxes
    * an absent key's null to 0 — every unknown pair would read as the
    * highest-priority rule. */
  def rankTable(
      merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((p1, p2), r) =>
      // first occurrence wins, matching training (a duplicate rule at a
      // later rank can never fire: its pair is consumed by the earlier)
      m.putIfAbsent(key(p1, p2), Integer.valueOf(r))
    }
    m
  }

  /** Encode one word: initial symbols = chars + [[EndOfWord]], then
    * repeatedly merge ALL occurrences (left-to-right) of the
    * lowest-ranked pair present until no adjacent pair is in the table.
    * Returns the final symbol sequence. */
  def encode(
      word: String, ranks: java.util.HashMap[String, Integer]): Array[String] = {
    var syms = new Array[String](word.length + 1)
    var i = 0
    while (i < word.length) { syms(i) = String.valueOf(word.charAt(i)); i += 1 }
    syms(word.length) = EndOfWord
    var done = syms.length <= 1
    while (!done) {
      // lowest-ranked adjacent pair present in the table
      var best = Int.MaxValue
      var j = 0
      while (j < syms.length - 1) {
        val r: Integer = ranks.get(key(syms(j), syms(j + 1)))
        if ((r ne null) && r.intValue < best) best = r.intValue
        j += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        // merge every occurrence of that pair, left-to-right; the merged
        // token can never re-match the same rule on either side (its
        // name differs from both parts), so a single pass suffices
        var bp1: String = null
        var bp2: String = null
        // recover the pair from the winning position (first occurrence)
        var k = 0
        while (bp1 == null) {
          val r: Integer = ranks.get(key(syms(k), syms(k + 1)))
          if ((r ne null) && r.intValue == best) {
            bp1 = syms(k); bp2 = syms(k + 1)
          }
          k += 1
        }
        val out = new Array[String](syms.length)
        var w = 0
        var s = 0
        while (s < syms.length) {
          if (s < syms.length - 1 && syms(s) == bp1 && syms(s + 1) == bp2) {
            out(w) = bp1 + bp2; w += 1; s += 2
          } else { out(w) = syms(s); w += 1; s += 1 }
        }
        syms = java.util.Arrays.copyOf(out, w)
        if (syms.length <= 1) done = true
      }
    }
    syms
  }

  /** Reference implementation of the TRAINING segmentation (apply each
    * rule once, in rank order, left-to-right) — O(N·len); used by
    * BpeOpsSpec to pin the equivalence [[encode]] relies on. */
  def encodeSequential(
      word: String, merges: Seq[(String, String)]): Array[String] = {
    var syms: Array[String] =
      (word.map(String.valueOf(_)) :+ EndOfWord).toArray
    merges.foreach { case (p1, p2) =>
      if (syms.length > 1) {
        val out = new Array[String](syms.length)
        var w = 0
        var s = 0
        while (s < syms.length) {
          if (s < syms.length - 1 && syms(s) == p1 && syms(s + 1) == p2) {
            out(w) = p1 + p2; w += 1; s += 2
          } else { out(w) = syms(s); w += 1; s += 1 }
        }
        syms = java.util.Arrays.copyOf(out, w)
      }
    }
    syms
  }
}
