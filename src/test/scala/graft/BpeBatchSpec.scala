package graft

import org.apache.spark.sql.functions._

/** The batched BPE trainer must be merge-for-merge BIT-IDENTICAL to the
  * sequential trainer — the batching rule (no-skip symbol-disjoint
  * prefix, self-pair truncation, exclusion-bound tie guard) is an
  * equivalence argument, and this spec is its witness on (a) the gate
  * corpus and (b) an adversarial synthetic vocabulary built to exercise
  * every truncation clause: repeated-letter words (self-pairs), shared
  * symbols at the top of the ranking (prefix stops), and exact count
  * ties across the exclusion boundary.
  */
class BpeBatchSpec extends SparkSuite {

  private def wcOf(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    rows.toDF("w", "n_w")
  }

  private def corpusWc =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n_w"))

  private def run(
      wc: org.apache.spark.sql.DataFrame, n: Int, k: Int) = {
    val (seqM, v1) = queries.TextAnalysis.bpeTrainLoopOver(spark, wc, n)
    val (batM, v2) = queries.TextAnalysis.bpeTrainLoopBatched(spark, wc, n, k)
    val fp = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("w"), col("symstr")).collect()
        .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
    val (f1, f2) = (fp(v1), fp(v2))
    Seq(v1, v2).foreach(Checkpoints.release)
    (seqM, batM, f1, f2)
  }

  test("batched trainer ≡ sequential on the gate corpus") {
    val (seqM, batM, f1, f2) = run(corpusWc, 16, 8)
    assert(batM == seqM,
      s"batched merge table diverged:\n$batM\nvs sequential\n$seqM")
    assert(f1 == f2, "final vocabulary segmentation diverged")
  }

  test("batched trainer ≡ sequential on an adversarial vocabulary") {
    // aaaa: self-pair (a,a) at the top; abab/baba: shared symbols right
    // below it; cdcd/efef: disjoint pairs tied exactly at the exclusion
    // boundary; xy: a strictly-lower tail
    val wc = wcOf(Seq(
      ("aaaa", 50L), ("abab", 40L), ("baba", 40L),
      ("cdcd", 30L), ("efef", 30L), ("cdef", 30L),
      ("xy", 5L), ("yx", 5L), ("aax", 7L)))
    val (seqM, batM, f1, f2) = run(wc, 12, 4)
    assert(batM == seqM,
      s"batched merge table diverged:\n$batM\nvs sequential\n$seqM")
    assert(f1 == f2, "final vocabulary segmentation diverged")
  }
}
