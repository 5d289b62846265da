package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The reference engine's entire operator surface, re-expressed Spark-first.
  *
  * Reference semantics preserved (SURVEY.md §2.2):
  *  - tokenize = whitespace split, case-sensitive, punctuation attached
  *    (reference WordCount.java:28-32, TopkCommonWords.java:64-68 —
  *    `StringTokenizer` default delimiters);
  *  - stopword removal = exact string match against a broadcast side list
  *    (TopkCommonWords.java:37-57,70-73);
  *  - "common" = word present in both corpora post-filter
  *    (TopkCommonWords.java:114-118) — an equi-inner-join, NOT the
  *    reference's fragile reducer parity trick;
  *  - rank value = max (code-as-written, TopkCommonWords.java:112) or min
  *    (course-spec variant, golden answer1.txt) of the per-corpus counts;
  *  - top-k order = count desc, word desc on ties, k rows
  *    (TopkCommonWords.java:123,131,144).
  *
  * Scale notes vs the reference:
  *  - the reference funnels ALL (word,count) pairs to one reducer via a
  *    constant key (TopkCommonWords.java:91-92); we rely on Catalyst planning
  *    `orderBy(...).limit(k)` as `TakeOrderedAndProject` — a per-partition
  *    size-k heap merged on the driver, so the global step moves k rows per
  *    partition, not the vocabulary;
  *  - counts are LongType end-to-end (the reference's IntWritable overflows
  *    past 2^31, WordCount.java:42-45);
  *  - map-side partial aggregation (the reference's combiner,
  *    WordCount.java:56) is HashAggregateExec partial mode — automatic.
  */
object TextOps {

  /** Whitespace-only split; `StringTokenizer`'s default delimiter class
    * " \t\n\r\f" is a subset of `\s`. Empty strings (leading separators)
    * are dropped, matching StringTokenizer which never emits empty tokens. */
  val TokenSplitRegex = "\\s+"

  /** 1→N generator: one output row per token, keeping `keep` columns.
    * Catalyst plans this as Generate(explode) — fully codegen'd; no UDTF. */
  def tokenize(df: DataFrame, text: Column, keep: Seq[Column] = Nil): DataFrame =
    df.select(keep :+ explode(split(text, TokenSplitRegex)).as("word"): _*)
      .filter(length(col("word")) > 0)

  /** Word frequency per group columns (empty group = global word count).
    * Partial/final hash aggregation split is automatic. */
  def wordCount(tokens: DataFrame, extraKeys: Seq[String] = Nil): DataFrame =
    tokens.groupBy((extraKeys :+ "word").map(col): _*).agg(count(lit(1)).as("n"))

  /** Q1 WordCount end-to-end: text file(s) → word → (word, n) sorted asc.
    * The reference gets the ascending sort for free from the single-reducer
    * shuffle (SURVEY.md O13); in Spark it must be explicit. */
  def wordCountPipeline(lines: Dataset[String]): DataFrame =
    wordCount(tokenize(lines.toDF("line"), col("line"))).orderBy("word")

  /** Broadcast anti-semi-join against a small stopword set — the analog of
    * the reference's DistributedCache side-file (TopkCommonWords.java:170).
    * For a genuinely small list a broadcast variable inside `isin`/`filter`
    * would also work, but a broadcast left_anti JOIN keeps the op relational
    * (plan shows BroadcastHashJoin LeftAnti) and scales to stopword lists
    * too big for a literal expression. */
  def removeStopwords(tokens: DataFrame, stopwords: DataFrame): DataFrame =
    tokens.join(broadcast(stopwords.select(col("word"))), Seq("word"), "left_anti")

  /** Q2 TopkCommonWords: per-corpus counts → inner join on word →
    * max|min merge → top-k (count desc, word desc). */
  def topKCommon(
      wcA: DataFrame, wcB: DataFrame, k: Int, useMax: Boolean): DataFrame = {
    val a = wcA.select(col("word"), col("n").as("n_a"))
    val b = wcB.select(col("word"), col("n").as("n_b"))
    val merge = if (useMax) greatest(col("n_a"), col("n_b"))
                else least(col("n_a"), col("n_b"))
    a.join(b, Seq("word"), "inner")
      .select(merge.as("n"), col("word"))
      .orderBy(desc("n"), desc("word"))
      .limit(k)
  }

  /** Full Q2 pipeline from raw line datasets + stopword list. */
  def topKCommonPipeline(
      spark: SparkSession,
      linesA: Dataset[String],
      linesB: Dataset[String],
      stopwords: Seq[String],
      k: Int = 20,
      useMax: Boolean = true): DataFrame = {
    import spark.implicits._
    val stop = stopwords.toDF("word")
    def counts(lines: Dataset[String]): DataFrame =
      wordCount(removeStopwords(tokenize(lines.toDF("line"), col("line")), stop))
    topKCommon(counts(linesA), counts(linesB), k, useMax)
  }

  /** O14 text sink: `key<TAB>value` lines, the reference's TextOutputFormat
    * (WordCount.java:61). One line per row, tab-separated, no header. */
  def writeTabText(df: DataFrame, outDir: String): Unit =
    df.select(concat_ws("\t", df.columns.map(col).toIndexedSeq: _*).as("value"))
      .write.mode("overwrite").text(outDir)
}
