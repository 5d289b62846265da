package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: the BPE ENCODER at production merge counts (SCALE.md §27).
  *
  *   sbt "runMain graft.BpeScale [sfDir] [merges...]"
  *
  * Trains a real merge table over the corpus vocabulary (driver-side
  * mirror of the q_bpe_train recursion — the vocabulary is Heaps-bounded
  * metadata, so training 1024 merges in memory is seconds; determinism
  * and tie-breaks match the Spark loop), then times BOTH encoder shapes
  * over the (lang, word) vocabulary frame:
  *   - fold:  r14's chained `aggregate(...)` projection per rule (plan
  *            depth = rule count — the shape that cracks);
  *   - table: BpeOps.encode against the broadcast rank table (one
  *            mapPartitions pass, size-independent plan).
  * For each merge count it reports build+analysis wall (plan construction
  * is where chained folds die first) and execution wall, plus result
  * parity between the two encoders (total BPE token mass must match
  * exactly — the correctness cross-check at depths the oracle gate can't
  * reach). */
object BpeScale {

  /** The TextAnalysis fold, replicated (private there): merge one pair
    * across a space-joined symbol string. */
  private def mergeFold(p1: String, p2: String): Column = {
    val sl = split(col("symstr"), " ")
    aggregate(
      slice(sl, lit(2), size(sl) - 1),
      element_at(sl, 1),
      (acc, x) =>
        when(x === lit(p2) && (acc === lit(p1) || acc.endsWith(lit(" " + p1))),
          concat(acc, x))
          .otherwise(concat(acc, lit(" "), x)))
  }

  /** Driver-side trainer over the weighted vocabulary (ties: count desc,
    * then (p1, p2) asc — the q_bpe_train ordering). */
  private def train(
      words: Seq[(String, Long)], n: Int): Seq[(String, String)] = {
    var vocab: Seq[(Array[String], Long)] = words.map { case (w, c) =>
      ((w.map(String.valueOf(_)) :+ graft.operators.BpeOps.EndOfWord).toArray, c)
    }
    val out = Seq.newBuilder[(String, String)]
    var k = 0
    var dry = false
    while (k < n && !dry) {
      val counts = new scala.collection.mutable.HashMap[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) dry = true
      else {
        val (p1, p2) = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head._1
        out += ((p1, p2))
        vocab = vocab.map { case (syms, c) =>
          val o = new Array[String](syms.length)
          var w = 0; var s = 0
          while (s < syms.length) {
            if (s < syms.length - 1 && syms(s) == p1 && syms(s + 1) == p2) {
              o(w) = p1 + p2; w += 1; s += 2
            } else { o(w) = syms(s); w += 1; s += 1 }
          }
          (java.util.Arrays.copyOf(o, w), c)
        }
        k += 1
      }
    }
    out.result()
  }

  /** DISTRIBUTED-ONLY merge training at vocabulary sizes past driver
    * territory (VERDICT r17 task 4): the gate's loop
    * (TextAnalysis.bpeTrainLoopOver — distributed pair aggregate, 1-row
    * argmax, map-only fold, checkpoint-truncated rounds) over a
    * SYNTHETIC ≥10⁶-type weighted vocabulary (deterministic xxhash64
    * words, 6-12 chars over a 26-letter alphabet, Zipf-ish weights
    * N/(id+1)). The driver holds ONLY the merge list; nothing
    * vocabulary-sized is ever collected. A 2k-type sample is first
    * cross-checked merge-for-merge against the driver-side trainer
    * (same tie-breaks), so the big runs measure a verified kernel.
    *
    *   sbt "runMain graft.BpeScale dist [merges] [vocabSizes...]"
    */
  private def distMain(args: Array[String]): Unit = {
    val merges = args.headOption.flatMap(_.toIntOption).getOrElse(64)
    val sizes = if (args.length > 1) args.drop(1).toSeq.map(_.toLong)
      else Seq(100000L, 1000000L, 4000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    DevSessionConf(spark)
    import spark.implicits._

    def vocabOf(n: Long) =
      spark.range(n)
        .select(
          expr("""concat_ws('', transform(
            sequence(0, 5 + cast(pmod(xxhash64(id, 7L), 7) as int)),
            j -> char(97 + pmod(xxhash64(id, j), 26))))""").as("w"),
          expr(s"greatest(1L, ${n}L div (id + 1))").as("n_w0"))
        .groupBy("w").agg(sum("n_w0").as("n_w"))

    // correctness cross-check on a driver-sized sample
    locally {
      val small = vocabOf(2000L)
      val driverMerges = train(
        small.as[(String, Long)].collect().toSeq.sortBy(_._1), merges)
      val (distMerges, vf) =
        graft.queries.TextAnalysis.bpeTrainLoopOver(spark, small, merges)
      graft.Checkpoints.release(vf)
      val agree = driverMerges == distMerges.map(m => (m._2, m._3))
      println(s"""{"harness":"bpe_dist","check_types":2000,"merges":$merges,"matches_driver":$agree}""")
      require(agree, "distributed trainer diverged from the driver trainer")
    }

    val tally = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = sc.stageInfo.taskMetrics
          if (m != null) tally.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          ()
        }
      })
    def snap(): Long = {
      org.apache.spark.sql.graftbridge.GraftPlanBridge
        .flushListenerBus(spark.sparkContext)
      tally.get
    }

    for (n <- sizes) {
      val vc = vocabOf(n)
      val types = vc.count()
      val t0 = System.nanoTime()
      val b0 = snap()
      val (ms, vf) =
        graft.queries.TextAnalysis.bpeTrainLoopOver(spark, vc, merges)
      val secs = (System.nanoTime() - t0) / 1e9
      val mb = (snap() - b0) / 1e6
      graft.Checkpoints.release(vf)
      println(f"""{"harness":"bpe_dist","vocab":$n,"types":$types,"merges":$merges,"secs":$secs%.1f,"secs_per_round":${secs / merges}%.3f,"shuffle_mb":$mb%.1f,"driver_state_rows":${ms.size}}""")

      // ADAPTIVE ROUND BATCHING (the r17 frontier item): the provably-
      // equivalent batched loop on the same vocabulary — merge table
      // must be bit-identical; the win is rounds (each paying a full
      // vocabulary aggregate + an argmax action) collapsing by the
      // average batch width
      val t1 = System.nanoTime()
      val b1 = snap()
      val (bms, bvf) =
        graft.queries.TextAnalysis.bpeTrainLoopBatched(spark, vc, merges)
      val bsecs = (System.nanoTime() - t1) / 1e9
      val bmb = (snap() - b1) / 1e6
      graft.Checkpoints.release(bvf)
      require(bms == ms,
        "batched trainer diverged from the sequential merge table")
      println(f"""{"harness":"bpe_dist","vocab":$n,"types":$types,"merges":$merges,"mode":"batched","secs":$bsecs%.1f,"shuffle_mb":$bmb%.1f,"speedup":${secs / bsecs}%.2f,"matches_sequential":true}""")
    }
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.contains("dist")) { distMain(args.filterNot(_ == "dist")); return }
    // "open" anywhere in args → OPEN-VOCABULARY mode (SCALE.md §27
    // follow-up, VERDICT r15 item 2): the vocabulary is the corpus's
    // words PLUS its adjacent word bigrams and trigrams (joined, with
    // their true stream counts) — productive compounding with ORGANIC
    // Zipf-ish frequencies, so every merge up to 1024+ is learned from
    // corpus-weighted counts instead of the manufactured weight-1 tail
    // the closed 31-word fixture needs past ~107 merges.
    val openVocab = args.contains("open")
    val rest = args.filterNot(_ == "open")
    val sfDir = rest.headOption.getOrElse("/root/testdata/sf0.1")
    val counts = if (rest.length > 1) rest.drop(1).toSeq.map(_.toInt)
      else Seq(16, 64, 256, 1024)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.sources.Tables.NanosAsLongKey, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // the corpus vocabulary, once (the same tokenization as q_bpe_*:
    // whitespace split, empties dropped); open mode adds the adjacent
    // bigram/trigram compounds of the real token stream
    val wsDf = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(split(col("text"), "\\s+").as("ws"))
    val uniDf = wsDf.select(explode(col("ws")).as("w"))
    val vocabDf = (if (!openVocab) uniDf
      else uniDf
        .unionAll(wsDf.select(explode(expr(
          """transform(slice(ws, 1, greatest(0, size(ws) - 1)),
            |  (x, i) -> concat(x, element_at(ws, i + 2)))""".stripMargin))
          .as("w")))
        .unionAll(wsDf.select(explode(expr(
          """transform(slice(ws, 1, greatest(0, size(ws) - 2)),
            |  (x, i) -> concat(x, element_at(ws, i + 2),
            |                   element_at(ws, i + 3)))""".stripMargin))
          .as("w"))))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n_w"))
    val vocab = vocabDf.as[(String, Long)].collect().toSeq.sortBy(_._1)
    System.err.println(s"[bpescale] vocabulary ${vocab.size} words" +
      (if (openVocab) " (open: words + stream bigrams/trigrams)" else ""))
    // The synthetic corpus has a tiny closed vocabulary (31 words at any
    // SF — the generator samples a fixed word list), so training DRIES
    // after ~100 merges: every surviving pair has been merged. Real
    // tokenizers train on open vocabularies with 32k+ merges, and the
    // MERGE COUNT is exactly the scaling axis under test — so past the
    // corpus's own capacity the trainer continues on an ENRICHED
    // vocabulary: deterministic low-weight compounds of corpus words
    // (weight 1, so the corpus-faithful merges are learned first and the
    // deep tail exists). The ENCODERS still run against the same inputs
    // with the same table — the enrichment only manufactures rule depth.
    val enriched: Seq[(String, Long)] =
      if (openVocab) vocab   // organic counts carry the depth by themselves
      else vocab ++ {
        val ws = vocab.map(_._1).sorted
        for {
          (a, i) <- ws.zipWithIndex
          b <- ws.drop(i % 7)   // staggered pairs: varied, deterministic
        } yield (a + "_" + b, 1L)
      }
    val tTrain = System.nanoTime()
    val allMerges = train(enriched, counts.max)
    val trainS = (System.nanoTime() - tTrain) / 1e9
    System.err.println(s"[bpescale] trained ${allMerges.size} merges " +
      s"(vocabulary ${enriched.size}, ${if (openVocab) "open" else "enriched"})")
    println(f"""{"mode":"${if (openVocab) "open" else "closed"}","vocab":${enriched.size},"merges_trained":${allMerges.size},"train_s":$trainS%.1f,"train_s_per_round":${trainS / math.max(allMerges.size, 1)}%.4f}""")

    counts.map(math.min(_, allMerges.size)).distinct.foreach { n =>
      val merges = allMerges.take(n)
      // --- merge-table encoder ---
      val t0 = System.nanoTime()
      val tableDf = vocabDf.as[(String, Long)].mapPartitions { it =>
        val ranks = graft.operators.BpeOps.rankTable(merges)
        it.map { case (w, c) =>
          (c, graft.operators.BpeOps.encode(w, ranks).length.toLong)
        }
      }.toDF("n_w", "n_bpe")
        .agg(sum(expr("n_w * n_bpe"))).as[Long]
      val tableBuildS = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val tableMass = tableDf.collect()(0)
      val tableExecS = (System.nanoTime() - t1) / 1e9
      // --- merge-table encoder over the FULL corpus (no vocab rollup):
      // the serving-path shape — per-document tokenization where the
      // rank table is a broadcast lookup and cost is row-proportional,
      // INDEPENDENT of merge count. The fold encoder has no corpus row
      // here: its cost axis is PLAN DEPTH (measured below on the
      // vocabulary frame), and a 1024-projection chain over the corpus
      // is exactly the shape the rank table exists to avoid.
      val t2c = System.nanoTime()
      val corpusMass = graft.sources.Tables.load(spark, sfDir, "documents")
        .select(explode(split(col("text"), "\\s+")).as("w"))
        .filter(col("w") =!= "")
        .mapPartitions { it =>
          val ranks = graft.operators.BpeOps.rankTable(merges)
          it.map(r => graft.operators.BpeOps
            .encode(r.getString(0), ranks).length.toLong)
        }(org.apache.spark.sql.Encoders.scalaLong)
        .agg(sum(col("value"))).as[Long].collect()(0)
      val corpusS = (System.nanoTime() - t2c) / 1e9
      // --- chained-fold encoder (plan depth = n) ---
      val foldRow = try {
        val t2 = System.nanoTime()
        val v0 = vocabDf.withColumn("symstr",
          concat(
            array_join(
              expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
              " "),
            lit(" </w>")))
        val enc = merges.foldLeft(v0) { case (df, (p1, p2)) =>
          df.withColumn("symstr", mergeFold(p1, p2))
        }
        val agg = enc.select(expr("n_w * size(split(symstr, ' '))").as("m"))
          .agg(sum(col("m"))).as[Long]
        // force full analysis before timing exec separately
        agg.queryExecution.executedPlan
        val foldBuildS = (System.nanoTime() - t2) / 1e9
        val t3 = System.nanoTime()
        val foldMass = agg.collect()(0)
        val foldExecS = (System.nanoTime() - t3) / 1e9
        f""""fold_plan_s":$foldBuildS%.2f,"fold_exec_s":$foldExecS%.2f,"parity":${foldMass == tableMass}"""
      } catch { case e: Throwable =>
        s""""fold_error":"${e.getClass.getSimpleName}""""
      }
      println(f"""{"merges":$n,"table_plan_s":$tableBuildS%.2f,"table_exec_s":$tableExecS%.2f,"corpus_exec_s":$corpusS%.2f,"corpus_mass":$corpusMass,"bpe_mass":$tableMass,$foldRow}""")
    }
    spark.stop()
  }
}
