package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: PER-PHASE cost of the incremental kernels beyond PageRank
  * (the PrIvmScale pattern applied to the r17-18 IVM family). Each
  * builder's `mark` callback windows the shuffle-byte tally, separating
  * what an IVM deployment pays PER CHANGE BATCH (delta + resume /
  * recompute) from the exhibit's bookkeeping (base state build, the
  * full-corpus table commit the oracle gate needs):
  *
  *   - q_components_ivm        p1 | delta | resume
  *   - q_components_ivm_del    p1 | delta | recompute
  *   - q_bfs_ivm               p1 | delta | resume
  *   - q_bfs_ivm_del           p1 | delta | recompute
  *   - q_pipeline_multimodal_ivm  p1 | delta | resume (+ audit fold)
  *
  * "p1" covers artifact ensure + the exhibit's table commits (paid once
  * per base snapshot / inherent to the gate); the phases AFTER it are
  * the recurring maintenance cost the §49 totals could not isolate.
  *
  *   sbt "runMain graft.IvmScale [mult]"   (mult=1 → sf0.1 in place)
  */
object IvmScale {

  def main(args: Array[String]): Unit = {
    val mult = args.headOption.flatMap(_.toIntOption).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 16).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.sources.Tables.NanosAsLongKey, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    DevSessionConf(spark)

    val base = "/root/testdata/sf0.1"
    val dir =
      if (mult <= 1) base
      else {
        val out = s"/tmp/graft_scale_x$mult"
        ScaleStress.build(spark, base, out, mult)
        out
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

    def run(name: String)(
        build: (String => Unit) => org.apache.spark.sql.DataFrame): Unit = {
      var t0 = System.nanoTime()
      var b0 = snap()
      def emit(phase: String): Unit = {
        val secs = (System.nanoTime() - t0) / 1e9
        val b1 = snap()
        println(f"""{"harness":"ivm_scale","mult":$mult,"q":"$name","phase":"$phase","secs":$secs%.2f,"shuffle_mb":${(b1 - b0) / 1e6}%.1f}""")
        t0 = System.nanoTime(); b0 = b1
      }
      val df = build(emit)
      val n = df.count()
      emit("result")
      println(s"""{"harness":"ivm_scale","mult":$mult,"q":"$name","rows":$n}""")
    }

    run("q_components_ivm")(m =>
      graft.queries.Graph.componentsIvmBuild(spark, dir, m))
    run("q_components_ivm_del")(m =>
      graft.queries.Graph.componentsIvmDelBuild(spark, dir, m))
    run("q_bfs_ivm")(m => graft.queries.Graph.bfsIvmBuild(spark, dir, m))
    run("q_bfs_ivm_del")(m =>
      graft.queries.Graph.bfsIvmDelBuild(spark, dir, m))
    run("q_pipeline_multimodal_ivm")(m =>
      graft.queries.Catalog.pipelineMultimodalIvmBuild(spark, dir, m))
    run("q_triangles_ivm")(m =>
      graft.queries.Graph.trianglesIvmBuild(spark, dir, m))
    run("q_triangles_ivm_del")(m =>
      graft.queries.Graph.trianglesIvmDelBuild(spark, dir, m))
    run("q_label_prop_ivm")(m =>
      graft.queries.Graph.labelPropIvmBuild(spark, dir, m))
    run("q_ivf_ivm")(m =>
      graft.queries.Similarity.ivfIvmBuild(spark, dir, m))
    run("q_bfs_ivm_mixed")(m =>
      graft.queries.Graph.bfsIvmMixedBuild(spark, dir, m))
    run("q_bm25_ivm")(m =>
      graft.queries.TextAnalysis.bm25IvmBuild(spark, dir, m))
    spark.stop()
  }
}
