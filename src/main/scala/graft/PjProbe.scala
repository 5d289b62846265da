package graft
import org.apache.spark.sql.functions._
import graft.functions.PortableHash
object PjProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "512")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftFunctions.register(spark)
    val dir = "/tmp/graft_scale_x30"
    def t[A](tag: String)(f: => A): A = {
      val s = System.nanoTime; val r = f
      println(f"[probe] $tag ${(System.nanoTime-s)/1e9}%.2f s"); r
    }
    val L = 16
    val docsRaw = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), greatest(length(col("text")) - (L-2), lit(2)) - 1)).as("i"))
      .select(col("doc_id"), expr(s"substring(text, i, $L)").as("sh"))
      .select(col("doc_id"), PortableHash.hash60(col("sh")).as("hp"))
    val docsets = t("docsets ckpt")(docsRaw.groupBy("doc_id")
      .agg(sort_array(collect_set(col("hp"))).as("hs")).localCheckpoint())
    val ex = docsets.select(col("doc_id"), explode(col("hs")).as("hp"))
    val dfreq = ex.groupBy("hp").agg(count(lit(1)).as("d"))
    t("dfreq.count")(println("dfreq=" + dfreq.count()))
    val keyed = ex.join(dfreq, "hp")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("d"), col("hp")))).as("ks"))
      .select(col("doc_id"), col("ks"), size(col("ks")).cast("long").as("n"))
    val pref = keyed.select(col("doc_id"), col("n"),
        posexplode(expr("slice(ks, 1, cast(n - ((8 * n + 9) div 10) + 1 as int))")))
      .select(col("doc_id"), col("n"), (col("pos") + 1).cast("long").as("rk"), col("col.hp").as("hp"))
    val prefC = t("pref ckpt")(pref.localCheckpoint())
    println("pref rows=" + prefC.count())
    val cand = prefC.select(col("doc_id").as("doc_a"), col("n").as("na"), col("rk").as("rka"), col("hp"))
      .join(prefC.select(col("doc_id").as("doc_b"), col("n").as("nb"), col("rk").as("rkb"), col("hp")), Seq("hp"))
      .filter(col("doc_a") < col("doc_b"))
      .filter(expr("10 * least(na, nb) >= 8 * greatest(na, nb)"))
      .filter(expr("least(na - rka, nb - rkb) + 1 >= (4 * (na + nb) + 8) div 9"))
      .select("doc_a", "doc_b").distinct()
    val candC = t("cand ckpt")(cand.localCheckpoint())
    println("cand=" + candC.count())
    val out = candC
      .join(docsets.select(col("doc_id").as("doc_a"), col("hs").as("ha")), "doc_a")
      .join(docsets.select(col("doc_id").as("doc_b"), col("hs").as("hb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("ha"), col("hb"))).cast("long").as("n_inter"),
        (size(col("ha")) + size(col("hb"))).cast("long").as("n_ab"))
      .filter(expr("10 * n_inter >= 8 * (n_ab - n_inter)"))
    t("verify")(println("out=" + out.count()))
  }
}
