package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import Parity._

/** Similarity search over the `embeddings` table (SURVEY.md §2.4).
  *
  * Exactness strategy: the embedding floats are quantized to 1e6-scaled
  * BIGINTs (`round(x*1e6)`) in BOTH engines, so dot products are exact
  * integer arithmetic — no cross-engine floating-point accumulation-order
  * ULP drift, which would break the driver's hash compare. The corpus
  * vectors are L2-normalized, so the integer dot IS the cosine scaled by
  * 1e12 (surfaced as `cosine = dot_q / 1e12`, the same double in both
  * engines since it derives from the same integer).
  *
  * Scale design (100 TB; see SCALE.md):
  *  - brute-force top-k broadcasts the (small) query set and scans the
  *    corpus ONCE; per-query top-k is a window over the scan — at cluster
  *    scale this is the "exact rerank" stage;
  *  - the hyperplane-LSH bucketing (q_ann_buckets) is the recall stage:
  *    4 sign-bits partition the corpus into 16 buckets; ANN probes only
  *    matching buckets, turning a full-scan ranking into a bucket-local
  *    one. Bucket key is the natural shuffle/partition key at scale.
  */
object Similarity {

  private val Dim = 64
  private val NumQueries = 8  // query set = vec_id < 8
  private val TopK = 5
  private val NumPlanes = 4

  /** transform(embedding) → 1e6-quantized BIGINT array (exact both engines:
    * float→double widening is exact, *1e6 is one IEEE op, round is
    * half-away-from-zero in both). */
  private val quantizeExpr =
    "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
  private def sqlQuantElem(list: String, idx: String): String =
    s"CAST(round(CAST(list_extract($list, $idx) AS DOUBLE) * 1000000) AS BIGINT)"

  /** Brute-force exact top-k cosine: broadcast the query set, one corpus
    * scan, integer dot via zip_with + aggregate (sequential fold — codegen
    * higher-order functions, no UDF), per-query top-k window. */
  private val qCosineTopk = QueryDef(
    "q_cosine_topk",
    Some(s"""
      |WITH pairs AS (
      |  SELECT q.vec_id AS query_id, v.vec_id AS cand_id,
      |    sum(${sqlQuantElem("q.embedding", "CAST(t.i AS INT)")}
      |      * ${sqlQuantElem("v.embedding", "CAST(t.i AS INT)")}) AS dot_q
      |  FROM (SELECT * FROM embeddings WHERE vec_id < $NumQueries) q,
      |       embeddings v,
      |       (SELECT unnest(range(1, ${Dim + 1})) AS i) t
      |  WHERE v.vec_id <> q.vec_id
      |  GROUP BY query_id, cand_id),
      |ranked AS (
      |  SELECT query_id, cand_id, dot_q,
      |    row_number() OVER (PARTITION BY query_id ORDER BY dot_q DESC, cand_id) AS rnk
      |  FROM pairs)
      |SELECT query_id, rnk, cand_id, dot_q, CAST(dot_q AS DOUBLE) / 1e12 AS cosine
      |FROM ranked WHERE rnk <= $TopK ORDER BY query_id, rnk
      |""".stripMargin.trim),
    (spark, dir) => {
      val emb = tbl(spark, dir, "embeddings")
        .select(col("vec_id"), expr(quantizeExpr).as("qv"))
      val q = emb.select(col("vec_id").as("query_id"), col("qv").as("qvec"))
        .filter(col("query_id") < NumQueries)
      val pairs = emb.join(broadcast(q), col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("cand_id"),
          expr("aggregate(zip_with(qvec, qv, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")
            .as("dot_q"))
      val w = Window.partitionBy("query_id").orderBy(desc("dot_q"), asc("cand_id"))
      pairs.select(col("query_id"), col("cand_id"), col("dot_q"),
          row_number().over(w).cast("long").as("rnk"))
        .filter(col("rnk") <= TopK)
        .select(col("query_id"), col("rnk"), col("cand_id"), col("dot_q"),
          (col("dot_q").cast("double") / lit(1e12)).as("cosine"))
        .orderBy("query_id", "rnk")
    })

  /** Hyperplane-LSH bucket per vector: plane weights derive from the
    * portable hash (w(p,d) = hash60('p:d') % 2001 - 1000, an integer in
    * [-1000, 1000]), scores are exact integer dots against the quantized
    * vector, bucket = 4 sign bits. */
  private val qAnnBuckets = QueryDef(
    "q_ann_buckets",
    Some {
      val scoreCols = (0 until NumPlanes).map { p =>
        val w = s"(CAST(concat('0x', substr(md5(concat('$p:', d)), 1, 15)) AS BIGINT) % 2001 - 1000)"
        s"sum(qx * $w) AS sp$p"
      }.mkString(",\n    ")
      val combine = (0 until NumPlanes)
        .map(p => s"(CASE WHEN sp$p > 0 THEN ${1L << p} ELSE 0 END)")
        .mkString(" + ")
      s"""
      |WITH pos AS (
      |  SELECT vec_id, CAST(t.i AS INT) AS d,
      |    ${sqlQuantElem("embedding", "CAST(t.i AS INT)")} AS qx
      |  FROM embeddings, (SELECT unnest(range(1, ${Dim + 1})) AS i) t),
      |scores AS (SELECT vec_id, $scoreCols FROM pos GROUP BY vec_id)
      |SELECT vec_id, $combine AS bucket FROM scores ORDER BY vec_id
      |""".stripMargin.trim
    },
    (spark, dir) => annBuckets(spark, dir).orderBy("vec_id"))

  /** (vec_id, bucket) assignment — shared by the bucket queries and the
    * bucketed near-dup search. */
  private def annBuckets(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.PortableHash
    val pos = tbl(spark, dir, "embeddings")
      .select(col("vec_id"), posexplode(expr(quantizeExpr)))
      .select(col("vec_id"), (col("pos") + 1).as("d"), col("col").as("qx"))
    val scoreCols = (0 until NumPlanes).map { p =>
      val w = PortableHash.hash60(concat(lit(s"$p:"), col("d").cast("string"))) % 2001 - 1000
      sum(col("qx") * w).as(s"sp$p")
    }
    val combined = (0 until NumPlanes)
      .map(p => when(col(s"sp$p") > 0, lit(1L << p)).otherwise(lit(0L)))
      .reduce(_ + _)
    pos.groupBy("vec_id").agg(scoreCols.head, scoreCols.tail: _*)
      .select(col("vec_id"), combined.as("bucket"))
  }

  /** Bucket occupancy — the recall/efficiency view of the ANN index
    * (how much of the corpus a single-bucket probe scans). */
  private val qAnnBucketStats = QueryDef(
    "q_ann_bucket_stats",
    Some {
      // reuse the bucket SQL as a subquery
      val inner = qAnnBuckets.oracle.get.replaceAll("ORDER BY vec_id$", "")
      s"""
      |SELECT bucket, count(*) AS n_vecs, min(vec_id) AS min_vec
      |FROM ($inner) GROUP BY bucket ORDER BY bucket
      |""".stripMargin.trim
    },
    (spark, dir) =>
      qAnnBuckets.build(spark, dir)
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_vecs"), min(col("vec_id")).as("min_vec"))
        .orderBy("bucket"))

  /** Array-function exhibit over the embedding column (size / index /
    * slice / transform / aggregate / max / contains) — all on 1e6-quantized
    * integers so every value is cross-engine exact. */
  private val qArrayFuncs = QueryDef(
    "q_array_funcs",
    Some(s"""
      |SELECT vec_id,
      |  CAST(len(embedding) AS BIGINT) AS dim,
      |  ${sqlQuantElem("embedding", "1")} AS q_first,
      |  ${sqlQuantElem("embedding", "CAST(len(embedding) AS INT)")} AS q_last,
      |  CAST(list_sum(list_transform(embedding[1:8], x -> CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT))) AS BIGINT) AS q_head_sum,
      |  CAST(list_max(list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT))) AS BIGINT) AS q_max,
      |  CAST(list_contains(list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT)), 0) AS BIGINT) AS has_zero
      |FROM embeddings ORDER BY vec_id
      |""".stripMargin.trim),
    (spark, dir) =>
      tbl(spark, dir, "embeddings")
        .select(col("vec_id"), expr(quantizeExpr).as("qv"), col("embedding"))
        .select(col("vec_id"),
          size(col("embedding")).cast("long").as("dim"),
          element_at(col("qv"), 1).as("q_first"),
          element_at(col("qv"), size(col("qv"))).as("q_last"),
          expr("aggregate(slice(qv, 1, 8), 0L, (acc, v) -> acc + v)").as("q_head_sum"),
          array_max(col("qv")).as("q_max"),
          array_contains(col("qv"), 0L).cast("long").as("has_zero"))
        .orderBy("vec_id"))

  /** Embedding near-dup search, recall + rerank COMPOSED: candidate pairs
    * come only from shared hyperplane buckets (the ANN recall stage —
    * pair count is Σ_bucket n², never n²), exact integer cosine reranks
    * within the bucket, and each vector reports its nearest bucket-mate.
    * This is the complete 100 TB near-dup architecture in one query; at
    * cluster scale `bucket` is the partition key, so the self-join is
    * partition-local. */
  private val qNeardupBucketed = QueryDef(
    "q_neardup_bucketed",
    Some {
      val scoreCols = (0 until NumPlanes).map { p =>
        val w = s"(CAST(concat('0x', substr(md5(concat('$p:', d)), 1, 15)) AS BIGINT) % 2001 - 1000)"
        s"sum(qx * $w) AS sp$p"
      }.mkString(",\n    ")
      val combine = (0 until NumPlanes)
        .map(p => s"(CASE WHEN sp$p > 0 THEN ${1L << p} ELSE 0 END)")
        .mkString(" + ")
      s"""
      |WITH pos AS (
      |  SELECT vec_id, CAST(t.i AS INT) AS d,
      |    ${sqlQuantElem("embedding", "CAST(t.i AS INT)")} AS qx
      |  FROM embeddings, (SELECT unnest(range(1, ${Dim + 1})) AS i) t),
      |scores AS (SELECT vec_id, $scoreCols FROM pos GROUP BY vec_id),
      |buckets AS (SELECT vec_id, $combine AS bucket FROM scores),
      |pairs AS (
      |  SELECT a.vec_id AS qa, b.vec_id AS vb, sum(pa.qx * pb.qx) AS dot_q
      |  FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
      |  JOIN pos pa ON pa.vec_id = a.vec_id JOIN pos pb ON pb.vec_id = b.vec_id AND pb.d = pa.d
      |  GROUP BY qa, vb),
      |ranked AS (SELECT qa, vb, dot_q,
      |  row_number() OVER (PARTITION BY qa ORDER BY dot_q DESC, vb) AS rn FROM pairs)
      |SELECT qa AS vec_id, vb AS nn_id, dot_q, CAST(dot_q AS DOUBLE) / 1e12 AS cosine
      |FROM ranked WHERE rn = 1 ORDER BY vec_id
      |""".stripMargin.trim
    },
    (spark, dir) => {
      val emb = tbl(spark, dir, "embeddings")
        .select(col("vec_id"), expr(quantizeExpr).as("qv"))
      val bk = annBuckets(spark, dir)
      val left = bk.join(emb, "vec_id")
        .select(col("vec_id").as("qa"), col("bucket"), col("qv").as("qva"))
      val right = bk.join(emb, "vec_id")
        .select(col("vec_id").as("vb"), col("bucket").as("bucket_r"),
          col("qv").as("qvb"))
      val pairs = left
        .join(right, col("bucket") === col("bucket_r") && col("qa") =!= col("vb"))
        .select(col("qa"), col("vb"),
          expr("aggregate(zip_with(qva, qvb, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")
            .as("dot_q"))
      val w = Window.partitionBy("qa").orderBy(desc("dot_q"), asc("vb"))
      pairs.select(col("qa"), col("vb"), col("dot_q"),
          row_number().over(w).as("rn"))
        .filter(col("rn") === 1)
        .select(col("qa").as("vec_id"), col("vb").as("nn_id"), col("dot_q"),
          (col("dot_q").cast("double") / lit(1e12)).as("cosine"))
        .orderBy("vec_id")
    })

  val defs: Seq[QueryDef] = Seq(
    qCosineTopk, qAnnBuckets, qAnnBucketStats, qArrayFuncs, qNeardupBucketed)
}
