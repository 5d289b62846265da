package graft.queries

import org.apache.spark.sql.functions._

import Parity._

/** TPC-H shapes 6/8/9/11/12/15/20 — completing the classic 22 (the other
  * 15 live in Relational.scala). The corpus (FIXTURES.md §B) has no
  * partsupp table and no l_shipmode/l_commitdate/l_receiptdate columns, so
  * the shapes that need them are adapted the same way q21 was: identical
  * operator composition, nearest available column (adaptations noted per
  * query). Reference scope note: the reference implements none of this
  * (SURVEY.md §2.3 — its only joins are the disguised O10 equi-join and
  * O5 anti-join); these exercise the join/agg/subquery compositions a
  * replacement engine must cover.
  *
  * Scale notes (SCALE.md): every query keeps the fact table on one shuffle
  * key family, broadcasts every dim, and multiplies comparisons out so all
  * arithmetic stays in exact decimal until a final cast to double.
  */
object Tpch {

  /** TPC-H Q6 (forecasting revenue change): the pure scan-side query — all
    * three predicates push to the parquet reader, no join, one partial+
    * final agg. At 100 TB this is the min-shuffle bound: one scan, one
    * 1-row exchange. */
  private val qQ6 = QueryDef(
    "q6_revenue_change",
    Some(s"""
      |SELECT ${sqlDsum(s"${sqlDec("l_extendedprice")} * ${sqlDec("l_discount")}")} AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
      |""".stripMargin.trim),
    (spark, dir) =>
      tbl(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
          col("l_shipdate") < ts("1997-01-01 00:00:00") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(dsum(dec("l_extendedprice") * dec("l_discount")).as("revenue"),
          count(lit(1)).as("n_items")))

  /** TPC-H Q8 (national market share): 8-table snowflake with a
    * conditional-ratio output — share of one supplier nation's volume
    * within a region's customers, per order-year. Customer and supplier
    * both resolve through nation (two roles of one dim). All dims
    * broadcast; the fact joins orders on its natural key — two shuffles
    * total (o_orderkey, then the group-by). */
  private val qQ8 = QueryDef(
    "q8_market_share",
    Some(s"""
      |WITH vol AS (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |    ${sqlDec("l_extendedprice")} * (${sqlDec("1")} - ${sqlDec("l_discount")}) AS volume,
      |    n2.n_name AS supp_nation
      |  FROM part
      |  JOIN lineitem ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region ON r_regionkey = n1.n_regionkey AND r_name = 'ASIA'
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  WHERE p_type = 'STANDARD')
      |SELECT o_year,
      |  CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE ${sqlDec("0")} END) AS DOUBLE)
      |    / CAST(sum(volume) AS DOUBLE) AS mkt_share,
      |  count(*) AS n_items
      |FROM vol GROUP BY o_year ORDER BY o_year
      |""".stripMargin.trim),
    (spark, dir) => {
      val custAsia = tbl(spark, dir, "customer")
        .join(broadcast(tbl(spark, dir, "nation")
          .join(broadcast(tbl(spark, dir, "region").filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey")
      val suppNat = tbl(spark, dir, "supplier")
        .join(broadcast(tbl(spark, dir, "nation")
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("sn_key"))
        .select("s_suppkey", "supp_nation")
      val volume = dec("l_extendedprice") * (oneDec - dec("l_discount"))
      tbl(spark, dir, "lineitem")
        .join(broadcast(tbl(spark, dir, "part").filter(col("p_type") === "STANDARD")),
          col("p_partkey") === col("l_partkey"))
        .join(broadcast(suppNat), col("s_suppkey") === col("l_suppkey"))
        .join(tbl(spark, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(custAsia), col("c_custkey") === col("o_custkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          (sum(when(col("supp_nation") === "NATION_3", volume)
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
            sum(volume).cast("double")).as("mkt_share"),
          count(lit(1)).as("n_items"))
        .orderBy("o_year")
    })

  /** TPC-H Q9 (product type profit): profit per supplier-nation per year
    * over a name-pattern part slice. Adaptation: no partsupp, so supply
    * cost = p_retailprice × quantity (the same row-wise
    * revenue-minus-cost decimal arithmetic; both factors DECIMAL(18,2) so
    * the product is exact in both engines). LIKE '%red%' pushes to the
    * part scan; part and supplier→nation broadcast; one fact shuffle on
    * o_orderkey. */
  private val qQ9 = QueryDef(
    "q9_product_profit",
    Some(s"""
      |SELECT nation, o_year, ${sqlDsum("amount")} AS sum_profit, count(*) AS n_items
      |FROM (
      |  SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |    ${sqlDec("l_extendedprice")} * (${sqlDec("1")} - ${sqlDec("l_discount")})
      |      - ${sqlDec("p_retailprice")} * ${sqlDec("l_quantity")} AS amount
      |  FROM part
      |  JOIN lineitem ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN nation ON n_nationkey = s_nationkey
      |  WHERE p_name LIKE '%red%')
      |GROUP BY nation, o_year
      |ORDER BY nation, o_year DESC
      |""".stripMargin.trim),
    (spark, dir) => {
      val amount = dec("l_extendedprice") * (oneDec - dec("l_discount")) -
        dec("p_retailprice") * dec("l_quantity")
      tbl(spark, dir, "lineitem")
        .join(broadcast(tbl(spark, dir, "part").filter(col("p_name").like("%red%"))),
          col("p_partkey") === col("l_partkey"))
        .join(broadcast(tbl(spark, dir, "supplier")
          .join(broadcast(tbl(spark, dir, "nation")), col("n_nationkey") === col("s_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("nation"))),
          col("s_suppkey") === col("l_suppkey"))
        .join(tbl(spark, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(dsum(amount).as("sum_profit"), count(lit(1)).as("n_items"))
        .orderBy(asc("nation"), desc("o_year"))
    })

  /** TPC-H Q11 (important stock): grouped value per part restricted to one
    * region's suppliers, kept only when the part's share exceeds a
    * threshold fraction of the total — the HAVING-with-global-scalar-
    * subquery shape. Adaptation: value = lineitem extendedprice (no
    * partsupp). The fraction test is multiplied out
    * (v/total > 1.5/nparts ⟺ 2·v·nparts > 3·total) so it stays in exact
    * decimal — and the threshold is RELATIVE (1.5× the mean part value),
    * so the predicate keeps selecting at any corpus size. The 1-row total
    * broadcasts (a 1-row-build nested loop by construction, like q22);
    * one shuffle on l_partkey. */
  private val qQ11 = QueryDef(
    "q11_important_stock",
    Some(s"""
      |WITH val AS (
      |  SELECT l_partkey, sum(${sqlDec("l_extendedprice")}) AS v
      |  FROM lineitem
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN nation ON n_nationkey = s_nationkey
      |  JOIN region ON r_regionkey = n_regionkey AND r_name = 'EUROPE'
      |  GROUP BY l_partkey),
      |tot AS (SELECT sum(v) AS total, count(*) AS nparts FROM val)
      |SELECT l_partkey, CAST(v AS DOUBLE) AS value
      |FROM val, tot
      |WHERE 2 * v * nparts > 3 * total
      |ORDER BY value DESC, l_partkey
      |""".stripMargin.trim),
    (spark, dir) => {
      val suppEur = tbl(spark, dir, "supplier")
        .join(broadcast(tbl(spark, dir, "nation")
          .join(broadcast(tbl(spark, dir, "region").filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val value = tbl(spark, dir, "lineitem")
        .join(broadcast(suppEur), col("l_suppkey") === col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(sum(dec("l_extendedprice")).as("v"))
      val tot = value.agg(sum(col("v")).as("total"), count(lit(1)).as("nparts"))
      value.crossJoin(broadcast(tot))
        .filter(lit(2) * col("v") * col("nparts") > lit(3) * col("total"))
        .select(col("l_partkey"), col("v").cast("double").as("value"))
        .orderBy(desc("value"), asc("l_partkey"))
    })

  /** TPC-H Q12 (shipping modes and order priority): per-mode conditional
    * priority counts over late-shipped lines. Adaptation: mode proxy =
    * l_returnflag (no l_shipmode column); late = shipped >90 days after
    * the order date (no commit/receipt dates) — the same non-equi
    * order-line predicate q4/q21 use. One shuffle on o_orderkey; the
    * conditional sums are map-side partial. */
  private val qQ12 = QueryDef(
    "q12_shipmode",
    Some("""
      |SELECT l_returnflag,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
      |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_returnflag ORDER BY l_returnflag
      |""".stripMargin.trim),
    (spark, dir) => {
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      tbl(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
          col("l_shipdate") < ts("1997-01-01 00:00:00"))
        .join(tbl(spark, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAY"))
        .groupBy("l_returnflag")
        .agg(sum(when(hi, 1).otherwise(0)).as("high_line_count"),
          sum(when(!hi, 1).otherwise(0)).as("low_line_count"))
        .orderBy("l_returnflag")
    })

  /** TPC-H Q15 (top supplier): quarter revenue per supplier, keep the
    * supplier(s) whose revenue equals the global max — the
    * view-plus-scalar-max shape. The comparison stays in exact decimal
    * (sum = sum, never double =); the per-supplier agg is tiny after
    * grouping, so both it and the 1-row max broadcast. One fact shuffle
    * on l_suppkey. */
  private val qQ15 = QueryDef(
    "q15_top_supplier",
    Some(s"""
      |WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    sum(${sqlDec("l_extendedprice")} * (${sqlDec("1")} - ${sqlDec("l_discount")})) AS total_rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_rev = (SELECT max(total_rev) FROM revenue)
      |ORDER BY s_suppkey
      |""".stripMargin.trim),
    (spark, dir) => {
      val revenue = tbl(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
          col("l_shipdate") < ts("1996-04-01 00:00:00"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(sum(dec("l_extendedprice") * (oneDec - dec("l_discount"))).as("total_rev"))
      val top = revenue.agg(max(col("total_rev")).as("max_rev"))
      tbl(spark, dir, "supplier")
        .join(broadcast(revenue), col("s_suppkey") === col("supplier_no"))
        .crossJoin(broadcast(top))
        .filter(col("total_rev") === col("max_rev"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev").cast("double").as("total_revenue"))
        .orderBy("s_suppkey")
    })

  /** TPC-H Q20 (potential part promotion): suppliers who moved more than a
    * threshold quantity of some pattern-named part in a year — a grouped
    * HAVING key-set fed into a semi-join (the nested-IN composition).
    * Adaptation: shipped quantity stands in for partsupp availability; the
    * quantity sum stays in exact decimal. The key set is small after
    * grouping → broadcast semi-join; one fact shuffle on
    * (l_suppkey, l_partkey). */
  private val qQ20 = QueryDef(
    "q20_potential_promo",
    Some(s"""
      |SELECT s_name, s_acctbal
      |FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey
      |  FROM lineitem JOIN part ON p_partkey = l_partkey
      |  WHERE p_name LIKE '%red%'
      |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  GROUP BY l_suppkey, l_partkey
      |  HAVING sum(${sqlDec("l_quantity")}) > 60)
      |ORDER BY s_name
      |""".stripMargin.trim),
    (spark, dir) => {
      val movers = tbl(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
          col("l_shipdate") < ts("1997-01-01 00:00:00"))
        .join(broadcast(tbl(spark, dir, "part").filter(col("p_name").like("%red%"))),
          col("p_partkey") === col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(sum(dec("l_quantity")).as("sq"))
        .filter(col("sq") > 60)
        .select("l_suppkey")
      tbl(spark, dir, "supplier")
        .join(broadcast(movers), col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    })

  val defs: Seq[QueryDef] = Seq(qQ6, qQ8, qQ9, qQ11, qQ12, qQ15, qQ20)
}
