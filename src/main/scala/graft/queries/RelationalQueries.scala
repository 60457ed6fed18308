package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Canon.round
import graft.core.Tables
import graft.operators.Unify

/** Join / union / fusion operators (SURVEY §2.3 J1-J11, §2.7 U1-U2) on the
  * TPC-H-ish tables, plus classic scan-heavy aggregations. Dimension joins
  * broadcast the small side explicitly — the same plan shape that holds at
  * 100 TB (fact table partitioned, dims replicated).
  */
object RelationalQueries {

  private def clickDaily(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).filter(col("event_type") === "click")
      .groupBy(to_date(col("ts")).as("date"))
      .agg(round(avg("value"), 6).as("v"), count(lit(1)).as("n"))

  private def purchaseDaily(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("date"))
      .agg(round(avg("value"), 6).as("v"), count(lit(1)).as("n"))

  private val clickDailySql =
    """SELECT CAST(ts AS DATE) AS date, round(avg(value), 6) AS v, count(*) AS n
      |FROM events WHERE event_type = 'click' GROUP BY 1""".stripMargin
  private val purchaseDailySql =
    """SELECT CAST(ts AS DATE) AS date, round(avg(value), 6) AS v, count(*) AS n
      |FROM events WHERE event_type = 'purchase' GROUP BY 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A2/A4-family scan-aggregate (TPC-H Q1 shape): map-side partial agg,
    // 4 output groups.
    "q1_pricing_summary" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(to_date(col("l_shipdate")) <= lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))),

    // Multi-way broadcast join through the dimension chain.
    "q5_region_revenue" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val sup = broadcast(Tables.supplier(s, dir))
      val nat = broadcast(Tables.nation(s, dir))
      val reg = broadcast(Tables.region(s, dir))
      li.join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .join(reg, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // J1: full-outer equi-join of two daily frames.
    "j1_full_outer" -> ((s, dir) =>
      clickDaily(s, dir).select(col("date"), col("v").as("click_v"), col("n").as("click_n"))
        .join(purchaseDaily(s, dir)
          .select(col("date"), col("v").as("purch_v"), col("n").as("purch_n")),
          Seq("date"), "full_outer")),

    // J2/U2: date spine + chained left joins (the unify_all shape).
    "j2_spine_unify" -> ((s, dir) => {
      val c = clickDaily(s, dir).select(col("date"), col("v").as("click_v"))
      val p = purchaseDaily(s, dir).select(col("date"), col("v").as("purch_v"))
      val e = Tables.events(s, dir).filter(col("event_type") === "error")
        .groupBy(to_date(col("ts")).as("date"))
        .agg(round(avg("value"), 6).as("err_v"))
      Unify.unifyAll(Seq(c, p, e))
    }),

    // J3: left-anti fill-missing-dates preference merge.
    "j3_prefer_merge" -> ((s, dir) => {
      val a = clickDaily(s, dir).select(col("date"), col("v"), lit("click").as("src"))
      val b = purchaseDaily(s, dir).select(col("date"), col("v"), lit("purchase").as("src"))
      // restrict the preferred side so the anti-join actually fills rows
      val aOdd = a.filter(dayofmonth(col("date")) % 2 === 1)
      Unify.preferByDate(aOdd, b)
    }),

    // J4/U1: union-by-name (null-padding) + grouped mean fusion.
    "j4_union_fuse" -> ((s, dir) => {
      val a = clickDaily(s, dir).select(col("date"), col("v"), col("n").as("click_n"))
      val b = purchaseDaily(s, dir).select(col("date"), col("v"), col("n").as("purch_n"))
      Unify.unionFuse(Seq(a, b), Seq(
        round(avg("v"), 6).as("v_fused"),
        sum(col("click_n")).as("click_n_total"),
        sum(col("purch_n")).as("purch_n_total"),
        count(lit(1)).as("n_sources")))
    }),

    // J6: column-wise coalesce merge with provenance + missing flags.
    "j6_coalesce_merge" -> ((s, dir) => {
      val a = clickDaily(s, dir).filter(dayofmonth(col("date")) % 3 =!= 0)
        .select(col("date"), col("v"))
      val b = purchaseDaily(s, dir).filter(dayofmonth(col("date")) % 2 === 0)
        .select(col("date"), col("v"))
      Unify.coalesceMerge(a, b, Seq("v"), "metric")
    }),

    // J3-variant: customers with no RECENT orders, counted per nation
    // (anti join on the fact side, broadcast dim attach).
    "j_anti_customers" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
      val ord = Tables.orders(s, dir)
        .filter(to_date(col("o_orderdate")) >= lit("2000-01-01").cast("date"))
      val nat = broadcast(Tables.nation(s, dir))
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
        .join(nat, col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_customers_no_orders"),
          round(sum("c_acctbal"), 2).as("acctbal_sum"))
    }),

    // J10: QC re-aggregation consistency join — recompute daily stats two
    // ways and diff them (the reference's own oracle pattern, Q2).
    "j10_qc_consistency" -> ((s, dir) => {
      val official = Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("date"))
        .agg(round(avg("value"), 6).as("v_mean"), count(lit(1)).as("n"))
      val recomputed = Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("date"), col("event_type"))
        .agg(sum("value").as("vs"), count(lit(1)).as("cn"))
        .groupBy("date")
        .agg((sum("vs") / sum("cn")).as("v_mean2"), sum("cn").as("n2"))
      official.join(recomputed, Seq("date"))
        .select(col("date"), col("v_mean"), col("n"),
          round(abs(col("v_mean") - round(col("v_mean2"), 6)), 6).as("mean_diff"),
          (col("n") - col("n2")).as("n_diff"))
    }),

    // U2 set-difference shape: (user, day) pairs with clicks but no
    // purchases (left-anti on the composite key).
    "u2_date_diff" -> ((s, dir) => {
      def ud(t: String) = Tables.events(s, dir).filter(col("event_type") === t)
        .select(col("user_id"), to_date(col("ts")).as("date")).distinct()
      ud("click").join(ud("purchase"), Seq("user_id", "date"), "left_anti")
        .withColumn("only_in", lit("click"))
    }),

    // U4: set intersection on a composite key (absent in the reference;
    // free in Spark).
    "u4_intersect" -> ((s, dir) => {
      def ud(t: String) = Tables.events(s, dir).filter(col("event_type") === t)
        .select(col("user_id"), to_date(col("ts")).as("date"))
      ud("click").intersect(ud("purchase"))
    }),

    // A23: rollup subtotals (absent in the reference; free in Spark).
    "a23_rollup" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))),

    // Scan + selective filter + projection: predicate/projection pushdown
    // showcase (F1/F10).
    "f10_pushdown_scan" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(to_date(col("l_shipdate")).between(lit("1995-01-01").cast("date"),
          lit("1995-12-31").cast("date")) && col("l_discount") > 0.05)
        .groupBy(col("l_returnflag"))
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue_effect"),
          count(lit(1)).as("n"))))

  def oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q5_region_revenue" ->
      """SELECT r.r_name,
        |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name""".stripMargin,

    "j1_full_outer" ->
      s"""WITH c AS ($clickDailySql), p AS ($purchaseDailySql)
        |SELECT COALESCE(c.date, p.date) AS date,
        |  c.v AS click_v, c.n AS click_n, p.v AS purch_v, p.n AS purch_n
        |FROM c FULL OUTER JOIN p ON c.date = p.date""".stripMargin,

    "j2_spine_unify" ->
      s"""WITH c AS ($clickDailySql), p AS ($purchaseDailySql),
        |e AS (SELECT CAST(ts AS DATE) AS date, round(avg(value), 6) AS err_v
        |      FROM events WHERE event_type = 'error' GROUP BY 1),
        |spine AS (SELECT DISTINCT date FROM (
        |  SELECT date FROM c UNION ALL SELECT date FROM p UNION ALL SELECT date FROM e))
        |SELECT s.date, c.v AS click_v, p.v AS purch_v, e.err_v
        |FROM spine s
        |LEFT JOIN c ON s.date = c.date
        |LEFT JOIN p ON s.date = p.date
        |LEFT JOIN e ON s.date = e.date""".stripMargin,

    "j3_prefer_merge" ->
      s"""WITH a AS (SELECT date, v, 'click' AS src FROM ($clickDailySql)
        |           WHERE day(date) % 2 = 1),
        |b AS (SELECT date, v, 'purchase' AS src FROM ($purchaseDailySql))
        |SELECT * FROM a
        |UNION ALL
        |SELECT b.* FROM b LEFT JOIN a ON b.date = a.date WHERE a.date IS NULL""".stripMargin,

    "j4_union_fuse" ->
      s"""WITH a AS (SELECT date, v, n AS click_n, NULL::BIGINT AS purch_n
        |           FROM ($clickDailySql)),
        |b AS (SELECT date, v, NULL::BIGINT AS click_n, n AS purch_n
        |      FROM ($purchaseDailySql)),
        |u AS (SELECT * FROM a UNION ALL SELECT * FROM b)
        |SELECT date, round(avg(v), 6) AS v_fused,
        |  CAST(sum(click_n) AS BIGINT) AS click_n_total,
        |  CAST(sum(purch_n) AS BIGINT) AS purch_n_total, count(*) AS n_sources
        |FROM u GROUP BY date""".stripMargin,

    "j6_coalesce_merge" ->
      s"""WITH a AS (SELECT date, v FROM ($clickDailySql) WHERE day(date) % 3 <> 0),
        |b AS (SELECT date, v FROM ($purchaseDailySql) WHERE day(date) % 2 = 0)
        |SELECT COALESCE(a.date, b.date) AS date,
        |  COALESCE(a.v, b.v) AS v,
        |  CASE WHEN a.v IS NOT NULL THEN 'a' WHEN b.v IS NOT NULL THEN 'b'
        |       ELSE 'none' END AS source_metric,
        |  CASE WHEN COALESCE(a.v, b.v) IS NULL THEN 1 ELSE 0 END AS missing_metric
        |FROM a FULL OUTER JOIN b ON a.date = b.date""".stripMargin,

    "j_anti_customers" ->
      """SELECT n.n_name, count(*) AS n_customers_no_orders,
        |  round(sum(c.c_acctbal), 2) AS acctbal_sum
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |  AND CAST(o.o_orderdate AS DATE) >= DATE '2000-01-01')
        |GROUP BY n.n_name""".stripMargin,

    "j10_qc_consistency" ->
      """WITH official AS (
        |  SELECT CAST(ts AS DATE) AS date, round(avg(value), 6) AS v_mean, count(*) AS n
        |  FROM events GROUP BY 1),
        |pre AS (
        |  SELECT CAST(ts AS DATE) AS date, event_type, sum(value) AS vs, count(*) AS cn
        |  FROM events GROUP BY 1, 2),
        |recomputed AS (
        |  SELECT date, sum(vs) / sum(cn) AS v_mean2, sum(cn) AS n2
        |  FROM pre GROUP BY date)
        |SELECT o.date, o.v_mean, o.n,
        |  round(abs(o.v_mean - round(r.v_mean2, 6)), 6) AS mean_diff,
        |  CAST(o.n - r.n2 AS BIGINT) AS n_diff
        |FROM official o JOIN recomputed r ON o.date = r.date""".stripMargin,

    "u2_date_diff" ->
      """WITH c AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS date FROM events
        |           WHERE event_type = 'click'),
        |p AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS date FROM events
        |      WHERE event_type = 'purchase')
        |SELECT c.user_id, c.date, 'click' AS only_in
        |FROM c LEFT JOIN p ON c.user_id = p.user_id AND c.date = p.date
        |WHERE p.user_id IS NULL""".stripMargin,

    "u4_intersect" ->
      """SELECT user_id, CAST(ts AS DATE) AS date FROM events WHERE event_type = 'click'
        |INTERSECT
        |SELECT user_id, CAST(ts AS DATE) AS date FROM events WHERE event_type = 'purchase'""".stripMargin,

    "a23_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "f10_pushdown_scan" ->
      """SELECT l_returnflag,
        |  round(sum(l_extendedprice * l_discount), 2) AS revenue_effect,
        |  count(*) AS n
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'
        |  AND l_discount > 0.05
        |GROUP BY l_returnflag""".stripMargin)
}
