package graft.rel

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator surface (SURVEY.md §2), expressed as declarative
  * DataFrame programs so Catalyst gets predicate pushdown, column pruning,
  * join selection, partial aggregation and whole-stage codegen for free.
  * Every query here has a DuckDB oracle — this set IS the correctness gate
  * for the engine's relational operators.
  *
  * Scale notes (100 TB design intent, verified on sf0.1):
  *  - dimension tables (region/nation/supplier) are broadcast explicitly;
  *    mid-size dims (customer/orders at small SF) are left to AQE's
  *    size-based broadcast decision so the same code shuffles correctly
  *    when they outgrow the threshold at real scale.
  *  - aggregations are partial (map-side combine) automatically via
  *    HashAggregate(partial) -> Exchange -> HashAggregate(final).
  *  - every filter/projection is a Column expression (no UDFs), so it is
  *    pushed into the parquet scan.
  */
object RelationalQueries {

  /** TPC-H Q1 flavor: wide scan -> hash agg. Exercises A-1/A-6/A-7/A-8. */
  val q1Agg: Q = Q(
    "q1_agg",
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  sum(l_extendedprice) AS sum_base_price,
      |  sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
      |  avg(l_quantity) AS avg_qty,
      |  avg(l_discount) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        avg(col("l_quantity")).as("avg_qty"),
        avg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** TPC-H Q5 flavor: 5-way join with small-dim broadcasts. */
  val q2JoinRevenue: Q = Q(
    "q2_join_revenue",
    """SELECT n_name,
      |  sum(l_extendedprice * (1 - l_discount)) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name""".stripMargin
  ) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val o  = Tables.orders(s, d)
    val c  = Tables.customer(s, d)
    val n  = Tables.nation(s, d)
    val r  = Tables.region(s, d)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .where(r("r_name") === "ASIA")
      .groupBy(n("n_name"))
      .agg(
        sum(li("l_extendedprice") * (lit(1.0) - li("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** Top-k per key via ranking window (SURVEY W-1 analog, deterministic
    * tie-break on the unique key). */
  val q3TopOrders: Q = Q(
    "q3_top_orders_per_cust",
    """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rk
      |  FROM orders) t
      |WHERE rk <= 3""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rk"))
      .where(col("rk") <= 3)
  }

  /** union + groupBy-sum — the exact shape of the reference's affinity
    * symmetrization (TSNEHelper.scala:12-16): COO matrix unioned with its
    * transpose, summed by key. Map-side partial agg handles the 2x blowup. */
  val q4SymUnionAgg: Q = Q(
    "q4_sym_union_agg",
    """WITH coo AS (SELECT l_orderkey AS i, l_partkey AS j, l_quantity AS v
      |             FROM lineitem),
      |u AS (SELECT i, j, v FROM coo
      |      UNION ALL
      |      SELECT j AS i, i AS j, v FROM coo)
      |SELECT i, j, sum(v) AS v FROM u GROUP BY i, j""".stripMargin
  ) { (s, d) =>
    val coo = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("i"), col("l_partkey").as("j"),
        col("l_quantity").as("v"))
    coo.union(coo.select(col("j").as("i"), col("i").as("j"), col("v")))
      .groupBy("i", "j")
      .agg(sum(col("v")).as("v"))
  }

  /** Global sort + limit with unique tie-break (SURVEY O-1/O-2). */
  val q5SortLimit: Q = Q(
    "q5_sort_limit",
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC
      |LIMIT 100""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
  }

  /** TPC-H Q6 flavor: selective filters that must reach the parquet scan
    * as PushedFilters. */
  val q6FilterRevenue: Q = Q(
    "q6_filtered_revenue",
    """SELECT sum(l_extendedprice * l_discount) AS revenue,
      |  count(*) AS n
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount BETWEEN 0.03 AND 0.07
      |  AND l_quantity < 24""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1998-01-01").cast("timestamp")
        && col("l_discount").between(0.03, 0.07)
        && col("l_quantity") < 24)
      .agg(
        sum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n"))
  }

  /** Moment statistics per group; population stddev per SURVEY §7.4.5. */
  val q7Stats: Q = Q(
    "q7_stats_by_flag",
    """SELECT l_returnflag,
      |  avg(l_quantity) AS avg_qty,
      |  stddev_pop(l_quantity) AS std_qty,
      |  var_pop(l_quantity) AS var_qty,
      |  min(l_quantity) AS min_qty,
      |  max(l_quantity) AS max_qty
      |FROM lineitem GROUP BY l_returnflag""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        avg(col("l_quantity")).as("avg_qty"),
        stddev_pop(col("l_quantity")).as("std_qty"),
        var_pop(col("l_quantity")).as("var_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"))
  }

  /** explode/UNNEST generator (SURVEY F-11) + agg over generated rows. */
  val q8TokenCounts: Q = Q(
    "q8_token_counts",
    """SELECT token, count(*) AS cnt
      |FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS token
      |      FROM documents)
      |WHERE token <> ''
      |GROUP BY token""".stripMargin
  ) { (s, d) =>
    Tables.documents(s, d)
      .select(explode(split(lower(col("text")), "[^a-z0-9]+")).as("token"))
      .where(col("token") =!= "")
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Exact distinct aggregation (expand + two-phase agg in Spark). */
  val q9Distinct: Q = Q(
    "q9_distinct",
    """SELECT l_returnflag,
      |  count(DISTINCT l_orderkey) AS n_orders,
      |  count(DISTINCT l_partkey) AS n_parts,
      |  count(*) AS n_lines
      |FROM lineitem GROUP BY l_returnflag""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_lines"))
  }

  /** Anti join (NOT EXISTS): customers with no mid/high-value orders. */
  val q10AntiJoin: Q = Q(
    "q10_customers_no_orders",
    """SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)""".stripMargin
  ) { (s, d) =>
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).where(col("o_totalprice") > 250000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
  }

  /** Semi join (EXISTS): customers with at least one high-value order. */
  val q11SemiJoin: Q = Q(
    "q11_customers_high_value",
    """SELECT c_custkey, c_acctbal FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)""".stripMargin
  ) { (s, d) =>
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).where(col("o_totalprice") > 400000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_acctbal")
  }

  /** ROLLUP grouping sets (subtotals + grand total). */
  val q12Rollup: Q = Q(
    "q12_rollup",
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty, count(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
  }

  /** JSON scalar extraction from the events.props payload. */
  val q13Json: Q = Q(
    "q13_json_extract",
    """SELECT event_type,
      |  count(*) AS n,
      |  avg(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS avg_k,
      |  avg(value) AS avg_value
      |FROM events
      |GROUP BY event_type""".stripMargin
  ) { (s, d) =>
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        avg(get_json_object(col("props"), "$.k").cast("long")).as("avg_k"),
        avg(col("value")).as("avg_value"))
  }

  /** Running-sum analytic window with an explicit ROWS frame. */
  val q14RunningSum: Q = Q(
    "q14_running_sum",
    """SELECT user_id, event_id,
      |  sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS running_value
      |FROM events""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        sum(col("value")).over(w).as("running_value"))
  }

  /** lag() analytic: inter-event gap per user in milliseconds. */
  val q15LagGap: Q = Q(
    "q15_lag_gap",
    """SELECT user_id, event_id,
      |  epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id
      |                                        ORDER BY ts, event_id)) AS gap_ms
      |FROM events""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        (unix_millis(col("ts")) - unix_millis(lag(col("ts"), 1).over(w))).as("gap_ms"))
  }

  /** Range (interval) join: events within 1h after each purchase by the
    * same user. Equi-key on user_id keeps the join hash-partitioned; the
    * time predicate filters within partitions — scales linearly with
    * per-user activity rather than |events|². */
  val q16RangeJoin: Q = Q(
    "q16_purchase_follow",
    """SELECT p.event_id AS p_id, count(e.event_id) AS n_follow
      |FROM events p
      |LEFT JOIN events e ON e.user_id = p.user_id
      |  AND e.ts > p.ts AND e.ts <= p.ts + INTERVAL 1 HOUR
      |WHERE p.event_type = 'purchase'
      |GROUP BY p.event_id""".stripMargin
  ) { (s, d) =>
    val ev = Tables.events(s, d)
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val e = ev.select(col("user_id"), col("ts"), col("event_id"))
    p.join(e,
        col("p_user") === col("user_id")
          && col("ts") > col("p_ts")
          && col("ts") <= col("p_ts") + expr("INTERVAL 1 HOUR"),
        "left")
      .groupBy(col("p_id"))
      .agg(count(col("event_id")).as("n_follow"))
  }

  /** Date-part extraction + yearly aggregate. The money sum accumulates
    * in DECIMAL(18,2) (exact, order-insensitive — o_totalprice is a
    * cents-valued double) and casts the exact total back to DOUBLE, so
    * Spark's partial/final merge order and DuckDB's serial order cannot
    * differ by an ulp and flip the driver's exact hash. */
  val q17Yearly: Q = Q(
    "q17_yearly_orders",
    """SELECT CAST(extract(year FROM o_orderdate) AS INTEGER) AS yr,
      |  o_orderstatus,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  count(*) AS n
      |FROM orders
      |GROUP BY 1, 2""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).as("yr"), col("o_orderstatus"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"),
        count(lit(1)).as("n"))
  }

  /** Conditional aggregation (CASE WHEN inside agg). Two hash-compare
    * hazards, both fixed here: (1) the money sum accumulates in
    * DECIMAL(18,2) — exact and order-insensitive — not
    * round-after-double-sum, so Spark's partial/final merge order vs
    * DuckDB's serial scan cannot differ by an ulp; (2) urgent_n is
    * CAST(... AS BIGINT) in the oracle because DuckDB's sum(BIGINT)
    * returns HUGEINT, which pandas materializes as float64 (976.0) while
    * Spark's parquet holds int64 (976) — values equal, dtype-sensitive
    * hash red. This was the actual three-round q18 failure, not ulps. */
  val q18CaseAgg: Q = Q(
    "q18_case_agg",
    """SELECT o_orderstatus,
      |  CAST(sum(CAST(CASE WHEN o_orderpriority LIKE '1%' THEN o_totalprice ELSE 0 END AS DECIMAL(18,2))) AS DOUBLE) AS urgent_total,
      |  CAST(sum(CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END) AS BIGINT) AS urgent_n,
      |  count(*) AS n
      |FROM orders GROUP BY o_orderstatus""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d)
      .groupBy("o_orderstatus")
      .agg(
        sum(when(col("o_orderpriority").like("1%"), col("o_totalprice")).otherwise(lit(0.0))
          .cast("decimal(18,2)")).cast("double").as("urgent_total"),
        sum(when(col("o_orderpriority").like("1%"), lit(1L)).otherwise(lit(0L))).as("urgent_n"),
        count(lit(1)).as("n"))
  }

  /** As-of join: each purchase picks up the same user's most recent
    * prior 'view' value. Expressed as a union of tagged streams + a
    * running last-non-null window — the shuffle-once pattern that scales
    * (one hash partition by user_id, one sort), versus DuckDB's native
    * ASOF JOIN as the oracle. */
  val q19AsOf: Q = Q(
    "q19_asof_join",
    """SELECT p.event_id, p.user_id, v.value AS last_view_value
      |FROM events p
      |ASOF LEFT JOIN events v
      |  ON v.user_id = p.user_id AND v.event_type = 'view' AND v.ts < p.ts
      |WHERE p.event_type = 'purchase'""".stripMargin
  ) { (s, d) =>
    val ev = Tables.events(s, d)
    val tagged = ev.select(
      col("event_id"), col("user_id"), col("ts"), col("event_type"),
      when(col("event_type") === "view", col("value")).as("view_value"))
      .where(col("event_type").isin("view", "purchase"))
    // range frame on epoch-micros, upper bound −1 ⇒ strictly-earlier rows
    // only — exact ASOF (v.ts < p.ts) semantics even under ts ties
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(Window.unboundedPreceding, -1)
    tagged
      .withColumn("last_view_value", last(col("view_value"), ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("last_view_value"))
  }

  /** CUBE grouping sets (all subtotal combinations). */
  val q20Cube: Q = Q(
    "q20_cube",
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_extendedprice) AS total, count(*) AS n
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .cube("l_returnflag", "l_linestatus")
      .agg(sum(col("l_extendedprice")).as("total"), count(lit(1)).as("n"))
  }

  /** INTERSECT / EXCEPT set operations: customers in both/only-one of two
    * order-value cohorts. */
  val q21SetOps: Q = Q(
    "q21_set_ops",
    """WITH hi AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 300000),
      |     recent AS (SELECT DISTINCT o_custkey FROM orders
      |                WHERE o_orderdate >= TIMESTAMP '2000-01-01')
      |SELECT o_custkey, 'both' AS cohort FROM (SELECT * FROM hi INTERSECT SELECT * FROM recent)
      |UNION ALL
      |SELECT o_custkey, 'hi_only' AS cohort FROM (SELECT * FROM hi EXCEPT SELECT * FROM recent)""".stripMargin
  ) { (s, d) =>
    val o = Tables.orders(s, d)
    val hi = o.where(col("o_totalprice") > 300000).select("o_custkey").distinct()
    val recent = o.where(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select("o_custkey").distinct()
    hi.intersect(recent).select(col("o_custkey"), lit("both").as("cohort"))
      .union(hi.except(recent).select(col("o_custkey"), lit("hi_only").as("cohort")))
  }

  /** Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    * `quantile_cont`). The exact form sorts within groups; at 100 TB the
    * one-pass sketch (`approx_percentile`/t-digest) replaces it — kept
    * exact here because it is the oracle-checkable semantics. */
  val q22Percentiles: Q = Q(
    "q22_percentiles",
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS p50,
      |  quantile_cont(l_quantity, 0.25) AS p25,
      |  quantile_cont(l_quantity, 0.75) AS p75,
      |  quantile_cont(l_extendedprice, 0.9) AS price_p90
      |FROM lineitem GROUP BY l_returnflag""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.75)").as("p75"),
        expr("percentile(l_extendedprice, 0.9)").as("price_p90"))
  }

  /** String-function battery over part names. */
  val q23Strings: Q = Q(
    "q23_string_funcs",
    """SELECT p_partkey,
      |  upper(substr(p_name, 1, 5)) AS head5,
      |  replace(p_type, ' ', '_') AS type_slug,
      |  concat(p_brand, ':', CAST(p_size AS VARCHAR)) AS brand_size,
      |  CAST(length(p_name) AS INTEGER) AS name_len,
      |  CASE WHEN p_name LIKE '%red%' THEN 1 ELSE 0 END AS has_red
      |FROM part""".stripMargin
  ) { (s, d) =>
    Tables.part(s, d).select(
      col("p_partkey"),
      upper(substring(col("p_name"), 1, 5)).as("head5"),
      regexp_replace(col("p_type"), " ", "_").as("type_slug"),
      concat(col("p_brand"), lit(":"), col("p_size").cast("string")).as("brand_size"),
      length(col("p_name")).as("name_len"),
      when(col("p_name").like("%red%"), 1).otherwise(0).as("has_red"))
  }

  /** Correlated EXISTS — planned as a LEFT SEMI join (never a per-row
    * subquery): orders having at least one high-quantity lineitem. */
  val q24Exists: Q = Q(
    "q24_exists_semijoin",
    """SELECT o_orderstatus, count(*) AS n
      |FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
      |GROUP BY o_orderstatus""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d)
      .join(
        Tables.lineitem(s, d).where(col("l_quantity") > 45).select("l_orderkey"),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"))
  }

  /** Pivot (cross-tab): revenue per priority pivoted on order status.
    * Money sums accumulate in DECIMAL(18,2) then cast to DOUBLE (the q18
    * lesson: round-after-double-sum is accumulation-order-dependent and
    * loses to the driver's exact hash by an ulp; decimal addends make the
    * sum exact and order-free on both engines). */
  val q25Pivot: Q = Q(
    "q25_pivot",
    """SELECT o_orderpriority,
      |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS O,
      |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS F,
      |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS P
      |FROM orders GROUP BY o_orderpriority""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"))
  }

  /** Distribution windows: quartile bucket + percent_rank over value per
    * event type, deterministic tie-break on event_id.
    *
    * SCALE NOTE: rank-family windows require a total order per partition
    * key, so a low-cardinality key (5 event types here) is inherently
    * one sort per key — at corpus scale either partition on a
    * higher-cardinality key (user_id, like q14/q15) or replace exact
    * ranks with approx_percentile cutpoints (see q28's gated twin),
    * which keeps everything partial-aggregated. */
  val q26Ntile: Q = Q(
    "q26_ntile_percent_rank",
    """SELECT event_id, event_type,
      |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
      |  percent_rank() OVER w AS pr
      |FROM events
      |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").asc, col("event_id").asc)
    Tables.events(s, d).select(
      col("event_id"), col("event_type"),
      ntile(4).over(w).as("quartile"),
      percent_rank().over(w).as("pr"))
  }

  /** Two-stage SALTED aggregation — the skew pattern for hot keys (here
    * event_type: a handful of values over the whole table). Stage 1
    * aggregates on (key, salt) so every reducer sees ~1/16 of a hot key;
    * stage 2 merges the 16 partials per key. Result ≡ plain groupBy (the
    * oracle); sums go through DECIMAL so they are exact and order-free. */
  val q27SaltedAgg: Q = Q(
    "q27_salted_agg",
    """SELECT event_type,
      |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
      |  count(*) AS n
      |FROM events GROUP BY event_type""".stripMargin
  ) { (s, d) =>
    Tables.events(s, d)
      .withColumn("salt", pmod(col("event_id"), lit(16)))
      .groupBy("event_type", "salt")
      .agg(sum(col("value").cast("decimal(18,6)")).as("pv"), count(lit(1)).as("pn"))
      .groupBy("event_type")
      .agg(sum(col("pv")).cast("double").as("total_value"), sum(col("pn")).as("n"))
  }

  /** t-digest approximate percentiles — the documented 100 TB swap for
    * q22's exact sort-based form (SCALING.md). No cross-engine oracle is
    * possible for sketch values, so the gate quantifies relative error
    * against the exact twin per round. */
  val q28ApproxPercentiles: Q = Q.gated("q28_percentiles_approx") { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        expr("approx_percentile(l_quantity, 0.5, 10000)").as("p50"),
        expr("approx_percentile(l_extendedprice, 0.9, 10000)").as("price_p90"))
  } { (s, d, res) =>
    val exact = Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.5)").as("e50"),
        expr("percentile(l_extendedprice, 0.9)").as("e90"))
    val err = res.join(exact, "l_returnflag")
      .select(greatest(
        abs(col("p50") - col("e50")) / greatest(abs(col("e50")), lit(1e-9)),
        abs(col("price_p90") - col("e90")) / greatest(abs(col("e90")), lit(1e-9))).as("re"))
      .agg(max(col("re"))).head.getDouble(0)
    Seq(graft.Gate("max_rel_err_vs_exact", err, err <= 0.05))
  }

  /** Gaps-and-islands sessionization: a new session starts after >30 min
    * of per-user silence; islands are numbered by a running sum of the
    * boundary flags, then aggregated per session. This is the BATCH twin
    * of the streaming `EventsStream.sessionize` (flatMapGroupsWithState) —
    * StreamingSpec asserts the two paradigms produce the same session
    * multiset. Scale shape: one hash partition by user_id feeding both
    * windows and the final aggregation (a single exchange); value sums go
    * through DECIMAL so the hash is accumulation-order-free (q27). */
  val q29Sessions: Q = Q(
    "q29_sessions",
    """WITH o AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |),
      |s AS (
      |  SELECT user_id, ts, value,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      |  FROM o
      |)
      |SELECT user_id, CAST(session_no AS INTEGER) AS session_no,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
      |  min(ts) AS session_start, max(ts) AS session_end
      |FROM s GROUP BY 1, 2""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"),
        when(lag(col("ts"), 1).over(w).isNull
            || unix_millis(col("ts")) - unix_millis(lag(col("ts"), 1).over(w)) > 1800000L,
          1).otherwise(0).as("new_session"))
      .withColumn("session_no", sum(col("new_session")).over(run).cast("int"))
      .groupBy(col("user_id"), col("session_no"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
  }

  /** FULL OUTER join — the one join type the surface lacked (equi,
    * semi, anti, range, as-of are q2/q24/q10/q16/q19). Reconciliation
    * shape: per-user event activity vs per-customer high-value order
    * totals, keys that only one side knows surviving with NULLs on the
    * other. The order side is thresholded so BOTH null sides are
    * non-empty on the fixtures (every event user also has orders; only
    * some have a high-value one). Scale shape: both inputs are already
    * aggregated to one row per key before the join, so the full outer
    * is a key-partitioned merge of two deduplicated sides — never a
    * row-level blowup; sums go through DECIMAL (exact, order-free). */
  val q30FullOuter: Q = Q(
    "q30_full_outer",
    """WITH e AS (
      |  SELECT user_id,
      |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS event_value,
      |    count(*) AS n_events
      |  FROM events GROUP BY user_id),
      |o AS (
      |  SELECT o_custkey,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS order_value,
      |    count(*) AS n_orders
      |  FROM orders WHERE o_totalprice > 400000 GROUP BY o_custkey)
      |SELECT coalesce(user_id, o_custkey) AS ukey,
      |  event_value, n_events, order_value, n_orders
      |FROM e FULL OUTER JOIN o ON user_id = o_custkey""".stripMargin
  ) { (s, d) =>
    val e = Tables.events(s, d)
      .groupBy("user_id")
      .agg(
        sum(col("value").cast("decimal(18,6)")).cast("double").as("event_value"),
        count(lit(1)).as("n_events"))
    val o = Tables.orders(s, d)
      .where(col("o_totalprice") > 400000)
      .groupBy("o_custkey")
      .agg(
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("order_value"),
        count(lit(1)).as("n_orders"))
    e.join(o, e("user_id") === o("o_custkey"), "full_outer")
      .select(
        coalesce(e("user_id"), o("o_custkey")).as("ukey"),
        col("event_value"), col("n_events"), col("order_value"), col("n_orders"))
  }

  /** Correlated scalar subquery — orders strictly above their own
    * customer's average order value. The oracle keeps the correlated
    * form (DuckDB decorrelates it); the Spark program IS the
    * decorrelated plan, written declaratively: one per-customer
    * aggregate joined back on the key — exactly what Catalyst's
    * subquery decorrelation produces, so the equivalence of the two
    * formulations is what this query checks. The avg comparison is
    * integer-safe cross-multiplication (price·count > total in
    * DECIMAL), never a float division, so both engines make identical
    * keep decisions on ties. */
  val q31ScalarSubquery: Q = Q(
    "q31_scalar_subquery",
    """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
      |FROM orders o
      |WHERE CAST(o.o_totalprice AS DECIMAL(18,2))
      |    * (SELECT count(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
      |  > (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |     FROM orders i WHERE i.o_custkey = o.o_custkey)""".stripMargin
  ) { (s, d) =>
    val o = Tables.orders(s, d)
    val stats = o.groupBy("o_custkey")
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("tot"))
    o.join(stats, "o_custkey")
      .where(col("o_totalprice").cast("decimal(18,2)") * col("cnt") > col("tot"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
  }

  /** Event-time RANGE window frame — the sliding-interval complement of
    * q14's ROWS frame: per user, the count and DECIMAL sum of activity
    * in the trailing hour BEFORE each event (exclusive of it, so the
    * frame is lag-like and self-count can't mask an off-by-one). Spark's
    * rangeBetween is numeric, so the order key is epoch millis — which
    * is also what makes the oracle's RANGE frame arithmetic identical.
    * Scale shape: one hash partition by user feeding one sort, same as
    * every per-user window here. */
  val q32TimeRangeWindow: Q = Q(
    "q32_time_range_window",
    """SELECT event_id, user_id,
      |  count(*) OVER w AS n_prev_hour,
      |  CAST(coalesce(sum(CAST(value AS DECIMAL(18,6))) OVER w, 0) AS DOUBLE) AS v_prev_hour
      |FROM (SELECT event_id, user_id, value, epoch_ms(ts) AS tms FROM events)
      |WINDOW w AS (PARTITION BY user_id ORDER BY tms
      |  RANGE BETWEEN 3600000 PRECEDING AND 1 PRECEDING)""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("tms"))
      .rangeBetween(-3600000L, -1L)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("value"),
        unix_millis(col("ts")).as("tms"))
      .select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_prev_hour"),
        coalesce(sum(col("value").cast("decimal(18,6)")).over(w), lit(0))
          .cast("double").as("v_prev_hour"))
  }

  /** Explicit GROUPING SETS — the custom-combination form rollup (q12)
    * and cube (q20) are shorthands for: per-status totals, per-priority
    * totals, and the grand total in ONE Expand pass, WITHOUT the
    * (status, priority) cross cells a cube would add. Null group cells
    * are disambiguated from genuine nulls by grouping() flags computed
    * per column on both engines (Spark's grouping_id bit order is
    * API-dependent; per-column flags are not). DECIMAL money sums. */
  val q33GroupingSets: Q = Q(
    "q33_grouping_sets",
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
      |  CAST(grouping(o_orderpriority) AS INTEGER) AS g_prio,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  count(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping(col("o_orderstatus")).cast("int").as("g_status"),
        grouping(col("o_orderpriority")).cast("int").as("g_prio"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"),
        count(lit(1)).as("n"))
  }

  /** Correlated LATERAL join — per-BUILDING-customer top-2 orders via a
    * correlated ORDER BY ... LIMIT subquery, the decorrelation twin of
    * q31 (scalar subquery → aggregate+join) for the per-group-top-k
    * shape: the lateral's row-generating correlated limit is what q3
    * writes directly as a rank window. The Spark program runs Spark 4's
    * own SQL `JOIN LATERAL` (DataFrames have no lateral operator), so
    * this query checks Catalyst's lateral decorrelation end-to-end
    * against DuckDB executing the same LATERAL natively — and PlanSpec
    * pins that the decorrelated plan is a window + ONE equi-join, never
    * a per-row nested-loop re-execution (which is precisely the
    * at-scale failure a naive lateral implementation hits). Ties are
    * broken by (o_totalprice DESC, o_orderkey), so both engines pick
    * identical top-2 sets. */
  val q34Lateral: Q = Q(
    "q34_lateral",
    """SELECT c.c_custkey, c.c_name, t.o_orderkey, t.o_totalprice
      |FROM customer c, LATERAL (
      |  SELECT o_orderkey, o_totalprice
      |  FROM orders WHERE o_custkey = c.c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      |WHERE c.c_mktsegment = 'BUILDING'""".stripMargin
  ) { (s, d) =>
    Tables.customer(s, d).createOrReplaceTempView("graft_q34_customer")
    Tables.orders(s, d).createOrReplaceTempView("graft_q34_orders")
    s.sql(
      """SELECT c.c_custkey, c.c_name, t.o_orderkey, t.o_totalprice
        |FROM graft_q34_customer c
        |JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice
        |  FROM graft_q34_orders WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |WHERE c.c_mktsegment = 'BUILDING'""".stripMargin)
  }

  /** UNPIVOT / melt — wide-to-long reshaping (the inverse of q25's
    * pivot): lineitem's four numeric measures melt into (measure, value)
    * rows, then aggregate per (flag, measure). Spark's `Dataset.unpivot`
    * and DuckDB's SQL-standard UNPIVOT both emit the source COLUMN NAME
    * as the measure value, so the grouping keys match cross-engine
    * byte-for-byte. Scale shape: unpivot is a zero-shuffle projection
    * (each input row explodes to 4), and the aggregation combines
    * map-side — one exchange total. DECIMAL sums, order-free. */
  val q35Unpivot: Q = Q(
    "q35_unpivot",
    """SELECT l_returnflag, measure,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total, count(*) AS n
      |FROM (
      |  SELECT l_returnflag, measure, value FROM (
      |    SELECT l_returnflag, l_quantity, l_extendedprice, l_discount, l_tax
      |    FROM lineitem)
      |  UNPIVOT (value FOR measure IN (l_quantity, l_extendedprice, l_discount, l_tax)))
      |GROUP BY 1, 2""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
        "measure", "value")
      .groupBy("l_returnflag", "measure")
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("total"),
        count(lit(1)).as("n"))
  }

  def all: Seq[Q] = Seq(
    q1Agg, q2JoinRevenue, q3TopOrders, q4SymUnionAgg, q5SortLimit,
    q6FilterRevenue, q7Stats, q8TokenCounts, q9Distinct, q10AntiJoin,
    q11SemiJoin, q12Rollup, q13Json, q14RunningSum, q15LagGap,
    q16RangeJoin, q17Yearly, q18CaseAgg, q19AsOf, q20Cube, q21SetOps,
    q22Percentiles, q23Strings, q24Exists, q25Pivot, q26Ntile, q27SaltedAgg,
    q28ApproxPercentiles, q29Sessions, q30FullOuter, q31ScalarSubquery,
    q32TimeRangeWindow, q33GroupingSets, q34Lateral, q35Unpivot)
}
