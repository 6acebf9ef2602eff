package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classic analytic query shapes (TPC-H Q3/Q18-style, plus a from_json
  * struct parse) — deeper multi-join + having + top-k coverage than the
  * single-operator inventory. All money math in exact integer cents.
  */
object TpchQueries {

  /** Q3 shape: shipping-priority — segment filter on the customer dim,
    * two joins, date-window filters on both fact tables, grouped revenue,
    * top-10. Customer/orders broadcast candidates; lineitem never
    * shuffles except for the final grouped agg.
    */
  val q80 = QueryDef.oracle("q80_shipping_priority",
    """SELECT l_orderkey, o_orderdate,
      |       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < DATE '1998-06-01' AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY rev_cents DESC, l_orderkey LIMIT 10""".stripMargin)(
    (s, d) => Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, d).filter(col("o_orderdate") < lit("1998-06-01").cast("date")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d)
          .filter(col("l_shipdate") > lit("1998-06-01 00:00:00").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "o_orderdate")
      .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
        .cast("long")).as("rev_cents"))
      .orderBy(col("rev_cents").desc, col("l_orderkey")).limit(10))

  /** Q18 shape: large-quantity orders — a HAVING subquery (grouped fact
    * filtered on its aggregate) joined back to orders + customer. The
    * having-dim is small post-filter, so it broadcasts into the re-join.
    */
  val q81 = QueryDef.oracle("q81_large_orders",
    """WITH big AS (
      |  SELECT l_orderkey, CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING SUM(CAST(FLOOR(l_quantity) AS BIGINT)) > 210)
      |SELECT c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
      |FROM big JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey""".stripMargin)(
    (s, d) => {
      val big = Tables.lineitem(s, d).groupBy("l_orderkey")
        .agg(sum(floor(col("l_quantity")).cast("long")).as("total_qty"))
        .filter(col("total_qty") > 210)
      // the HAVING dim is tiny post-filter (~1e-3 of orders) — broadcast
      // it into the orders join, and the (equally small) joined result
      // into the customer join, so neither fact table ever shuffles.
      // Without the hints a stale-stats planner picks SMJ on full orders.
      val bigOrders = broadcast(big)
        .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
      broadcast(bigOrders)
        .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
        .select("c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    })

  /** Top-N per group (most valuable order per customer segment-month) —
    * the rank-filter pattern over a composite partition.
    */
  val q82 = QueryDef.oracle("q82_topn_per_group",
    """SELECT * FROM (
      |  SELECT c_mktsegment, date_trunc('month', o_orderdate) AS order_month,
      |         o_orderkey, o_totalprice,
      |         ROW_NUMBER() OVER (
      |           PARTITION BY c_mktsegment, date_trunc('month', o_orderdate)
      |           ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders JOIN customer ON o_custkey = c_custkey)
      |WHERE rn <= 3""".stripMargin)(
    (s, d) => {
      val joined = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .withColumn("order_month",
          date_trunc("month", col("o_orderdate")).cast("date"))
      val w = Window.partitionBy("c_mktsegment", "order_month")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      joined.select(col("c_mktsegment"), col("order_month"),
          col("o_orderkey"), col("o_totalprice"), row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
    })

  /** Q5 shape: local-supplier volume — six-table join (region → nation →
    * supplier/customer → orders → lineitem) with the customer-nation =
    * supplier-nation co-location predicate. All dims broadcast; the only
    * shuffles are customer⋈orders (both large at scale) and the final
    * grouped agg, whose exchange carries 25 nation rows of partials.
    */
  val q83 = QueryDef.oracle("q83_local_supplier_volume",
    """SELECT n_name,
      |       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'EUROPE'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name""".stripMargin)(
    (s, d) => {
      val euroNations = broadcast(
        Tables.nation(s, d).join(
          broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey")))
      Tables.customer(s, d)
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp")),
          col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(euroNations, col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long")).as("rev_cents"))
    })

  /** Q17 shape: small-quantity-order revenue — per-group average joined
    * back against the detail rows (the decorrelated scalar-subquery
    * pattern). The avg side is |partkey|-sized — NOT broadcastable at
    * 100 TB — so this stays a shuffle join on l_partkey; the groupBy
    * already partitioned the avg side by that key, so its exchange is
    * reused and only the detail side shuffles.
    */
  val q84 = QueryDef.oracle("q84_avg_qty_backjoin",
    """WITH avgq AS (
      |  SELECT l_partkey AS ap_partkey, AVG(l_quantity) AS avg_qty
      |  FROM lineitem GROUP BY l_partkey)
      |SELECT l_partkey, count(*) AS n_small,
      |       CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |FROM lineitem JOIN avgq ON l_partkey = ap_partkey
      |WHERE l_quantity < 0.5 * avg_qty
      |GROUP BY l_partkey""".stripMargin)(
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val avgq = li.groupBy(col("l_partkey").as("ap_partkey"))
        .agg(avg("l_quantity").as("avg_qty"))
      li.join(avgq, col("l_partkey") === col("ap_partkey"))
        .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
        .groupBy("l_partkey")
        .agg(count(lit(1)).as("n_small"),
          sum(floor(col("l_extendedprice") * 100).cast("long")).as("cents"))
    })

  /** from_json struct parsing of the events props payload (§2.9 JSON
    * functions — q32 covers the scalar path, this the struct path).
    */
  val q35 = QueryDef.oracle("q35_from_json_struct",
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
      |       count(*) AS n, min(event_id) AS min_event
      |FROM events GROUP BY 1""".stripMargin)(
    (s, d) => Tables.events(s, d)
      .withColumn("p", from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")))
      .groupBy((col("p.k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), min("event_id").as("min_event")))

  /** Q4 shape: EXISTS correlated subquery. Catalyst decorrelates to a
    * left-semi hash join on l_orderkey — no per-row subquery execution,
    * one shuffle each side (or broadcast if the filtered fact is small).
    * Goes through spark.sql on purpose: the full parse → analyze →
    * decorrelate lifecycle is the operator under test.
    */
  val q85 = QueryDef.oracle("q85_exists_subquery",
    """SELECT o_orderpriority, count(*) AS n
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      |GROUP BY o_orderpriority""".stripMargin)(
    (s, d) => s.sql(
      s"""SELECT o_orderpriority, count(*) AS n
         |FROM parquet.`$d/orders.parquet`
         |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
         |  AND EXISTS (SELECT 1 FROM parquet.`$d/lineitem.parquet`
         |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
         |GROUP BY o_orderpriority""".stripMargin))

  /** Correlated scalar subquery (Q17's shape in subquery syntax):
    * decorrelates to an aggregate + join. Exact-cents integer comparison
    * so the oracle can't diverge on float summation order.
    */
  val q86 = QueryDef.oracle("q86_correlated_scalar",
    """SELECT o_orderkey, o_orderpriority
      |FROM orders
      |WHERE CAST(FLOOR(o_totalprice * 100) AS BIGINT) >
      |  3 * (SELECT COALESCE(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)), 0)
      |       FROM lineitem WHERE l_orderkey = o_orderkey)""".stripMargin)(
    (s, d) => s.sql(
      s"""SELECT o_orderkey, o_orderpriority
         |FROM parquet.`$d/orders.parquet`
         |WHERE CAST(FLOOR(o_totalprice * 100) AS BIGINT) >
         |  3 * (SELECT COALESCE(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)), 0)
         |       FROM parquet.`$d/lineitem.parquet` WHERE l_orderkey = o_orderkey)""".stripMargin))

  /** NOT IN subquery — the null-aware anti-join path (distinct from q21's
    * left_anti: NOT IN must return nothing if the subquery ever yields
    * NULL, so Catalyst plans a null-aware variant).
    */
  val q87 = QueryDef.oracle("q87_not_in_subquery",
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE c_custkey NOT IN (
      |  SELECT o_custkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1998-06-01 00:00:00')""".stripMargin)(
    (s, d) => s.sql(
      s"""SELECT c_custkey, c_name
         |FROM parquet.`$d/customer.parquet`
         |WHERE c_custkey NOT IN (
         |  SELECT o_custkey FROM parquet.`$d/orders.parquet`
         |  WHERE o_orderdate >= TIMESTAMP '1998-06-01 00:00:00')""".stripMargin))

  /** Correlated LATERAL join (top-2 customers per nation): the SQL-level
    * form of top-k-per-group — Catalyst decorrelates the LATERAL
    * subquery into a ranked join, no per-row subquery execution. Ordering
    * is comparison-only (no float arithmetic), tie-broken on c_custkey,
    * so the oracle (same query verbatim in DuckDB) is hash-stable;
    * output money in exact cents.
    */
  val q96 = QueryDef.oracle("q96_lateral_join",
    """SELECT n_name, t.c_name,
      |       CAST(FLOOR(t.c_acctbal * 100) AS BIGINT) AS acctbal_cents
      |FROM nation n,
      |LATERAL (SELECT c_name, c_acctbal FROM customer
      |         WHERE c_nationkey = n.n_nationkey
      |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t""".stripMargin)(
    (s, d) => s.sql(
      s"""SELECT n_name, t.c_name,
         |       CAST(FLOOR(t.c_acctbal * 100) AS BIGINT) AS acctbal_cents
         |FROM parquet.`$d/nation.parquet` n,
         |LATERAL (SELECT c_name, c_acctbal FROM parquet.`$d/customer.parquet`
         |         WHERE c_nationkey = n.n_nationkey
         |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t""".stripMargin))

  /** Recursive CTE (Spark 4's WITH RECURSIVE): calendar gap-fill — a
    * generated date spine left-joined to daily order counts, so quiet
    * days surface as zeros instead of vanishing. Scale note: recursion
    * executes iteratively on the driver side of the plan; for a
    * data-sized spine the built-in `sequence()` + explode is the
    * distributed form — this query is the SQL-completeness surface for
    * migrating WITH RECURSIVE workloads.
    */
  val q97 = QueryDef.oracle("q97_recursive_cte",
    """WITH RECURSIVE cal(d) AS (
      |  SELECT DATE '1998-01-01'
      |  UNION ALL SELECT d + 1 FROM cal WHERE d < DATE '1998-02-28')
      |SELECT cal.d AS day, count(o_orderkey) AS n_orders
      |FROM cal LEFT JOIN orders ON CAST(o_orderdate AS DATE) = cal.d
      |GROUP BY cal.d""".stripMargin)(
    (s, d) => s.sql(
      s"""WITH RECURSIVE cal(d) AS (
         |  SELECT DATE '1998-01-01'
         |  UNION ALL SELECT d + 1 FROM cal WHERE d < DATE '1998-02-28')
         |SELECT cal.d AS day, count(o_orderkey) AS n_orders
         |FROM cal LEFT JOIN parquet.`$d/orders.parquet`
         |  ON CAST(o_orderdate AS DATE) = cal.d
         |GROUP BY cal.d""".stripMargin))

  val defs: Seq[QueryDef] = Seq(q80, q81, q82, q83, q84, q85, q86, q87, q35, q96, q97)
}
