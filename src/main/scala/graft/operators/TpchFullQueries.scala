package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** The remaining canonical TPC-H query shapes (Q1, Q2, Q6–Q16, Q19–Q22),
  * adapted to the driver testdata schema (no partsupp table, no
  * commit/receipt dates, no phone/comment columns — see TESTDATA.md).
  * Together with TpchQueries (Q3/Q18/Q5/Q17/Q4-shapes) this makes the
  * engine's analytic surface a complete TPC-H-class suite.
  *
  * Conventions (same as TpchQueries):
  *   - Money math in exact integer cents (`FLOOR(x * 100) AS BIGINT`)
  *     on BOTH engines, so float summation order can never diverge the
  *     oracle hash. Ratios/averages are a SINGLE double division of two
  *     exact integers — bitwise deterministic on both engines.
  *   - DuckDB promotes SUM(BIGINT) to HUGEINT; every summed output is
  *     wrapped `CAST(... AS BIGINT)` at the output position.
  *   - Only fixed-cardinality dims (nation=25, region=5) get explicit
  *     broadcast hints: customer/orders/lineitem/part/supplier all scale
  *     with SF, so their join strategy is left to AQE rather than baked
  *     in as a hint that would be wrong at 100 TB.
  *   - Correlated/nested-subquery shapes go through spark.sql on purpose:
  *     the parse → analyze → decorrelate lifecycle is the operator under
  *     test (same stance as q85–q87).
  */
object TpchFullQueries {

  /** Q1: pricing summary report — the canonical wide-aggregate scan.
    * One pass over lineitem, 6 aggregates over 4-ish groups; partial
    * (map-side) aggregation means the exchange carries only
    * |groups|×|aggs| longs. Averages are sum/count of exact ints.
    */
  val q101 = QueryDef.oracle("q101_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |       CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
      |       CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS base_cents,
      |       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS disc_cents,
      |       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS charge_cents,
      |       count(*) AS n,
      |       CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / count(*) AS avg_price_cents,
      |       CAST(SUM(CAST(FLOOR(l_discount * 10000) AS BIGINT)) AS DOUBLE) / count(*) AS avg_disc_bp
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin)(
    (s, d) => {
      val base = floor(col("l_extendedprice") * 100)
      val disc = floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
      val charge = floor(col("l_extendedprice") * (lit(1) - col("l_discount")) *
        (lit(1) + col("l_tax")) * 100)
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2001-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(floor(col("l_quantity"))).as("sum_qty"),
          sum(base).as("base_cents"),
          sum(disc).as("disc_cents"),
          sum(charge).as("charge_cents"),
          count(lit(1)).as("n"),
          (sum(base).cast("double") / count(lit(1))).as("avg_price_cents"),
          (sum(floor(col("l_discount") * 10000)).cast("double") / count(lit(1)))
            .as("avg_disc_bp"))
    })

  /** Q6: forecasting-revenue change — scalar aggregate whose entire
    * predicate set (date range, discount band, quantity cap) pushes to
    * the parquet scan; the "shuffle" is one row of partials per task.
    */
  val q102 = QueryDef.oracle("q102_revenue_forecast",
    """SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT) AS promo_rev_cents,
      |       count(*) AS n
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin)(
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sum(floor(col("l_extendedprice") * col("l_discount") * 100))
          .as("promo_rev_cents"),
        count(lit(1)).as("n")))

  /** Q7: volume shipping between two nations — the two-role dimension
    * pattern (nation joined once through supplier, once through
    * customer). Both nation joins broadcast (25 rows); the symmetric
    * pair filter applies post-join on broadcast columns, so the fact
    * tables shuffle only for their own equi-joins.
    */
  val q103 = QueryDef.oracle("q103_volume_shipping",
    """SELECT supp_nation, cust_nation, yr,
      |       CAST(SUM(cents) AS BIGINT) AS rev_cents
      |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |             CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS yr,
      |             CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS cents
      |      FROM lineitem
      |      JOIN orders ON l_orderkey = o_orderkey
      |      JOIN customer ON o_custkey = c_custkey
      |      JOIN supplier ON l_suppkey = s_suppkey
      |      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') shipping
      |GROUP BY supp_nation, cust_nation, yr""".stripMargin)(
    (s, d) => {
      val n1 = broadcast(Tables.nation(s, d)
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation")))
      val n2 = broadcast(Tables.nation(s, d)
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation")))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(n1, col("s_nationkey") === col("n1_key"))
        .join(n2, col("c_nationkey") === col("n2_key"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("yr"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100))
          .as("rev_cents"))
    })

  /** Q8: national market share — conditional aggregation over a 6-table
    * join; numerator and denominator emitted as exact cents plus the
    * share as one double division (deterministic on both engines).
    */
  val q104 = QueryDef.oracle("q104_market_share",
    """SELECT yr,
      |       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN cents ELSE 0 END) AS BIGINT) AS nation_cents,
      |       CAST(SUM(cents) AS BIGINT) AS total_cents,
      |       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN cents ELSE 0 END) AS DOUBLE)
      |         / SUM(cents) AS share
      |FROM (SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
      |             sn.n_name AS supp_nation,
      |             CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS cents
      |      FROM lineitem
      |      JOIN orders ON l_orderkey = o_orderkey
      |      JOIN customer ON o_custkey = c_custkey
      |      JOIN nation cn ON c_nationkey = cn.n_nationkey
      |      JOIN region ON cn.n_regionkey = r_regionkey
      |      JOIN supplier ON l_suppkey = s_suppkey
      |      JOIN nation sn ON s_nationkey = sn.n_nationkey
      |      WHERE r_name = 'EUROPE'
      |        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00') all_sales
      |GROUP BY yr""".stripMargin)(
    (s, d) => {
      val custNations = broadcast(Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cn_key")))
      val suppNations = broadcast(Tables.nation(s, d)
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation")))
      val cents = floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
      val natCents = sum(when(col("supp_nation") === "NATION_3", cents).otherwise(0L))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(custNations, col("c_nationkey") === col("cn_key"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(suppNations, col("s_nationkey") === col("sn_key"))
        .groupBy(year(col("o_orderdate")).as("yr"))
        .agg(natCents.as("nation_cents"),
          sum(cents).as("total_cents"),
          (natCents.cast("double") / sum(cents)).as("share"))
    })

  /** Q9: product-type profit by nation and year. No partsupp table, so
    * supply cost is proxied as 10% of retail price × quantity — the join
    * and aggregation topology (part filter → fact join → two-level group)
    * is the shape under test, not the cost model.
    */
  val q105 = QueryDef.oracle("q105_product_profit",
    """SELECT n_name, yr, CAST(SUM(profit_cents) AS BIGINT) AS profit_cents
      |FROM (SELECT s_nationkey, CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS yr,
      |             CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
      |               - CAST(FLOOR(p_retailprice * l_quantity * 10) AS BIGINT) AS profit_cents
      |      FROM lineitem
      |      JOIN part ON l_partkey = p_partkey
      |      JOIN supplier ON l_suppkey = s_suppkey
      |      WHERE p_name LIKE '%widget%') profit
      |JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name, yr""".stripMargin)(
    (s, d) => Tables.lineitem(s, d)
      .join(Tables.part(s, d).filter(col("p_name").like("%widget%")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("l_shipdate")).as("yr"))
      .agg(sum(
        floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100).cast("long")
          - floor(col("p_retailprice") * col("l_quantity") * 10).cast("long"))
        .as("profit_cents")))

  /** Q10: returned-item reporting — revenue lost to returns per customer,
    * top 20. The only large-large shuffle is customer⋈orders; nation
    * broadcasts; top-20 plans as TakeOrderedAndProject (no global sort).
    */
  val q106 = QueryDef.oracle("q106_returned_items",
    """SELECT c_custkey, c_name, n_name,
      |       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY rev_cents DESC, c_custkey LIMIT 20""".stripMargin)(
    (s, d) => Tables.customer(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
            col("o_orderdate") < lit("1997-04-01 00:00:00").cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100))
        .as("rev_cents"))
      .orderBy(col("rev_cents").desc, col("c_custkey")).limit(20))

  /** Q12 shape: late-shipment priority counts. No receipt/commit dates in
    * the testdata, so "late" = shipped more than 60 days after the order
    * date; the conditional-count-by-priority aggregation is the shape.
    */
  val q107 = QueryDef.oracle("q107_late_shipment_priority",
    """SELECT l_linestatus,
      |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      |GROUP BY l_linestatus""".stripMargin)(
    (s, d) => {
      val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(sum(when(isHigh, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(isHigh, 0L).otherwise(1L)).as("low_line_count"))
    })

  /** Q13: customer order-count distribution — LEFT join so zero-order
    * customers survive, then a histogram of the per-customer counts.
    * Two chained aggregations; the second one's input is |customers|
    * rows of (key, count) — skinny by construction.
    */
  val q108 = QueryDef.oracle("q108_customer_distribution",
    """WITH c_orders AS (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON c_custkey = o_custkey AND o_orderstatus <> 'F'
      |  GROUP BY c_custkey)
      |SELECT c_count, count(*) AS custdist
      |FROM c_orders GROUP BY c_count""".stripMargin)(
    (s, d) => Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderstatus") =!= "F"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist")))

  /** Q14: promotion effect — conditional share of one month's revenue.
    * Promo and total emitted as exact cents; the percentage is a single
    * double expression evaluated identically on both engines.
    */
  val q109 = QueryDef.oracle("q109_promo_revenue",
    """SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN disc_cents ELSE 0 END) AS BIGINT) AS promo_cents,
      |       CAST(SUM(disc_cents) AS BIGINT) AS total_cents,
      |       (100.0 * SUM(CASE WHEN p_type = 'PROMO' THEN disc_cents ELSE 0 END))
      |         / SUM(disc_cents) AS promo_share
      |FROM (SELECT p_type,
      |             CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS disc_cents
      |      FROM lineitem JOIN part ON l_partkey = p_partkey
      |      WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      |        AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00') t""".stripMargin)(
    (s, d) => {
      val cents = floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
        .cast("long")
      val promo = sum(when(col("p_type") === "PROMO", cents).otherwise(0L))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-09-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1997-10-01 00:00:00").cast("timestamp"))
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .agg(promo.as("promo_cents"),
          sum(cents).as("total_cents"),
          ((lit(100.0) * promo) / sum(cents)).as("promo_share"))
    })

  /** Q15: top supplier — an aggregate CTE consumed twice (once as join
    * input, once inside a scalar-subquery MAX). Spark plans the CTE with
    * WithCTE reuse; the MAX side collapses to a one-row broadcast.
    */
  val q110 = QueryDef.oracle("q110_top_supplier",
    """WITH rev AS (
      |  SELECT l_suppkey AS supplier_no,
      |         CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_cents
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_cents
      |FROM supplier JOIN rev ON s_suppkey = supplier_no
      |WHERE total_cents = (SELECT MAX(total_cents) FROM rev)""".stripMargin)(
    (s, d) => s.sql(
      s"""WITH rev AS (
         |  SELECT l_suppkey AS supplier_no,
         |         CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_cents
         |  FROM parquet.`$d/lineitem.parquet`
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_cents
         |FROM parquet.`$d/supplier.parquet` JOIN rev ON s_suppkey = supplier_no
         |WHERE total_cents = (SELECT MAX(total_cents) FROM rev)""".stripMargin))

  /** Q16 shape: supplier counts per part attribute. partsupp is derived
    * as DISTINCT (l_partkey, l_suppkey) from lineitem; the NOT IN
    * subquery (negative-balance suppliers) exercises the null-aware
    * anti-join against a grouped COUNT DISTINCT.
    */
  val q111 = QueryDef.oracle("q111_supplier_part_counts",
    """WITH supply AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
      |SELECT p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM supply JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#1'
      |  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_type, p_size""".stripMargin)(
    (s, d) => s.sql(
      s"""WITH supply AS (SELECT DISTINCT l_partkey, l_suppkey FROM parquet.`$d/lineitem.parquet`)
         |SELECT p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
         |FROM supply JOIN parquet.`$d/part.parquet` ON p_partkey = l_partkey
         |WHERE p_brand <> 'Brand#1'
         |  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
         |  AND l_suppkey NOT IN (SELECT s_suppkey FROM parquet.`$d/supplier.parquet` WHERE s_acctbal < 0)
         |GROUP BY p_type, p_size""".stripMargin))

  /** Q19: discounted revenue under disjunctive brand/size/quantity
    * predicates — the classic OR-of-ANDs join filter. Catalyst extracts
    * the common `p_partkey = l_partkey` conjunct so the join stays an
    * equi-join with the disjunction as a post-join filter.
    */
  val q112 = QueryDef.oracle("q112_disjunctive_revenue",
    """SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS rev_cents,
      |       count(*) AS n
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 15  AND l_quantity >= 1  AND l_quantity <= 21)
      |   OR (p_brand = 'Brand#7'  AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10 AND l_quantity <= 30)
      |   OR (p_brand = 'Brand#12' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 20 AND l_quantity <= 40)""".stripMargin)(
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      val cond =
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
          col("l_quantity") >= 1 && col("l_quantity") <= 21) ||
        (col("p_brand") === "Brand#7" && col("p_size").between(10, 30) &&
          col("l_quantity") >= 10 && col("l_quantity") <= 30) ||
        (col("p_brand") === "Brand#12" && col("p_size").between(20, 50) &&
          col("l_quantity") >= 20 && col("l_quantity") <= 40)
      li.join(p, col("p_partkey") === col("l_partkey"))
        .filter(cond)
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100))
            .as("rev_cents"),
          count(lit(1)).as("n"))
    })

  /** Q20 shape: suppliers with heavy part movement — a semi-join against
    * a grouped HAVING subquery (IN over an aggregate), nation-filtered.
    */
  val q113 = QueryDef.oracle("q113_qualified_suppliers",
    """SELECT s_suppkey, s_name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4','NATION_5')
      |  AND s_suppkey IN (
      |    SELECT l_suppkey FROM lineitem
      |    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |    GROUP BY l_suppkey, l_partkey
      |    HAVING SUM(CAST(FLOOR(l_quantity) AS BIGINT)) > 60)""".stripMargin)(
    (s, d) => s.sql(
      s"""SELECT s_suppkey, s_name
         |FROM parquet.`$d/supplier.parquet`
         |JOIN parquet.`$d/nation.parquet` ON s_nationkey = n_nationkey
         |WHERE n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4','NATION_5')
         |  AND s_suppkey IN (
         |    SELECT l_suppkey FROM parquet.`$d/lineitem.parquet`
         |    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         |    GROUP BY l_suppkey, l_partkey
         |    HAVING SUM(CAST(FLOOR(l_quantity) AS BIGINT)) > 60)""".stripMargin))

  /** Q21 shape: suppliers whose line shipped last in a multi-supplier
    * order — correlated EXISTS + NOT EXISTS against the same fact table,
    * both decorrelated by Catalyst into semi/anti joins on l_orderkey.
    * ("last to ship" stands in for the reference's receipt-vs-commit
    * lateness, which needs columns the testdata lacks.)
    */
  val q114 = QueryDef.oracle("q114_waiting_orders",
    """SELECT s_name, count(*) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |WHERE o_orderstatus = 'F'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > l1.l_shipdate)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin)(
    (s, d) => {
      // Spark side: ONE pass over lineitem instead of three. The two
      // correlated subqueries only probe per-order facts — "is there
      // another supplier" and "did any other supplier ship later" — so
      // aggregate each order's per-supplier last ship date, keep the
      // top-2 (date, supplier) pairs, and evaluate both predicates
      // against them. The SQL form decorrelates into a semi + anti join
      // that each shuffle-and-sort full lineitem again; this shape
      // replaces those with one keyed agg whose output is |orders|-sized.
      val li = Tables.lineitem(s, d).select("l_orderkey", "l_suppkey", "l_shipdate")
      // Filter to F-orders FIRST (the selective side), then ONE keyed
      // aggregation collects each order's lines — bounded: TPC-H orders
      // have ≤7 lines, so the array is O(1) — and both correlated
      // predicates ("another supplier exists" / "no other supplier
      // shipped later") evaluate as array HOFs inside that row. The
      // order-key join leaves the data hash-partitioned on l_orderkey,
      // so the groupBy right after it reuses the partitioning: ONE
      // lineitem-sized shuffle total (the earlier form paid three —
      // per-supplier agg, per-order agg, and the join back).
      val perOrder = li
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F")
          .select("o_orderkey"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(collect_list(struct(col("l_shipdate"), col("l_suppkey"))).as("lines"))
      val waiting = perOrder.select(explode(filter(col("lines"), l =>
          exists(col("lines"), x =>
            x("l_suppkey") =!= l("l_suppkey")) &&
          !exists(col("lines"), x =>
            x("l_suppkey") =!= l("l_suppkey") && x("l_shipdate") > l("l_shipdate"))))
          .as("w"))
        .select(col("w.l_suppkey").as("l_suppkey"))
      waiting
        .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name").agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name")).limit(20)
    })

  /** Q22 shape: rich customers dormant since 1999 (no recent orders) — scalar-subquery average
    * (computed in exact cents so the threshold is bit-identical on both
    * engines) plus NOT EXISTS anti-join, grouped by market segment.
    */
  val q115 = QueryDef.oracle("q115_dormant_customers",
    """SELECT c_mktsegment, count(*) AS numcust,
      |       CAST(SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS totacctbal_cents
      |FROM customer
      |WHERE CAST(FLOOR(c_acctbal * 100) AS BIGINT) > (
      |    SELECT CAST(SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / count(*)
      |    FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
      |GROUP BY c_mktsegment""".stripMargin)(
    (s, d) => s.sql(
      s"""SELECT c_mktsegment, count(*) AS numcust,
         |       CAST(SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS totacctbal_cents
         |FROM parquet.`$d/customer.parquet`
         |WHERE CAST(FLOOR(c_acctbal * 100) AS BIGINT) > (
         |    SELECT CAST(SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / count(*)
         |    FROM parquet.`$d/customer.parquet` WHERE c_acctbal > 0.0)
         |  AND NOT EXISTS (SELECT 1 FROM parquet.`$d/orders.parquet` WHERE o_custkey = c_custkey
         |                  AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
         |GROUP BY c_mktsegment""".stripMargin))

  /** Q2 shape: minimum-cost supplier per part — supply cost derived from
    * lineitem (min unit price in cents per part-supplier pair), then the
    * classic correlated-MIN scalar subquery over the same derived table.
    * Unit price is one double division per row (identical both engines)
    * before the exact-integer floor.
    *
    * Spark side is DataFrame code, not the correlated SQL: Spark inlines
    * a WITH twice, so the SQL form aggregates all of lineitem TWICE (two
    * full scans + two full-width shuffles — 3.1 s at sf0.1, and the 2×
    * cost only grows at 100 TB). Instead: filter part FIRST (p_size/
    * p_type are selective), broadcast the surviving keys into a semi
    * join so the big aggregate only sees relevant rows, compute supply
    * ONCE, and take the per-part minimum with a window over the already
    * part-partitioned aggregate — lineitem is scanned once and the
    * shuffled volume is |filtered parts'| lineitem share, not 2×|lineitem|.
    */
  val q116 = QueryDef.oracle("q116_min_cost_supplier",
    """WITH supply AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |         MIN(CAST(FLOOR(l_extendedprice / l_quantity * 100) AS BIGINT)) AS ps_supplycost
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT p_partkey, p_name, s_name, n_name, ps_supplycost
      |FROM part
      |JOIN supply ON p_partkey = ps_partkey
      |JOIN supplier ON s_suppkey = ps_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_size <= 5 AND p_type = 'LARGE'
      |  AND ps_supplycost = (SELECT MIN(s2.ps_supplycost) FROM supply s2
      |                       WHERE s2.ps_partkey = p_partkey)""".stripMargin)(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      // selective dim first: the filtered part side reaches the fact join
      // pre-pruned (AQE broadcasts it at test SF; at 100 TB it stays a
      // keyed shuffle join, which is the right call there too)
      val p = Tables.part(s, d)
        .filter(col("p_size") <= 5 && col("p_type") === "LARGE")
        .select("p_partkey", "p_name")
      val supply = Tables.lineitem(s, d)
        .join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_partkey"), col("p_name"), col("l_suppkey").as("ps_suppkey"))
        .agg(min(floor(col("l_extendedprice") / col("l_quantity") * 100)
          .cast("long")).as("ps_supplycost"))
      // the correlated MIN: a window over the agg output — the only
      // re-exchange carries |filtered parts × their suppliers| rows of
      // (key, cost), nothing at any scale
      val w = Window.partitionBy("p_partkey")
      supply
        .withColumn("min_cost", min(col("ps_supplycost")).over(w))
        .filter(col("ps_supplycost") === col("min_cost"))
        .join(Tables.supplier(s, d), col("ps_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .select("p_partkey", "p_name", "s_name", "n_name", "ps_supplycost")
    })

  /** Referential-integrity audit across the star schema — the
    * constraint checks a lakehouse runs because parquet enforces none:
    * orphaned children (FK → missing parent) via anti joins and
    * childless parents via anti join the other way. Each check is one
    * keyed anti-join whose exchange carries only the key column; the
    * four one-row summaries union. 257 childless orders exist in the
    * synthetic data, so the violation path is exercised, not vacuous.
    */
  val q135 = QueryDef.oracle("q135_referential_integrity",
    """SELECT * FROM (
      |  SELECT 'lineitem_orphan_order' AS chk,
      |         CAST((SELECT count(*) FROM lineitem l
      |               WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                                 WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
      |           AS n_violations,
      |         CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_total
      |  UNION ALL
      |  SELECT 'order_orphan_customer',
      |         CAST((SELECT count(*) FROM orders o
      |               WHERE NOT EXISTS (SELECT 1 FROM customer c
      |                                 WHERE c.c_custkey = o.o_custkey)) AS BIGINT),
      |         CAST((SELECT count(*) FROM orders) AS BIGINT)
      |  UNION ALL
      |  SELECT 'customer_orphan_nation',
      |         CAST((SELECT count(*) FROM customer c
      |               WHERE NOT EXISTS (SELECT 1 FROM nation n
      |                                 WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT),
      |         CAST((SELECT count(*) FROM customer) AS BIGINT)
      |  UNION ALL
      |  SELECT 'order_childless',
      |         CAST((SELECT count(*) FROM orders o
      |               WHERE NOT EXISTS (SELECT 1 FROM lineitem l
      |                                 WHERE l.l_orderkey = o.o_orderkey)) AS BIGINT),
      |         CAST((SELECT count(*) FROM orders) AS BIGINT))""".stripMargin)(
    (s, d) => {
      def audit(name: String, child: org.apache.spark.sql.DataFrame, childKey: String,
                parent: org.apache.spark.sql.DataFrame, parentKey: String) = {
        val viol = child.select(childKey)
          .join(parent.select(parentKey), col(childKey) === col(parentKey), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
        child.agg(count(lit(1)).as("n_total"))
          .crossJoin(viol)
          .select(lit(name).as("chk"), col("n_violations"), col("n_total"))
      }
      val li = Tables.lineitem(s, d); val o = Tables.orders(s, d)
      val c = Tables.customer(s, d); val n = Tables.nation(s, d)
      audit("lineitem_orphan_order", li, "l_orderkey", o, "o_orderkey")
        .unionByName(audit("order_orphan_customer", o, "o_custkey", c, "c_custkey"))
        .unionByName(audit("customer_orphan_nation", c, "c_nationkey", n, "n_nationkey"))
        .unionByName(audit("order_childless", o, "o_orderkey", li, "l_orderkey"))
    })

  val defs: Seq[QueryDef] = Seq(
    q101, q102, q103, q104, q105, q106, q107, q108,
    q109, q110, q111, q112, q113, q114, q115, q116, q135)
}
