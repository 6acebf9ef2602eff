package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The relational operator inventory (SURVEY.md §2) expressed on the
  * driver's TPC-H-ish tables, one QueryDef per operator family, each with
  * a DuckDB oracle.
  *
  * Numeric-parity convention: sums over arbitrary doubles are
  * order-dependent, so every money aggregation goes through exact integer
  * cents — `floor(x * 100)` cast to long — computed identically (IEEE
  * double ops) by Spark and DuckDB. Counts, mins/maxes, dates and strings
  * compare exactly as-is.
  *
  * Scale notes are attached per query: what shuffles, what broadcasts,
  * what pushes down.
  */
object CoreQueries {

  /** P1+P8 projection & rename — column pruning must reach the scan
    * (ReadSchema shows only 3 of 11 lineitem columns).
    * Ref: SURVEY.md §2.2 P1/P8 (build_database.py:81-85,187-197). */
  val q01 = QueryDef.oracle("q01_scan_project",
    "SELECT l_orderkey, l_linenumber, l_quantity AS qty FROM lineitem")(
    (s, d) => Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity").as("qty")))

  /** P7 predicate filter (watermark-style strict >) — pushed to parquet
    * (PushedFilters: GreaterThan(l_shipdate, ...)); at 100 TB this is the
    * difference between reading one partition and reading all of them.
    * Ref: SURVEY.md §2.2 P7 (build_database.py:114-116). */
  val q02 = QueryDef.oracle("q02_filter_pushdown",
    """SELECT l_orderkey, l_shipdate, l_extendedprice FROM lineitem
      |WHERE l_shipdate > TIMESTAMP '1999-06-15 00:00:00' AND l_quantity < 10""".stripMargin)(
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit("1999-06-15 00:00:00").cast("timestamp") &&
        col("l_quantity") < 10)
      .select("l_orderkey", "l_shipdate", "l_extendedprice"))

  /** P2+P3 regex extract + cast — scalar, stays in WholeStageCodegen.
    * Ref: SURVEY.md §2.2 P2/P3 (build_database.py:86-87). */
  val q03 = QueryDef.oracle("q03_regex_extract_cast",
    """SELECT c_custkey, CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS name_num
      |FROM customer""".stripMargin)(
    (s, d) => Tables.customer(s, d)
      .select(col("c_custkey"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).cast("long").as("name_num")))

  /** P5 case normalization (the reference lowercases every string column
    * before any join — load-bearing). Ref: SURVEY.md §2.2 P5. */
  val q04 = QueryDef.oracle("q04_lower_normalize",
    """SELECT p_partkey, lower(p_name) AS p_name_lc, lower(p_type) AS p_type_lc,
      |       upper(p_brand) AS p_brand_uc FROM part""".stripMargin)(
    (s, d) => Tables.part(s, d)
      .select(col("p_partkey"), lower(col("p_name")).as("p_name_lc"),
        lower(col("p_type")).as("p_type_lc"), upper(col("p_brand")).as("p_brand_uc")))

  /** P6 literal column + concat (constant folding leaves no per-row cost).
    * Ref: SURVEY.md §2.2 P6 (build_database.py:113,128,143). */
  val q05 = QueryDef.oracle("q05_literal_concat",
    """SELECT n_nationkey, n_name, 'graft' AS engine_tag,
      |       n_name || '-' || CAST(n_regionkey AS VARCHAR) AS tagged FROM nation""".stripMargin)(
    (s, d) => Tables.nation(s, d)
      .select(col("n_nationkey"), col("n_name"), lit("graft").as("engine_tag"),
        concat(col("n_name"), lit("-"), col("n_regionkey").cast("string")).as("tagged")))

  /** P9 date truncation + P10 CASE-without-ELSE in one scan.
    * Ref: SURVEY.md §2.2 P9/P10 (poc_tables.sql:9,26-29). */
  val q06 = QueryDef.oracle("q06_date_case",
    """SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_day,
      |       CASE WHEN l_quantity < 25 THEN 'low'
      |            WHEN l_quantity >= 40 THEN 'high' END AS band
      |FROM lineitem""".stripMargin)(
    (s, d) => Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        to_date(col("l_shipdate")).as("ship_day"),
        when(col("l_quantity") < 25, "low")
          .when(col("l_quantity") >= 40, "high").as("band"))) // no otherwise => NULL mid-band

  /** P4 deterministic surrogate keys via row_number over a global order.
    * Scale note: a single-partition window — correct but serial; for big
    * tables prefer zipWithIndex-style per-partition offsets. Kept on the
    * small supplier dim where the global sort is trivial.
    * Ref: SURVEY.md §2.2 P4 (build_database.py:82-85). */
  val q07 = QueryDef.oracle("q07_surrogate_key",
    """SELECT ROW_NUMBER() OVER (ORDER BY s_suppkey) - 1 AS sid, s_suppkey, s_name
      |FROM supplier""".stripMargin)(
    (s, d) => Tables.supplier(s, d)
      .select((row_number().over(Window.orderBy("s_suppkey")) - 1).as("sid"),
        col("s_suppkey"), col("s_name")))

  /** A1 scalar min/max/count aggregate (the watermark computation).
    * Partial aggregation map-side → one-row exchange. Ref: §2.3 A1. */
  val q08 = QueryDef.oracle("q08_scalar_agg",
    """SELECT max(l_shipdate) AS max_ship, min(l_shipdate) AS min_ship,
      |       count(*) AS n_rows FROM lineitem""".stripMargin)(
    (s, d) => Tables.lineitem(s, d)
      .agg(max("l_shipdate").as("max_ship"), min("l_shipdate").as("min_ship"),
        count(lit(1)).as("n_rows")))

  /** A2 DISTINCT — hash-aggregate with map-side partials. Ref: §2.3 A2. */
  val q09 = QueryDef.oracle("q09_distinct",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem")(
    (s, d) => Tables.lineitem(s, d).select("l_returnflag", "l_linestatus").distinct())

  /** A3 multi-key GROUP BY with count + exact cents sums (TPC-H Q1 shape).
    * Partial agg map-side; the exchange carries only grouped partials.
    * Ref: §2.3 A3 (poc_tables.sql:8-19). */
  val q10 = QueryDef.oracle("q10_group_agg",
    """SELECT l_returnflag, l_linestatus,
      |       CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
      |       CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
      |       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
      |       count(*) AS n_rows
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin)(
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2000-09-02 00:00:00").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(floor(col("l_quantity")).cast("long")).as("sum_qty"),
        sum(floor(col("l_extendedprice") * 100).cast("long")).as("sum_base_cents"),
        sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100).cast("long"))
          .as("sum_disc_cents"),
        count(lit(1)).as("n_rows")))

  /** A4+O1 keep-newest dedup: row_number over (key ORDER BY ts DESC, id
    * DESC) = 1 — the deterministic form of pandas sort+drop_duplicates.
    * Shuffles once on the key; no global sort.
    * Ref: §2.3 A4, §2.6 O1 (build_database.py:207-219). */
  val q11 = QueryDef.oracle("q11_dedup_keep_newest",
    """SELECT o_custkey, o_orderkey AS latest_orderkey, o_orderdate AS latest_date
      |FROM (SELECT o_custkey, o_orderkey, o_orderdate,
      |             ROW_NUMBER() OVER (PARTITION BY o_custkey
      |               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |      FROM orders) WHERE rn = 1""".stripMargin)(
    (s, d) => Tables.orders(s, d)
      .withColumn("rn", row_number().over(
        Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey").as("latest_orderkey"),
        col("o_orderdate").as("latest_date")))

  /** J1 left equi-join fact→dim; dim side broadcast (part ≪ threshold at
    * test SF; at 100 TB part is still ~1% of lineitem — broadcast hint
    * keeps it a broadcast-hash join, no fact shuffle). Ref: §2.4 J1. */
  val q12 = QueryDef.oracle("q12_join_left_broadcast",
    """SELECT l_orderkey, l_linenumber, l_partkey, p_brand, p_type
      |FROM lineitem LEFT JOIN part ON l_partkey = p_partkey""".stripMargin)(
    (s, d) => Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)),
        col("l_partkey") === col("p_partkey"), "left")
      .select("l_orderkey", "l_linenumber", "l_partkey", "p_brand", "p_type"))

  /** J2 composite-key left join against a derived dim (the bar_stock
    * two-column join). The dim is an aggregate of orders itself; broadcast
    * after aggregation. Ref: §2.4 J2 (poc_tables.sql:30-34). */
  val q13 = QueryDef.oracle("q13_join_composite_key",
    """SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus, dim.status_orders
      |FROM orders o LEFT JOIN (
      |  SELECT o_custkey AS k_cust, o_orderstatus AS k_status, count(*) AS status_orders
      |  FROM orders GROUP BY o_custkey, o_orderstatus) dim
      |ON o.o_custkey = dim.k_cust AND o.o_orderstatus = dim.k_status""".stripMargin)(
    (s, d) => {
      val o = Tables.orders(s, d)
      val dim = o.groupBy(col("o_custkey").as("k_cust"), col("o_orderstatus").as("k_status"))
        .agg(count(lit(1)).as("status_orders"))
      o.join(broadcast(dim),
          o("o_custkey") === dim("k_cust") && o("o_orderstatus") === dim("k_status"), "left")
        .select(o("o_orderkey"), o("o_custkey"), o("o_orderstatus"), dim("status_orders"))
    })

  /** FULL OUTER join of two date-grained aggregates — dates present on
    * only one side survive with NULLs on the other. Both inputs are
    * pre-aggregated to |dates| rows before the join, so the outer join
    * itself is tiny regardless of fact size; each agg combines map-side.
    */
  val q47 = QueryDef.oracle("q47_full_outer_join",
    """SELECT COALESCE(o.d, l.d) AS day, o.n_orders, l.n_ship
      |FROM (SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n_orders
      |      FROM orders GROUP BY 1) o
      |FULL OUTER JOIN
      |     (SELECT CAST(l_shipdate AS DATE) AS d, count(*) AS n_ship
      |      FROM lineitem GROUP BY 1) l
      |ON o.d = l.d""".stripMargin)(
    (s, d) => {
      val o = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("od")).agg(count(lit(1)).as("n_orders"))
      val l = Tables.lineitem(s, d)
        .groupBy(to_date(col("l_shipdate")).as("ld")).agg(count(lit(1)).as("n_ship"))
      o.join(l, col("od") === col("ld"), "full_outer")
        .select(coalesce(col("od"), col("ld")).as("day"),
          col("n_orders"), col("n_ship"))
    })

  /** Explicit CROSS JOIN (cartesian) of two tiny dims — completes the
    * join-type matrix. Only ever sane when at least one side is bounded;
    * both sides here are broadcast-sized by construction.
    */
  val q90 = QueryDef.oracle("q90_cross_join",
    """SELECT r_name, n_name FROM region CROSS JOIN nation""".stripMargin)(
    (s, d) => Tables.region(s, d).select("r_name")
      .crossJoin(Tables.nation(s, d).select("n_name")))

  /** EXCEPT ALL — bag semantics (each row's multiplicity subtracts),
    * unlike q23's set-based EXCEPT. Catalyst rewrites it as a counted
    * aggregate + generate, no sort.
    */
  val q91 = QueryDef.oracle("q91_except_all",
    """SELECT o_custkey FROM orders WHERE o_orderstatus <> 'F'
      |EXCEPT ALL
      |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'""".stripMargin)(
    (s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_orderstatus") =!= "F").select("o_custkey")
        .exceptAll(o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey"))
    })

  /** RANGE-frame window: per customer, order count within the preceding
    * 30 days of each order — value-based frames (q18/q28 cover row-based
    * ones). The frame is over the orderBy VALUE, so ties share a frame.
    */
  val q92 = QueryDef.oracle("q92_range_frame_window",
    """SELECT o_custkey, o_orderkey,
      |       count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
      |                      RANGE BETWEEN INTERVAL 30 DAYS PRECEDING
      |                            AND CURRENT ROW) AS n_last_30d
      |FROM orders""".stripMargin)(
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey")
        .orderBy(col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-30L * 86400, 0)
      Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"),
        count(lit(1)).over(w).as("n_last_30d"))
    })

  /** U1 n-way UNION ALL (schema-aligned by name) + P6 source tag.
    * Ref: §2.5 U1 (build_database.py:162). */
  val q14 = QueryDef.oracle("q14_union_all",
    """SELECT o_orderkey, o_totalprice, 'urgent' AS src FROM orders WHERE o_orderpriority = '1-URGENT'
      |UNION ALL
      |SELECT o_orderkey, o_totalprice, 'high' AS src FROM orders WHERE o_orderpriority = '2-HIGH'
      |UNION ALL
      |SELECT o_orderkey, o_totalprice, 'low' AS src FROM orders WHERE o_orderpriority = '5-LOW'""".stripMargin)(
    (s, d) => {
      val o = Tables.orders(s, d)
      def slice(p: String, tag: String) =
        o.filter(col("o_orderpriority") === p)
          .select(col("o_orderkey"), col("o_totalprice"), lit(tag).as("src"))
      slice("1-URGENT", "urgent").unionByName(slice("2-HIGH", "high"))
        .unionByName(slice("5-LOW", "low"))
    })

  /** U2 UNION DISTINCT across two tables. Ref: §2.5 U2. */
  val q15 = QueryDef.oracle("q15_union_distinct",
    """SELECT c_nationkey AS nk FROM customer UNION SELECT s_nationkey AS nk FROM supplier""".stripMargin)(
    (s, d) => Tables.customer(s, d).select(col("c_nationkey").as("nk"))
      .union(Tables.supplier(s, d).select(col("s_nationkey").as("nk"))).distinct())

  /** O1 global sort + top-k with deterministic tie-break. Spark plans
    * TakeOrderedAndProject — no full sort materialization. */
  val q16 = QueryDef.oracle("q16_topk",
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)(
    (s, d) => Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select("o_orderkey", "o_totalprice").limit(100))

  /** §2.8 flagship: the poc_analysis shape on TPC-H — scan → broadcast
    * left join → hash agg → broadcast left join → CASE-no-ELSE project.
    * grouped_drinks ≙ daily demand per (day, brand, flag); stock dim ≙
    * per-brand capacity. */
  val q17 = QueryDef.oracle("q17_poc_analysis",
    """WITH grouped AS (
      |  SELECT CAST(l_shipdate AS DATE) AS day, p_brand, l_returnflag,
      |         count(l_orderkey) AS cnt
      |  FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
      |  GROUP BY CAST(l_shipdate AS DATE), p_brand, l_returnflag),
      |stock AS (
      |  SELECT p_brand AS sb_brand, CAST(max(p_size) AS BIGINT) * 3 AS stock
      |  FROM part GROUP BY p_brand)
      |SELECT g.day, g.p_brand, g.l_returnflag, g.cnt, st.stock,
      |       CASE WHEN g.cnt < st.stock THEN 'no issue'
      |            WHEN g.cnt >= st.stock THEN 'potential issue' END AS comment
      |FROM grouped g LEFT JOIN stock st ON g.p_brand = st.sb_brand""".stripMargin)(
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      val grouped = li.join(broadcast(p), col("l_partkey") === col("p_partkey"), "left")
        .groupBy(to_date(col("l_shipdate")).as("day"), col("p_brand"), col("l_returnflag"))
        .agg(count(col("l_orderkey")).as("cnt"))
      val stock = p.groupBy(col("p_brand").as("sb_brand"))
        .agg((max("p_size").cast("long") * 3).as("stock"))
      grouped.join(broadcast(stock), col("p_brand") === col("sb_brand"), "left")
        .select(col("day"), col("p_brand"), col("l_returnflag"), col("cnt"), col("stock"),
          when(col("cnt") < col("stock"), "no issue")
            .when(col("cnt") >= col("stock"), "potential issue").as("comment"))
    })

  /** Window functions (rank / lag / running sum) — beyond-reference
    * extension (SURVEY.md §2.9). One shuffle on the partition key. */
  val q18 = QueryDef.oracle("q18_window_funcs",
    """SELECT o_custkey, o_orderkey,
      |       RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rnk,
      |       LAG(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_order,
      |       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
      |         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents
      |FROM orders""".stripMargin)(
    (s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        rank().over(w).as("rnk"),
        lag(col("o_orderkey"), 1).over(w).as("prev_order"),
        sum(floor(col("o_totalprice") * 100).cast("long"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("running_cents"))
    })

  /** ROLLUP hierarchy totals — beyond-reference (SURVEY.md §2.9). */
  val q19 = QueryDef.oracle("q19_rollup",
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |       CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin)(
    (s, d) => Tables.lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum(floor(col("l_quantity")).cast("long")).as("sum_qty")))

  /** CUBE over two dims — beyond-reference (SURVEY.md §2.9). */
  val q20 = QueryDef.oracle("q20_cube",
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin)(
    (s, d) => Tables.orders(s, d)
      .cube("o_orderstatus", "o_orderpriority").agg(count(lit(1)).as("n")))

  /** Left-semi + left-anti joins (EXISTS / NOT EXISTS) — beyond-reference.
    * Semi/anti avoid materializing the join: only existence is shuffled. */
  val q21 = QueryDef.oracle("q21_semi_anti",
    """SELECT c_custkey, 'buyer' AS kind FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |UNION ALL
      |SELECT c_custkey, 'dormant' AS kind FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin)(
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).select(col("o_custkey"))
      val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), lit("buyer").as("kind"))
      val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), lit("dormant").as("kind"))
      semi.unionByName(anti)
    })

  /** INTERSECT — beyond-reference set op. */
  val q22 = QueryDef.oracle("q22_intersect",
    """SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey AS nk FROM supplier""".stripMargin)(
    (s, d) => Tables.customer(s, d).select(col("c_nationkey").as("nk"))
      .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nk"))))

  /** EXCEPT — beyond-reference set op. */
  val q23 = QueryDef.oracle("q23_except",
    """SELECT n_nationkey AS nk FROM nation EXCEPT SELECT s_nationkey AS nk FROM supplier""".stripMargin)(
    (s, d) => Tables.nation(s, d).select(col("n_nationkey").as("nk"))
      .except(Tables.supplier(s, d).select(col("s_nationkey").as("nk"))))

  /** Multi-way star join: region → nation → customer → orders with
    * broadcast dims, grouped revenue in exact cents (TPC-H Q5 shape). */
  val q24 = QueryDef.oracle("q24_star_join",
    """SELECT r_name, n_name, count(*) AS n_orders,
      |       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name""".stripMargin)(
    (s, d) => Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice") * 100).cast("long")).as("rev_cents")))

  val defs: Seq[QueryDef] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12, q13,
    q14, q15, q16, q17, q18, q19, q20, q21, q22, q23, q24, q47, q90, q91, q92)
}
