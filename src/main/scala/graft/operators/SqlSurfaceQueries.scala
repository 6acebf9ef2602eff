package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Function-surface coverage: the ranking/navigation window family, the
  * string toolbox, and the datetime toolbox, each exercised in one query
  * and hash-checked against DuckDB's implementations of the same
  * functions. These pin cross-engine semantics (ntile distribution,
  * percent_rank/cume_dist rationals, add_months end-of-month clamping,
  * ISO week numbering, dayofweek origin) that differ silently between
  * engines when assumed.
  */
object SqlSurfaceQueries {

  /** Every ranking/navigation window function over one deterministic
    * (unique-key) ordering. percent_rank/cume_dist are exact rationals
    * rounded identically; nth_value/lead defaults pin the running-frame
    * and default-value semantics.
    */
  val q141 = QueryDef.oracle("q141_window_suite",
    """SELECT o_orderkey, o_custkey,
      |       CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
      |       CAST(RANK() OVER w AS BIGINT) AS rnk,
      |       CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
      |       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
      |       round(PERCENT_RANK() OVER w, 6) AS pct_rank,
      |       round(CUME_DIST() OVER w, 6) AS cume,
      |       LAG(o_orderkey, 1) OVER w AS prev_key,
      |       LEAD(o_orderkey, 2, -1) OVER w AS next2_key,
      |       FIRST_VALUE(o_orderkey) OVER w AS first_key,
      |       NTH_VALUE(o_orderkey, 3) OVER w AS third_key
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin)(
    (s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
        row_number().over(w).cast("long").as("rn"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        lag(col("o_orderkey"), 1).over(w).as("prev_key"),
        lead(col("o_orderkey"), 2, -1).over(w).as("next2_key"),
        first(col("o_orderkey")).over(w).as("first_key"),
        nth_value(col("o_orderkey"), 3).over(w).as("third_key"))
    })

  /** The string toolbox over part names — pad/reverse/split/translate/
    * repeat/position/case functions, engine-parity pinned per function.
    * Scan-stage only. */
  val q142 = QueryDef.oracle("q142_string_suite",
    """SELECT p_partkey,
      |       lpad(p_name, 30, '.') AS padded_l,
      |       rpad(p_name, 30, '.') AS padded_r,
      |       reverse(p_name) AS rev,
      |       split_part(p_name, ' ', 2) AS second_word,
      |       translate(p_name, 'aeiou', '01234') AS translated,
      |       repeat(left(p_name, 3), 2) AS rep,
      |       strpos(p_name, 'al') AS pos_al,
      |       upper(right(p_name, 4)) AS tail_upper,
      |       substring(p_name, 3, 8) AS mid,
      |       concat_ws('|', p_type, p_brand) AS type_brand,
      |       CAST(length(p_name) AS BIGINT) AS name_len
      |FROM part""".stripMargin)(
    (s, d) => Tables.part(s, d).select(col("p_partkey"),
      lpad(col("p_name"), 30, ".").as("padded_l"),
      rpad(col("p_name"), 30, ".").as("padded_r"),
      reverse(col("p_name")).as("rev"),
      split_part(col("p_name"), lit(" "), lit(2)).as("second_word"),
      translate(col("p_name"), "aeiou", "01234").as("translated"),
      repeat(expr("left(p_name, 3)"), 2).as("rep"),
      instr(col("p_name"), "al").as("pos_al"),
      upper(expr("right(p_name, 4)")).as("tail_upper"),
      substring(col("p_name"), 3, 8).as("mid"),
      concat_ws("|", col("p_type"), col("p_brand")).as("type_brand"),
      length(col("p_name")).cast("long").as("name_len")))

  /** The datetime toolbox over order dates — extraction fields, ISO week
    * numbering, end-of-month clamping (add_months), day arithmetic.
    * dayofweek origins differ (Spark 1=Sunday, DuckDB 0=Sunday) — the
    * oracle normalizes, pinning the mapping explicitly. */
  val q143 = QueryDef.oracle("q143_datetime_suite",
    """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d,
      |       CAST(year(o_orderdate) AS INTEGER) AS y,
      |       CAST(quarter(o_orderdate) AS INTEGER) AS q,
      |       CAST(month(o_orderdate) AS INTEGER) AS m,
      |       CAST(dayofmonth(o_orderdate) AS INTEGER) AS dom,
      |       CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
      |       CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow_sun1,
      |       CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
      |       last_day(o_orderdate) AS month_end,
      |       CAST(o_orderdate AS DATE) + 30 AS plus30,
      |       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
      |       CAST(CAST(o_orderdate AS DATE) - DATE '2000-01-01' AS BIGINT) AS days_since_y2k
      |FROM orders""".stripMargin)(
    (s, d) => {
      val dt = to_date(col("o_orderdate"))
      Tables.orders(s, d).select(col("o_orderkey"), dt.as("d"),
        year(dt).as("y"), quarter(dt).as("q"), month(dt).as("m"),
        dayofmonth(dt).as("dom"), dayofyear(dt).as("doy"),
        dayofweek(dt).as("dow_sun1"), weekofyear(dt).as("iso_week"),
        last_day(dt).as("month_end"),
        date_add(dt, 30).as("plus30"),
        add_months(dt, 3).as("plus3m"),
        datediff(dt, lit("2000-01-01").cast("date")).cast("long").as("days_since_y2k"))
    })

  /** Conditional aggregation: count_if / bool_or / bool_and / FILTERed
    * sums and the null-respecting count family, per order priority —
    * one pass, map-side combined. Spark's count_if/bool_* map to
    * DuckDB's FILTER clause and bool aggregates; the cents
    * integerization keeps the filtered sum exact.
    */
  val q144 = QueryDef.oracle("q144_conditional_agg",
    """SELECT o_orderpriority,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(count(*) FILTER (WHERE o_totalprice > 150000) AS BIGINT) AS n_big,
      |       bool_or(o_orderstatus = 'F') AS any_f,
      |       bool_and(o_totalprice > 0) AS all_positive,
      |       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
      |            FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS open_cents,
      |       CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses
      |FROM orders GROUP BY o_orderpriority""".stripMargin)(
    (s, d) => Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        count_if(col("o_totalprice") > 150000).as("n_big"),
        bool_or(col("o_orderstatus") === "F").as("any_f"),
        bool_and(col("o_totalprice") > 0).as("all_positive"),
        sum(when(col("o_orderstatus") === "O",
          floor(col("o_totalprice") * 100).cast("long"))).as("open_cents"),
        countDistinct("o_orderstatus").as("n_statuses")))

  /** Join-key skew profiler — the diagnostic run BEFORE picking a join
    * strategy: per-key frequency stats of the fact side's join column
    * (lineitem.l_suppkey), the skew ratio (hottest key vs mean), and the
    * top-5 hottest keys. This is what decides between a plain shuffle
    * join, AQE skew splitting, and q75's salting. One map-side-combined
    * aggregation; the stats reduce to one row + a bounded top-k.
    */
  val q146 = QueryDef.oracle("q146_join_skew_profile",
    """WITH f AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n
      |           FROM lineitem GROUP BY 1),
      |st AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
      |              CAST(max(n) AS BIGINT) AS max_n,
      |              CAST(SUM(n) AS BIGINT) AS total
      |       FROM f)
      |SELECT f.l_suppkey, f.n,
      |       CAST(ROW_NUMBER() OVER (ORDER BY f.n DESC, f.l_suppkey) AS BIGINT) AS hot_rank,
      |       round(f.n * st.n_keys / CAST(st.total AS DOUBLE), 4) AS skew_ratio,
      |       st.n_keys, st.total
      |FROM f, st
      |QUALIFY hot_rank <= 5""".stripMargin)(
    (s, d) => {
      val f = Tables.lineitem(s, d).groupBy("l_suppkey").agg(count(lit(1)).as("n"))
      val st = f.agg(count(lit(1)).as("n_keys"), max("n").as("max_n"), sum("n").as("total"))
      val top = f.orderBy(col("n").desc, col("l_suppkey")).limit(5)
      val w = Window.orderBy(col("n").desc, col("l_suppkey"))
      top.withColumn("hot_rank", row_number().over(w).cast("long"))
        .crossJoin(broadcast(st))
        .select(col("l_suppkey"), col("n"), col("hot_rank"),
          round(col("n") * col("n_keys") / col("total").cast("double"), 4).as("skew_ratio"),
          col("n_keys"), col("total"))
    })

  /** SKEW REMEDIATION PLAN — the decision step after q146's diagnosis:
    * given per-key counts of a genuinely hot join key (events.
    * event_type — 5 keys carrying the whole fact, the shape a
    * category/status join always has), derive the plan AQE or a
    * salting rewrite would execute, in exact integers: target
    * partition rows T = total/32 (the cluster's even split), per key
    * n_splits = ⌈n/T⌉, post-split residual rows per task, and the
    * strategy verdict — `none` (fits one task), `aqe_split` (AQE's
    * runtime partition splitting handles ≤ 8 ways cleanly), `salt`
    * (hotter than that: replicate the dim side over a salt column,
    * q75's rewrite). This is q253's sibling one level down: q253
    * audits WHICH join, this audits HOW the shuffle survives the key
    * distribution. Scale shape: one map-side-combined key rollup + a
    * 1-row total broadcast; |keys|-row output. HASH-MATCHED. */
  val q262 = QueryDef.oracle("q262_skew_remediation_plan",
    """WITH f AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
      |           FROM events GROUP BY 1),
      |st AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
      |              CAST(GREATEST(SUM(n) // 32, 1) AS BIGINT) AS t_rows
      |       FROM f),
      |p AS (SELECT f.event_type, f.n, st.total, st.t_rows,
      |        CAST((f.n + st.t_rows - 1) // st.t_rows AS BIGINT) AS n_splits
      |      FROM f, st)
      |SELECT event_type, n,
      |       CAST(n * 1000000 // total AS BIGINT) AS share_ppm,
      |       t_rows, n_splits,
      |       CAST((n + n_splits - 1) // n_splits AS BIGINT) AS rows_per_split,
      |       CASE WHEN n_splits = 1 THEN 'none'
      |            WHEN n_splits <= 8 THEN 'aqe_split'
      |            ELSE 'salt' END AS strategy
      |FROM p""".stripMargin)(
    (s, d) => {
      val f = Tables.events(s, d).groupBy("event_type")
        .agg(count(lit(1)).as("n"))
      val st = f.agg(sum("n").as("total"),
        greatest(expr("SUM(n) div 32"), lit(1L)).as("t_rows"))
      f.crossJoin(broadcast(st))
        .withColumn("n_splits", expr("(n + t_rows - 1) div t_rows"))
        .select(col("event_type"), col("n"),
          expr("CAST(n * 1000000 div total AS BIGINT)").as("share_ppm"),
          col("t_rows"), col("n_splits"),
          expr("CAST((n + n_splits - 1) div n_splits AS BIGINT)")
            .as("rows_per_split"),
          when(col("n_splits") === 1, "none")
            .when(col("n_splits") <= 8, "aqe_split")
            .otherwise("salt").as("strategy"))
    })

  /** AQE SKEW-DECISION AUDIT — the last edge of the optimizer-audit
    * loop (q244 stats → q250 cardinality → q251 selectivity → q253
    * strategy → q262 remediation → THIS: what AQE's runtime
    * OptimizeSkewedJoin should actually do). Per join candidate (the
    * two q146-profiled fact keys: events.event_type — 5 keys carrying
    * the whole fact — and lineitem.l_suppkey — ~1k keys, each tiny),
    * the exact-integer prediction under the engine's even-split
    * target: t_rows = total/32, the hottest key's rows, and
    * would_mark_skew = max_n > t_rows — a single key bigger than the
    * even split lands one shuffle partition past the advisory target
    * no matter how the hash deals keys, which is precisely the
    * condition AQE's size-threshold test detects at runtime.
    * `SkewRemediationAgreementSpec` executes BOTH real sort-merge
    * joins under AQE with byte thresholds derived from the same
    * t_rows and asserts the physical plan's skew marking agrees with
    * would_mark_skew — fired on events-by-type, silent on
    * lineitem-by-suppkey. Scale shape: two map-side-combined key
    * rollups into 1-row stats each; 2-row output. HASH-MATCHED. */
  val q280 = QueryDef.oracle("q280_aqe_skew_audit",
    """WITH ev AS (SELECT event_type AS k, CAST(count(*) AS BIGINT) AS n
      |            FROM events GROUP BY 1),
      |li AS (SELECT CAST(l_suppkey AS VARCHAR) AS k,
      |              CAST(count(*) AS BIGINT) AS n
      |       FROM lineitem GROUP BY 1),
      |c AS (SELECT 'events_by_type' AS candidate, k, n FROM ev
      |      UNION ALL
      |      SELECT 'lineitem_by_suppkey' AS candidate, k, n FROM li),
      |st AS (SELECT candidate, CAST(count(*) AS BIGINT) AS n_keys,
      |              CAST(SUM(n) AS BIGINT) AS total,
      |              CAST(MAX(n) AS BIGINT) AS max_n,
      |              CAST(GREATEST(SUM(n) // 32, 1) AS BIGINT) AS t_rows
      |       FROM c GROUP BY 1)
      |SELECT candidate, n_keys, total, max_n, t_rows,
      |       max_n > t_rows AS would_mark_skew,
      |       CAST((max_n + t_rows - 1) // t_rows AS BIGINT) AS hot_splits
      |FROM st""".stripMargin)(
    (s, d) => {
      def keyCounts(df: org.apache.spark.sql.DataFrame,
          key: org.apache.spark.sql.Column, cand: String) =
        df.groupBy(key.cast("string").as("k"))
          .agg(count(lit(1)).as("n"))
          .agg(count(lit(1)).as("n_keys"), sum("n").as("total"),
            max("n").as("max_n"))
          .select(lit(cand).as("candidate"), col("n_keys"), col("total"),
            col("max_n"),
            greatest(expr("total div 32"), lit(1L)).as("t_rows"))
      keyCounts(Tables.events(s, d), col("event_type"), "events_by_type")
        .unionByName(keyCounts(Tables.lineitem(s, d), col("l_suppkey"),
          "lineitem_by_suppkey"))
        .select(col("candidate"), col("n_keys"), col("total"), col("max_n"),
          col("t_rows"),
          (col("max_n") > col("t_rows")).as("would_mark_skew"),
          expr("CAST((max_n + t_rows - 1) div t_rows AS BIGINT)")
            .as("hot_splits"))
    })

  val defs: Seq[QueryDef] = Seq(q141, q142, q143, q144, q146, q262, q280)
}
