package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY.md §2.4 — aggregations.
  *
  * Reference shapes: the `--status` grouped counts (`agent-loop.sh:144-151`
  * — 4 separate jq scans collapsed into ONE grouped pass here), token
  * accounting (`agent-loop.sh:414-426`), distinct sessions
  * (`telegram-agent.py:510`), the rollup summary (`agent-loop.sh:817-854`),
  * derived `pending = total − Σ(others)` (`agent-loop.sh:151`).
  *
  * Scale notes: every aggregate here is a hash aggregate with map-side
  * partial aggregation — the shuffle carries one row per (group × partial),
  * not the data. Distinct counts at 100 TB should prefer
  * `approx_count_distinct` (q_agg_approx_distinct); the exact variant
  * shuffles the full key set. Double sums go through DECIMAL partials
  * (Tables.decSum) so results are order-independent under any partitioning.
  */
object Aggs {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // The flagship `--status` aggregation: one grouped scan replaces the
    // reference's 4 full-document passes.
    "q_agg_count_by_status" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy("o_orderstatus")),

    // Same counts in one pass via conditional aggregation (COUNT FILTER).
    "q_agg_filtered" -> ((s, dir) =>
      Tables.orders(s, dir)
        .agg(
          count(when(col("o_orderstatus") === "O", 1)).as("n_open"),
          count(when(col("o_orderstatus") === "F", 1)).as("n_done"),
          count(when(col("o_orderstatus") === "P", 1)).as("n_partial"),
          count(lit(1)).as("n_total"))),

    // TPC-H Q1 shape: the token-accounting sum fold. Decimal partials keep
    // the double sums exact and order-independent.
    "q_agg_sum_tokens" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Tables.decSum(col("l_quantity")).as("sum_qty"),
          Tables.decSum(col("l_extendedprice")).as("sum_base"),
          Tables.decSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")),

    "q_agg_distinct" -> ((s, dir) =>
      Tables.events(s, dir)
        .agg(countDistinct(col("user_id")).as("n_users"))),

    // HLL sketch — the 100 TB shape of q_agg_distinct (no exact-key
    // shuffle). Estimates differ from DuckDB's HLL → no oracle; accuracy
    // is asserted in OperatorSpec (±5% of exact).
    "q_agg_approx_distinct" -> ((s, dir) =>
      Tables.events(s, dir)
        .agg(approx_count_distinct(col("user_id")).as("n_users_approx"))),

    // Hierarchical summary: per (priority, status), per priority, grand
    // total — the reference's show_summary in one grouping-sets pass.
    "q_agg_rollup" -> ((s, dir) =>
      Tables.orders(s, dir)
        .rollup(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .select(
          coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("n"))
        .orderBy("prio", "status")),

    "q_agg_cube" -> ((s, dir) =>
      Tables.orders(s, dir)
        .cube(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .select(
          coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("n"))
        .orderBy("prio", "status")),

    // Explicit GROUPING SETS — the third member of the cube/rollup
    // family (a custom lattice: each dimension alone plus the grand
    // total, WITHOUT the cross cells cube would add). Spelled via
    // spark.sql — the DataFrame API has no groupingSets until 4.x's
    // SQL path; the plan is the same Expand as cube's, so the cost
    // model matches. NULL markers coalesce to 'ALL' (the cube key's
    // convention) — sum aliased per the column-name contract.
    "q_agg_grouping_sets" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders_gs")
      s.sql("""
        SELECT coalesce(o_orderpriority, 'ALL') AS prio,
               coalesce(o_orderstatus, 'ALL') AS status,
               count(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        ORDER BY prio, status""")
    }),

    // Arithmetic over aggregates: pending = total − Σ(known states).
    "q_agg_derived" -> ((s, dir) =>
      Tables.orders(s, dir)
        .agg(
          count(lit(1)).as("n_total"),
          count(when(col("o_orderstatus") === "O", 1)).as("n_open"),
          count(when(col("o_orderstatus") === "F", 1)).as("n_done"))
        .select(
          col("n_total"), col("n_open"), col("n_done"),
          (col("n_total") - col("n_open") - col("n_done")).as("n_pending"),
          Tables.floorLong(col("n_open") * 100L / col("n_total")).as("open_pct"))),

    // Exact interpolated percentiles (both engines use the same
    // linear-interpolation definition over sorted values). SCALE
    // CAVEAT: exact `percentile` buffers EVERY group value in the
    // aggregation buffer — at ~N/3 rows per status this is the
    // per-group analog of a driver collect and OOMs executors at
    // 100 TB. This key exists for oracle-exact semantics; the
    // production path is q_agg_percentile_approx below (SCALE.md
    // §Percentiles).
    "q_agg_percentile" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(
          expr("percentile(o_totalprice, 0.5)").as("median_price"),
          expr("percentile(o_totalprice, 0.9)").as("p90_price"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")),

    // The 100 TB percentile: percentile_approx's bounded sketch
    // (Greenwald-Khanna; buffer size scales with the accuracy knob,
    // NOT the group size) replaces the exact variant's
    // buffer-every-value shape. accuracy=10000 ⟹ rank error ≤
    // 0.01% of the group — for most groups that is value-exact.
    // No DuckDB oracle (its approx_quantile is a t-digest; sketch
    // internals differ by construction, same split as the HLL key);
    // OperatorSpec pins the rank-error bound against the exact
    // aggregate instead.
    "q_agg_percentile_approx" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(
          expr("percentile_approx(o_totalprice, 0.5, 10000)")
            .as("median_price_approx"),
          expr("percentile_approx(o_totalprice, 0.9, 10000)")
            .as("p90_price_approx"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")),

    // Statistical moments from EXACT decimal power sums: built-in
    // stddev/corr accumulate doubles in partition order (nondeterministic
    // across engines), so variance/correlation are reassembled from
    // decimal Σx, Σx², Σxy — order-free, then one double formula both
    // engines evaluate identically.
    "q_agg_stats" -> ((s, dir) => {
      val x = col("l_quantity")
      val y = col("l_extendedprice")
      def dsum(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(28,6)"))
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          dsum(x).as("sx"), dsum(x * x).as("sxx"),
          dsum(y).as("sy"), dsum(y * y).as("syy"), dsum(x * y).as("sxy"))
        .select(col("l_returnflag"), col("n").as("nl"),
          // The SUMS are exact decimals (order-free); the FORMULA runs in
          // double on both engines (decimal division scale rules differ
          // between Spark and DuckDB, IEEE doubles do not).
          col("sx").cast("double").as("sx"), col("sxx").cast("double").as("sxx"),
          col("sy").cast("double").as("sy"), col("syy").cast("double").as("syy"),
          col("sxy").cast("double").as("sxy"))
        .select(col("l_returnflag"), col("nl").as("n"),
          round((col("sxx") - col("sx") * col("sx") / col("nl")) /
                (col("nl") - 1), 4).as("var_qty"),
          round((col("nl") * col("sxy") - col("sx") * col("sy")) /
                sqrt((col("nl") * col("sxx") - col("sx") * col("sx")) *
                     (col("nl") * col("syy") - col("sy") * col("sy"))), 6)
            .as("corr_qty_price"))
        .orderBy("l_returnflag")
    }),

    // Pivot: the status × priority matrix (the reference's summary
    // display as a crosstab). Explicit value list keeps the output
    // schema static — never pivot on an open domain at scale (the
    // column-discovery pass is a full distinct scan).
    "q_agg_pivot" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select(col("o_orderpriority"),
          col("O").as("n_open"), col("F").as("n_done"), col("P").as("n_partial"))
        .orderBy("o_orderpriority")),

    // Two-phase salted aggregation — the skew pattern: a heavy-hitter
    // group key first aggregates under (key, salt) so no single task owns
    // a hot key, then the per-salt partials merge. Result is identical to
    // the direct aggregate (the oracle IS the direct aggregate); decimal
    // partials make the double sum associative so re-aggregation is
    // exact. At 100 TB this is the manual fallback when AQE skew
    // splitting can't apply (e.g. pre-shuffle hot keys in groupBy).
    "q_agg_salted" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"),
                 pmod(col("l_orderkey"), lit(8)).as("salt"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,4)")).as("part_qty"),
          count(lit(1)).as("part_n"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(col("part_qty")).cast("double").as("sum_qty"),
          sum(col("part_n")).as("n"))
        .orderBy("l_returnflag")),

    // min/max/first per group. min/max of doubles are exact picks (no
    // arithmetic), so they compare bit-exactly; "first" is made
    // deterministic as min_by over the unique o_orderkey.
    "q_agg_min_max_first" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"),
          min(col("o_orderkey")).as("first_key"),
          date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("first_date"))
        .orderBy("o_orderstatus")),
  )

  val oracle: Map[String, String] = Map(
    "q_agg_count_by_status" -> """
      SELECT o_orderstatus, count(*) AS n FROM orders
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q_agg_filtered" -> """
      SELECT count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
             count(*) FILTER (WHERE o_orderstatus = 'F') AS n_done,
             count(*) FILTER (WHERE o_orderstatus = 'P') AS n_partial,
             count(*) AS n_total
      FROM orders""",

    "q_agg_sum_tokens" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc,
             count(*) AS n
      FROM lineitem
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "q_agg_distinct" ->
      "SELECT count(DISTINCT user_id) AS n_users FROM events",

    "q_agg_rollup" -> """
      SELECT coalesce(o_orderpriority, 'ALL') AS prio,
             coalesce(o_orderstatus, 'ALL') AS status,
             count(*) AS n
      FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
      ORDER BY prio, status""",

    "q_agg_cube" -> """
      SELECT coalesce(o_orderpriority, 'ALL') AS prio,
             coalesce(o_orderstatus, 'ALL') AS status,
             count(*) AS n
      FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
      ORDER BY prio, status""",

    "q_agg_grouping_sets" -> """
      SELECT coalesce(o_orderpriority, 'ALL') AS prio,
             coalesce(o_orderstatus, 'ALL') AS status,
             count(*) AS n
      FROM orders
      GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
      ORDER BY prio, status""",

    "q_agg_derived" -> """
      WITH a AS (
        SELECT count(*) AS n_total,
               count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS n_done
        FROM orders)
      SELECT n_total, n_open, n_done,
             n_total - n_open - n_done AS n_pending,
             CAST(floor(n_open * 100 / n_total) AS BIGINT) AS open_pct
      FROM a""",

    "q_agg_percentile" -> """
      SELECT o_orderstatus,
             quantile_cont(o_totalprice, 0.5) AS median_price,
             quantile_cont(o_totalprice, 0.9) AS p90_price,
             count(*) AS n
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q_agg_stats" -> """
      WITH m AS (
        SELECT l_returnflag, count(*) AS n,
               sum(CAST(l_quantity AS DECIMAL(28,6))) AS sx,
               sum(CAST(l_quantity * l_quantity AS DECIMAL(28,6))) AS sxx,
               sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS sy,
               sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,6))) AS syy,
               sum(CAST(l_quantity * l_extendedprice AS DECIMAL(28,6))) AS sxy
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, n,
             round((sxx - sx * sx / n) / (n - 1), 4) AS var_qty,
             round((n * sxy - sx * sy) /
                   sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr_qty_price
      FROM (
        SELECT l_returnflag, n,
               CAST(sx AS DOUBLE) AS sx, CAST(sxx AS DOUBLE) AS sxx,
               CAST(sy AS DOUBLE) AS sy, CAST(syy AS DOUBLE) AS syy,
               CAST(sxy AS DOUBLE) AS sxy
        FROM m)
      ORDER BY l_returnflag""",

    "q_agg_pivot" -> """
      SELECT o_orderpriority,
             count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
             count(*) FILTER (WHERE o_orderstatus = 'F') AS n_done,
             count(*) FILTER (WHERE o_orderstatus = 'P') AS n_partial
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q_agg_salted" -> """
      SELECT l_returnflag,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
             count(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_agg_min_max_first" -> """
      SELECT o_orderstatus,
             min(o_totalprice) AS min_price,
             max(o_totalprice) AS max_price,
             min(o_orderkey) AS first_key,
             strftime(min(o_orderdate), '%Y-%m-%d') AS first_date
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
  )
}
