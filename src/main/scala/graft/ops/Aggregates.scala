package graft.ops

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Aggregation queries (SURVEY.md §2.B q_agg_*).
  *
  * Money math uses the exact-cents discipline: doubles that are
  * fixed-point-by-intent (prices) are scaled ×100, rounded to an exact
  * integer (identical IEEE ops on identical parquet bits in Spark and
  * DuckDB), summed as BIGINT (exact, order-independent), and only then
  * divided back — so hash-matching never depends on float summation order.
  */
object Aggregates {
  import Cols.cents

  /** Columns profiled by q_profile_columns (lineitem numerics). */
  private val profCols =
    Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax")

  def queries: Map[String, Q] = Map(
    "q_profile_columns" -> Q(
      (spark, dir) => {
        // one-scan table profiling (the ANALYZE/statistics-collection
        // shape): rows, nulls, exact distincts and min/max for every
        // profiled column computed in a SINGLE aggregate over one pass
        // of the fact, then unpivoted to a row per column. The
        // multi-column exact distinct plans as one shuffle round through
        // an Expand (×|cols| map-side); at 100 TB the swap is
        // approx_count_distinct/HLL (the q_agg_hll_sketch path) and the
        // Expand disappears — min/max/null counts stay map-combined
        // either way.
        val li = Tables(spark, dir, "lineitem")
        val aggs = count(lit(1)).as("n_rows") +: profCols.flatMap(c => Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"),
          countDistinct(col(c)).as(s"nd_$c"),
          min(col(c)).as(s"min_$c"),
          max(col(c)).as(s"max_$c")))
        li.agg(aggs.head, aggs.tail: _*)
          .select(expr(s"stack(${profCols.size}, " + profCols.map(c =>
            s"'$c', n_rows, nulls_$c, nd_$c, min_$c, max_$c")
            .mkString(", ") +
            ") AS (col_name, n_rows, n_null, n_distinct, min_v, max_v)"))
          .orderBy("col_name")
      },
      Some(profCols.map(c =>
        s"SELECT '$c' AS col_name, COUNT(*) AS n_rows, " +
        s"CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) " +
        s"AS n_null, COUNT(DISTINCT $c) AS n_distinct, " +
        s"MIN($c) AS min_v, MAX($c) AS max_v FROM lineitem")
        .mkString(" UNION ALL ") + " ORDER BY col_name")),

    "q_agg_q1" -> Q(
      (spark, dir) =>
        Tables(spark, dir, "lineitem")
          .filter(col("l_shipdate") <= Cols.ts("1998-09-02"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum(col("l_quantity").cast("long")).as("sum_qty"),
            sum(cents(col("l_extendedprice"))).as("__base_c"),
            sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
              .as("__disc_c"),
            count(lit(1)).as("count_order"))
          .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
            (col("__base_c").cast("double") / 100.0).as("sum_base"),
            (col("__disc_c").cast("double") / 100.0).as("sum_disc"),
            (col("sum_qty").cast("double") / col("count_order")).as("avg_qty"),
            col("count_order"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some("SELECT l_returnflag, l_linestatus, " +
        "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, " +
        "CAST(CAST(SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS DOUBLE)/100.0 AS sum_base, " +
        "CAST(CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100,0) AS BIGINT)) AS BIGINT) AS DOUBLE)/100.0 AS sum_disc, " +
        "CAST(CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS DOUBLE)/COUNT(*) AS avg_qty, " +
        "COUNT(*) AS count_order " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' " +
        "GROUP BY l_returnflag, l_linestatus " +
        "ORDER BY l_returnflag, l_linestatus")),

    "q_agg_percentile" -> Q(
      (spark, dir) => {
        // exact quartiles over the cents-lifted price: order statistics
        // on exact integers, so the linear interpolation ((1−d)·lo+d·hi
        // with d ∈ {0,.25,.5,.75}) is exact in double on both engines.
        // Exact percentile buffers one group's values in a single agg
        // buffer — at 100 TB the path is approx_percentile with fixed
        // accuracy; exact is used here for oracle parity at test SF.
        val c = "cast(round(l_extendedprice*100, 0) as bigint)"
        Tables(spark, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            Cols.fround(expr(s"percentile($c, 0.25)") / 100, 4).as("p25"),
            Cols.fround(expr(s"percentile($c, 0.5)") / 100, 4).as("p50"),
            Cols.fround(expr(s"percentile($c, 0.75)") / 100, 4).as("p75"))
          .orderBy("l_returnflag")
      },
      Some {
        val c = "CAST(ROUND(l_extendedprice*100, 0) AS BIGINT)"
        "SELECT l_returnflag, COUNT(*) AS n, " +
          Cols.froundSql(s"quantile_cont($c, 0.25)/100", 4) + " AS p25, " +
          Cols.froundSql(s"quantile_cont($c, 0.5)/100", 4) + " AS p50, " +
          Cols.froundSql(s"quantile_cont($c, 0.75)/100", 4) + " AS p75 " +
          "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
      }),

    "q_agg_listagg" -> Q(
      (spark, dir) => {
        // ordered string aggregation (LISTAGG): collect_list is
        // nondeterministic under shuffle, so the deterministic form is
        // sort_array before join — one hash agg, output |regions| rows.
        val nation = Tables(spark, dir, "nation")
        val region = Tables(spark, dir, "region")
        nation.join(broadcast(region),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name")
          .agg(count(lit(1)).as("n_nations"),
            array_join(sort_array(collect_list(col("n_name"))), ",")
              .as("nations"))
          .orderBy("r_name")
      },
      Some("SELECT r_name, COUNT(*) AS n_nations, " +
        "STRING_AGG(n_name, ',' ORDER BY n_name) AS nations " +
        "FROM nation JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY r_name ORDER BY r_name")),

    "q_agg_unpivot" -> Q(
      (spark, dir) => {
        // wide→long unpivot (melt): per-flag exact-integer measures to a
        // (flag, metric, value) table. The unpivot itself is narrow (an
        // Expand node — no shuffle beyond the feeding aggregation).
        val wide = Tables(spark, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
            sum(cents(col("l_extendedprice"))).as("sum_price_c"),
            count(lit(1)).as("n_rows"))
        wide.unpivot(
            ids = Array(col("l_returnflag")),
            values = Array(col("sum_qty"), col("sum_price_c"),
              col("n_rows")),
            variableColumnName = "metric",
            valueColumnName = "value")
          .orderBy("l_returnflag", "metric")
      },
      Some("WITH w AS (SELECT l_returnflag, " +
        "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, " +
        "CAST(SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT)) AS BIGINT)" +
        " AS sum_price_c, COUNT(*) AS n_rows FROM lineitem GROUP BY 1) " +
        "SELECT l_returnflag, metric, value FROM (" +
        "SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w " +
        "UNION ALL SELECT l_returnflag, 'sum_price_c', sum_price_c FROM w " +
        "UNION ALL SELECT l_returnflag, 'n_rows', n_rows FROM w) " +
        "ORDER BY l_returnflag, metric")),

    "q_agg_histogram" -> Q(
      (spark, dir) =>
        // fixed-width numeric histogram (profiling staple): $1000-wide
        // price buckets via exact integer division on the cents lift —
        // one hash aggregation, output bounded by the value range, every
        // column an exact integer.
        Tables(spark, dir, "lineitem")
          .select(cents(col("l_extendedprice")).as("price_c"))
          .withColumn("bucket", expr("price_c div 100000"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"),
            min(col("price_c")).as("min_c"),
            max(col("price_c")).as("max_c"),
            sum(col("price_c")).as("sum_c"))
          .orderBy("bucket"),
      Some("SELECT CAST(ROUND(l_extendedprice*100,0) AS BIGINT)//100000 " +
        "AS bucket, COUNT(*) AS n, " +
        "MIN(CAST(ROUND(l_extendedprice*100,0) AS BIGINT)) AS min_c, " +
        "MAX(CAST(ROUND(l_extendedprice*100,0) AS BIGINT)) AS max_c, " +
        "CAST(SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT)) AS BIGINT)" +
        " AS sum_c FROM lineitem GROUP BY bucket ORDER BY bucket")),

    "q_agg_bool" -> Q(
      (spark, dir) =>
        // boolean/conditional aggregate family: count_if + bool_and/or.
        // Spark's count_if ≡ SQL-standard COUNT(*) FILTER (WHERE …) on
        // the DuckDB side; same partial+final hash agg shape as any sum.
        Tables(spark, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(expr("count_if(l_discount > 0.05)").as("n_discounted"),
            expr("bool_and(l_quantity > 0)").as("all_positive"),
            expr("bool_or(l_discount >= 0.09)").as("any_deep_discount"))
          .orderBy("l_returnflag"),
      Some("SELECT l_returnflag, " +
        "COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted, " +
        "BOOL_AND(l_quantity > 0) AS all_positive, " +
        "BOOL_OR(l_discount >= 0.09) AS any_deep_discount " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")),

    "q_agg_distinct" -> Q(
      (spark, dir) =>
        Tables(spark, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(countDistinct(col("l_partkey")).as("nd_part"),
            countDistinct(col("l_suppkey"), col("l_partkey")).as("nd_sp"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag"),
      Some("SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS nd_part, " +
        "COUNT(DISTINCT (l_suppkey, l_partkey)) AS nd_sp, COUNT(*) AS n " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")),

    "q_agg_approx_quantile" -> Q(
      (spark, dir) =>
        // mergeable quantile sketch (percentile_approx, Greenwald-Khanna
        // class) — the fourth sketch family beside bloom (membership),
        // HLL (cardinality) and CMS (frequency): each partition reduces
        // to a bounded summary, summaries merge, nothing re-sorts — the
        // 100 TB percentile path where q_agg_percentile's exact buffer
        // cannot hold a group. Sketch internals are engine-specific →
        // rows-only by contract; AggSpec pins the rank-error law
        // (|rank(est) − p·n| ≤ n/accuracy) against the exact order
        // statistics, and the exact twin q_agg_percentile is
        // oracle-green. Output is flattened to scalar columns (not an
        // array<bigint>) so the driver's pandas checker can sort/hash
        // the artifact — an array column crashes its factorize path.
        Tables(spark, dir, "orders")
          .withColumn("tp_c", Cols.cents(col("o_totalprice")))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            percentile_approx(col("tp_c"),
              array(lit(0.5), lit(0.9), lit(0.99)), lit(1000))
              .as("approx_cp"))
          .select(col("o_orderpriority"), col("n"),
            element_at(col("approx_cp"), 1).as("p50_c"),
            element_at(col("approx_cp"), 2).as("p90_c"),
            element_at(col("approx_cp"), 3).as("p99_c"))
          .orderBy("o_orderpriority"),
      None),

    "q_agg_approx_distinct" -> Q(
      (spark, dir) =>
        // HLL sketch ≠ DuckDB's approx sketch → no oracle (rows-only);
        // exactness property is covered in GraftSpec.
        Tables(spark, dir, "events")
          .groupBy("event_type")
          .agg(approx_count_distinct(col("user_id")).as("approx_users"),
            count(lit(1)).as("n"))
          .orderBy("event_type"),
      None),

    "q_agg_hll_sketch" -> Q(
      (spark, dir) => {
        // mergeable distinct-count sketches — the 100 TB shape for
        // distinct users: each shard/group reduces to a fixed-size Datasketches
        // HLL buffer (order-independent by construction), and group
        // sketches MERGE (hll_union_agg) into the corpus total without
        // ever revisiting rows — contrast with q_agg_distinct's exact
        // shuffle. Estimates ≠ DuckDB's sketch → rows-only; AggSpec pins
        // the estimates to the exact counts within HLL error.
        val sk = graft.ops.Caches.register(
          Tables(spark, dir, "events")
            .groupBy("event_type")
            .agg(hll_sketch_agg(col("user_id")).as("sketch"),
              count(lit(1)).as("n"))
            .persist())
        val per = sk.select(col("event_type"),
          hll_sketch_estimate(col("sketch")).as("approx_users"), col("n"))
        val all = sk.agg(
            hll_sketch_estimate(hll_union_agg(col("sketch")))
              .as("approx_users"),
            sum(col("n")).as("n"))
          .select(lit("__all").as("event_type"), col("approx_users"),
            col("n"))
        per.unionByName(all).orderBy("event_type")
      },
      None),

    "q_agg_pivot" -> Q(
      (spark, dir) =>
        Tables(spark, dir, "lineitem")
          .groupBy("l_returnflag")
          .pivot("l_linestatus", Seq("F", "O"))
          .agg(sum(col("l_quantity").cast("long")))
          .select(col("l_returnflag"), col("F").as("qty_F"),
            col("O").as("qty_O"))
          .orderBy("l_returnflag"),
      Some("SELECT l_returnflag, " +
        "CAST(SUM(CAST(l_quantity AS BIGINT)) FILTER " +
        "(WHERE l_linestatus = 'F') AS BIGINT) AS qty_F, " +
        "CAST(SUM(CAST(l_quantity AS BIGINT)) FILTER " +
        "(WHERE l_linestatus = 'O') AS BIGINT) AS qty_O " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")),

    "q_agg_rollup" -> Q(
      (spark, dir) =>
        Tables(spark, dir, "orders")
          .rollup("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum(cents(col("o_totalprice"))).as("__tp_c"))
          .select(col("o_orderstatus"), col("o_orderpriority"), col("n"),
            (col("__tp_c").cast("double") / 100.0).as("total"))
          .orderBy(asc_nulls_first("o_orderstatus"),
            asc_nulls_first("o_orderpriority")),
      Some("SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, " +
        "CAST(CAST(SUM(CAST(ROUND(o_totalprice*100,0) AS BIGINT)) AS BIGINT)" +
        " AS DOUBLE)/100.0 AS total " +
        "FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority) " +
        "ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST")),

    "q_agg_cube" -> Q(
      (spark, dir) =>
        Tables(spark, dir, "lineitem")
          .cube("l_returnflag", "l_linestatus")
          .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
            count(lit(1)).as("n"))
          .orderBy(asc_nulls_first("l_returnflag"),
            asc_nulls_first("l_linestatus")),
      Some("SELECT l_returnflag, l_linestatus, " +
        "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, " +
        "COUNT(*) AS n FROM lineitem " +
        "GROUP BY CUBE(l_returnflag, l_linestatus) " +
        "ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST")),

    "q_agg_grouping_sets" -> Q(
      (spark, dir) => {
        Tables(spark, dir, "lineitem").createOrReplaceTempView("lineitem")
        spark.sql("SELECT l_returnflag, l_linestatus, " +
          "CAST(GROUPING(l_returnflag) AS INT)*2 + " +
          "CAST(GROUPING(l_linestatus) AS INT) AS gid, " +
          "COUNT(*) AS n FROM lineitem " +
          "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ()) " +
          "ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST")
      },
      Some("SELECT l_returnflag, l_linestatus, " +
        "CAST(GROUPING(l_returnflag) AS INT)*2 + " +
        "CAST(GROUPING(l_linestatus) AS INT) AS gid, " +
        "COUNT(*) AS n FROM lineitem " +
        "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ()) " +
        "ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST")),

    "q_agg_stats" -> Q(
      (spark, dir) => {
        // Exact-moment strategy: accumulate Σx, Σx², Σy, Σy², Σxy as exact
        // DECIMAL sums of integer-lifted values (cents / unit counts), cast
        // to double once, then identical closed-form var/std/corr formulas
        // on both sides — order-independent, hash-stable. Spark's built-in
        // one-pass stddev/corr are exercised (equivalence-asserted) in
        // GraftSpec.
        val x = cents(col("l_extendedprice")).cast("decimal(18,0)")
        val y = col("l_quantity").cast("long").cast("decimal(18,0)")
        Tables(spark, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(x).as("sx"), sum(y).as("sy"),
            sum(x * x).as("sxx"), sum(y * y).as("syy"),
            sum(x * y).as("sxy"))
          .select(Seq(col("l_returnflag"), col("n")) ++ {
            val n = col("n").cast("double")
            val sx = col("sx").cast("double")
            val sy = col("sy").cast("double")
            val sxx = col("sxx").cast("double")
            val syy = col("syy").cast("double")
            val sxy = col("sxy").cast("double")
            val varx = (sxx - sx * sx / n) / (n - 1)
            val vary = (syy - sy * sy / n) / (n - 1)
            val cov = (sxy - sx * sy / n) / (n - 1)
            val corr = (sxy - sx * sy / n) /
              sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
            Seq(Cols.fround(varx, 4).as("var_price_c"),
              Cols.fround(sqrt(varx), 4).as("std_price_c"),
              Cols.fround(vary, 4).as("var_qty"),
              Cols.fround(cov, 4).as("cov_pq"),
              Cols.fround(corr, 6).as("corr_pq"))
          }: _*)
          .orderBy("l_returnflag")
      },
      Some {
        val n = "CAST(COUNT(*) AS DOUBLE)"
        val sx = "CAST(SUM(CAST(CAST(ROUND(l_extendedprice*100,0) AS BIGINT) AS DECIMAL(18,0))) AS DOUBLE)"
        val sy = "CAST(SUM(CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(18,0))) AS DOUBLE)"
        val sxx = "CAST(SUM(CAST(CAST(ROUND(l_extendedprice*100,0) AS BIGINT) AS DECIMAL(18,0)) * CAST(CAST(ROUND(l_extendedprice*100,0) AS BIGINT) AS DECIMAL(18,0))) AS DOUBLE)"
        val syy = "CAST(SUM(CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(18,0)) * CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(18,0))) AS DOUBLE)"
        val sxy = "CAST(SUM(CAST(CAST(ROUND(l_extendedprice*100,0) AS BIGINT) AS DECIMAL(18,0)) * CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(18,0))) AS DOUBLE)"
        val varx = s"(($sxx - $sx*$sx/$n)/($n - 1))"
        val vary = s"(($syy - $sy*$sy/$n)/($n - 1))"
        val cov = s"(($sxy - $sx*$sy/$n)/($n - 1))"
        val corr = s"(($sxy - $sx*$sy/$n)/SQRT(($sxx - $sx*$sx/$n)*($syy - $sy*$sy/$n)))"
        "SELECT l_returnflag, COUNT(*) AS n, " +
          Cols.froundSql(varx, 4) + " AS var_price_c, " +
          Cols.froundSql(s"SQRT($varx)", 4) + " AS std_price_c, " +
          Cols.froundSql(vary, 4) + " AS var_qty, " +
          Cols.froundSql(cov, 4) + " AS cov_pq, " +
          Cols.froundSql(corr, 6) + " AS corr_pq " +
          "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
      }))
}
