package graft.ops

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Join queries (SURVEY.md §2.B q_join_*). Small dimension sides are
  * explicitly `broadcast()`-hinted; large⋈large pairs are left to
  * sort-merge + AQE.
  */
object Joins {
  import org.apache.spark.sql.expressions.Window

  def queries: Map[String, Q] = Map(
    "q_join_shuffle" -> Q(
      (spark, dir) => {
        // both sides large → sort-merge shuffle join on the fact key
        val l = Tables(spark, dir, "lineitem")
        val o = Tables(spark, dir, "orders")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderkey", "o_orderstatus")
          .agg(count(lit(1)).as("n_lines"),
            sum(col("l_quantity").cast("long")).as("sum_qty"))
          .orderBy("o_orderkey")
      },
      Some("SELECT o_orderkey, o_orderstatus, COUNT(*) AS n_lines, " +
        "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY o_orderkey, o_orderstatus ORDER BY o_orderkey")),

    "q_join_bloom_runtime" -> Q(
      (spark, dir) => {
        // RUNTIME bloom-filter join (InjectRuntimeFilter): when the dim
        // side is too big to broadcast, Catalyst builds a bloom filter
        // from the dim's join keys at runtime and plants
        // `might_contain(...)` on the FACT SCAN — fact rows that cannot
        // match never enter the shuffle. At 100 TB this is the shuffle-
        // byte reducer for selective fact⋈dim joins that DPP can't serve
        // (non-partition join keys). Thresholds are lowered (and
        // broadcast disabled) only for THIS query's planning: the plan
        // is forced while the confs are set, then they're restored —
        // the frozen QueryExecution keeps the bloom rewrite for the
        // DataFrame's own actions (collect/toRdd; wrappers like count()
        // or a write re-plan under the restored confs — correct either
        // way, just without the bloom). Correctness
        // is unchanged by construction (bloom false-positives only admit
        // extra rows into the join, which drops them) — the oracle is
        // the plain join; the `might_contain` plant is gated in PlanSpec.
        val keys = Map(
          "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
          "spark.sql.optimizer.runtime.bloomFilter." +
            "applicationSideScanSizeThreshold" -> "0",
          "spark.sql.optimizer.runtime.bloomFilter." +
            "creationSideThreshold" -> "100MB",
          "spark.sql.autoBroadcastJoinThreshold" -> "-1")
        val prev = keys.keys.map(k => k -> spark.conf.getOption(k)).toMap
        keys.foreach { case (k, v) => spark.conf.set(k, v) }
        try {
          val l = Tables(spark, dir, "lineitem")
            .select("l_partkey", "l_quantity")
          val p = Tables(spark, dir, "part")
            .filter(col("p_brand") === "Brand#4")
            .select("p_partkey", "p_type")
          val df = l.join(p, col("l_partkey") === col("p_partkey"))
            .groupBy("p_type")
            .agg(count(lit(1)).as("n"),
              sum(col("l_quantity").cast("long")).as("sum_qty"))
            .orderBy("p_type")
          df.queryExecution.executedPlan // freeze the plan under the confs
          df
        } finally prev.foreach { case (k, v) =>
          v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
        }
      },
      Some("SELECT p_type, COUNT(*) AS n, " +
        "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "WHERE p_brand = 'Brand#4' GROUP BY p_type ORDER BY p_type")),

    "q_join_bucketed" -> Q(
      (spark, dir) => {
        // bucketed co-located fact-fact join: both sides written bucketed
        // (+ per-bucket sorted) on the join key, so the merge join AND the
        // bucket-key aggregation run with ZERO hash exchanges
        // (PlanSpec-gated) — bucketing is the technique that deletes the
        // dominant shuffle of a REPEATED 100 TB fact-fact join. Table
        // names are deterministic per sfDir and the write is skipped when
        // the table already exists in this session's catalog, so bench
        // repeats measure the join, not the one-time layout build
        // (mode=overwrite refreshes a stale on-disk path left by an
        // earlier JVM).
        // Scratch.stable: deterministic per (sfDir, JVM) so bench repeats
        // re-find the layout and skip the write; Scratch's per-JVM base
        // gives cross-process isolation and the single exit-time reaper
        val tag = java.lang.Integer.toHexString(dir.hashCode)
        val base = graft.io.Scratch.stable(s"bucketed_$tag")
        val l = Tables(spark, dir, "lineitem")
          .select("l_orderkey", "l_quantity")
        val o = Tables(spark, dir, "orders")
          .select("o_orderkey", "o_orderstatus")
        if (!spark.catalog.tableExists(s"li_bkt_$tag"))
          l.write.mode("overwrite").bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", s"$base/li").saveAsTable(s"li_bkt_$tag")
        if (!spark.catalog.tableExists(s"ord_bkt_$tag"))
          o.write.mode("overwrite").bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", s"$base/ord").saveAsTable(s"ord_bkt_$tag")
        spark.table(s"li_bkt_$tag")
          .join(spark.table(s"ord_bkt_$tag").hint("merge"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_orderkey", "o_orderstatus")
          .agg(count(lit(1)).as("n_lines"),
            sum(col("l_quantity").cast("long")).as("sum_qty"))
          .orderBy("l_orderkey", "o_orderstatus")
      },
      Some("SELECT l_orderkey, o_orderstatus, COUNT(*) AS n_lines, " +
        "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY l_orderkey, o_orderstatus " +
        "ORDER BY l_orderkey, o_orderstatus")),

    "q_join_outer" -> Q(
      (spark, dir) => {
        val c = Tables(spark, dir, "customer")
        val o = Tables(spark, dir, "orders")
        c.join(o, col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("n_orders"),
            sum(Cols.cents(col("o_totalprice"))).as("__tp_c"))
          .select(col("c_custkey"), col("n_orders"),
            (coalesce(col("__tp_c"), lit(0L)).cast("double") / 100.0)
              .as("total_spend"))
          .orderBy("c_custkey")
      },
      Some("SELECT c_custkey, COUNT(o_orderkey) AS n_orders, " +
        "CAST(COALESCE(CAST(SUM(CAST(ROUND(o_totalprice*100,0) AS BIGINT)) " +
        "AS BIGINT), 0) AS DOUBLE)/100.0 AS total_spend " +
        "FROM customer LEFT JOIN orders ON c_custkey = o_custkey " +
        "GROUP BY c_custkey ORDER BY c_custkey")),

    "q_join_semi" -> Q(
      (spark, dir) => {
        val o = Tables(spark, dir, "orders")
        val l = Tables(spark, dir, "lineitem")
        o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .select("o_orderkey", "o_totalprice")
          .orderBy("o_orderkey")
      },
      Some("SELECT o_orderkey, o_totalprice FROM orders WHERE EXISTS " +
        "(SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey) " +
        "ORDER BY o_orderkey")),

    "q_join_anti" -> Q(
      (spark, dir) => {
        val c = Tables(spark, dir, "customer")
        val o = Tables(spark, dir, "orders")
        c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name", "c_mktsegment")
          .orderBy("c_custkey")
      },
      Some("SELECT c_custkey, c_name, c_mktsegment FROM customer " +
        "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) " +
        "ORDER BY c_custkey")),

    "q_join_theta_band" -> Q(
      (spark, dir) => {
        // pure theta condition → broadcast nested-loop
        val s = Tables(spark, dir, "supplier")
        val n = Tables(spark, dir, "nation")
        s.join(broadcast(n),
            abs(col("s_nationkey") - col("n_nationkey")) <= 2)
          .select("s_suppkey", "s_nationkey", "n_nationkey", "n_name")
          .orderBy("s_suppkey", "n_nationkey")
      },
      Some("SELECT s_suppkey, s_nationkey, n_nationkey, n_name " +
        "FROM supplier JOIN nation ON ABS(s_nationkey - n_nationkey) <= 2 " +
        "ORDER BY s_suppkey, n_nationkey")),

    "q_join_range_interval" -> Q(
      (spark, dir) => {
        // equi key + range predicate: lineitems shipped within 30 days of
        // their order date
        val o = Tables(spark, dir, "orders")
        val l = Tables(spark, dir, "lineitem")
        o.join(l, col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") >= col("o_orderdate") &&
            col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 30 DAYS"))
          .groupBy("o_orderkey")
          .agg(count(lit(1)).as("n_fast"),
            sum(col("l_quantity").cast("long")).as("sum_qty"))
          .orderBy("o_orderkey")
      },
      Some("SELECT o_orderkey, COUNT(*) AS n_fast, " +
        "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty " +
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey " +
        "AND l_shipdate >= o_orderdate " +
        "AND l_shipdate < o_orderdate + INTERVAL 30 DAY " +
        "GROUP BY o_orderkey ORDER BY o_orderkey")),

    "q_join_range_auto" -> Q(
      (spark, dir) => {
        // PURE band join (no equi key): lineitem shipments falling inside
        // sampled 7-day promo windows. Spark's native plan for this shape
        // is BroadcastNestedLoopJoin — O(|L|·|W|) comparisons, lethal when
        // the window side outgrows a broadcast. The RangeBinMarker
        // conjunct opts the join into graft.plans.RangeJoinBinRule
        // (injected optimizer rule): floor(pt/2^40) keys the point side,
        // each window explodes to its ≤2 overlapping bins, and the join
        // planner sees a plain shuffled equi-join on the bin with the
        // band conjuncts as residual condition — identical rows
        // (oracle-checked), exchange-partitioned plan (PlanSpec-gated).
        graft.plans.RangeJoin.install(spark)
        val win = Tables(spark, dir, "orders")
          .filter(col("o_orderkey") % 1500 === 1)
          .select(col("o_orderkey").as("win_id"),
            Cols.epochUs(col("o_orderdate")).as("lo"))
          .withColumn("hi", col("lo") + lit(7L * 86400L * 1000000L))
        val l = Tables(spark, dir, "lineitem")
          .select(Cols.epochUs(col("l_shipdate")).as("pt"),
            col("l_quantity"))
        val w = 1L << 40 // ≈12.7 days in µs ≥ the 7-day span → ≤2 bins
        l.join(win, col("pt") >= col("lo") && col("pt") < col("hi") &&
            graft.plans.RangeJoin.marker(w, col("pt"), col("lo"),
              col("hi")))
          .groupBy("win_id")
          .agg(count(lit(1)).as("n_ship"),
            sum(col("l_quantity").cast("long")).as("sum_qty"))
          .orderBy("win_id")
      },
      Some("SELECT o_orderkey AS win_id, COUNT(*) AS n_ship, " +
        "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty " +
        "FROM lineitem JOIN orders ON o_orderkey % 1500 = 1 " +
        "AND l_shipdate >= o_orderdate " +
        "AND l_shipdate < o_orderdate + INTERVAL 7 DAY " +
        "GROUP BY 1 ORDER BY 1")),

    "q_join_asof" -> Q(
      (spark, dir) => {
        // as-of backward join: most recent signup at-or-before each event,
        // per user. Union-marker pattern: one sort, one keyed window — no
        // per-row subquery, scales as a single shuffle by user_id.
        val e = Tables(spark, dir, "events")
        val markers = e.filter(col("event_type") === "signup")
          .select(col("user_id"), col("ts"), lit(0).as("kind"),
            lit(null).cast("long").as("event_id"), col("ts").as("mts"))
        val probes = e.select(col("user_id"), col("ts"), lit(1).as("kind"),
          col("event_id"), lit(null).cast("timestamp_ntz").as("mts"))
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("kind"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        markers.unionByName(probes)
          .withColumn("last_signup", last(col("mts"), ignoreNulls = true)
            .over(w))
          .filter(col("kind") === 1)
          .select(col("event_id"), col("user_id"),
            Cols.epochUs(col("ts")).as("ts_us"),
            Cols.epochUs(col("last_signup")).as("last_signup_us"))
          .orderBy("event_id")
      },
      Some("SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us, " +
        "(SELECT epoch_us(MAX(s.ts)) FROM events s " +
        "WHERE s.user_id = e.user_id AND s.event_type = 'signup' " +
        "AND s.ts <= e.ts) AS last_signup_us " +
        "FROM events e ORDER BY event_id")),

    "q_join_asof_native" -> Q(
      (spark, dir) => {
        // the SAME as-of question answered by the custom whole-operator
        // plan (graft.plans.AsOfJoin: logical node → strategy → sorted-
        // merge exec): each side shuffles once on user_id, sorts
        // (key, time), and a streaming merge emits every event with its
        // most recent at-or-before signup — no union doubling, no window
        // state. Oracle identical to q_join_asof; plan gated in PlanSpec.
        val e = Tables(spark, dir, "events")
        val probes = e.select(col("event_id"), col("user_id"),
          Cols.epochUs(col("ts")).as("ts_us"))
        val markers = e.filter(col("event_type") === "signup")
          .select(col("user_id").as("s_user"),
            Cols.epochUs(col("ts")).as("s_ts_us"))
        graft.plans.AsOfJoin.join(probes, markers,
            "user_id", "s_user", "ts_us", "s_ts_us")
          .select(col("event_id"), col("user_id"), col("ts_us"),
            col("s_ts_us").as("last_signup_us"))
          .orderBy("event_id")
      },
      Some("SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us, " +
        "(SELECT epoch_us(MAX(s.ts)) FROM events s " +
        "WHERE s.user_id = e.user_id AND s.event_type = 'signup' " +
        "AND s.ts <= e.ts) AS last_signup_us " +
        "FROM events e ORDER BY event_id")),

    "q_join_selfpairs" -> Q(
      (spark, dir) => {
        // A12 analog: self-pair enumeration with a < predicate
        val a = Tables(spark, dir, "nation")
          .select(col("n_nationkey").as("k1"), col("n_regionkey").as("r1"))
        val b = Tables(spark, dir, "nation")
          .select(col("n_nationkey").as("k2"), col("n_regionkey").as("r2"))
        a.join(broadcast(b), col("k1") < col("k2"))
          .orderBy("k1", "k2")
      },
      Some("SELECT a.n_nationkey AS k1, a.n_regionkey AS r1, " +
        "b.n_nationkey AS k2, b.n_regionkey AS r2 " +
        "FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey " +
        "ORDER BY k1, k2")),

    "q_join_broadcast" -> Q(
      (spark, dir) => {
        val l = Tables(spark, dir, "lineitem")
        val p = Tables(spark, dir, "part")
        l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
          .groupBy("p_brand")
          .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
            count(lit(1)).as("n"))
          .orderBy("p_brand")
      },
      Some("SELECT p_brand, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)" +
        " AS sum_qty, COUNT(*) AS n FROM lineitem JOIN part " +
        "ON l_partkey = p_partkey GROUP BY p_brand ORDER BY p_brand")),

    "q_join_skew_salted" -> Q(
      (spark, dir) => {
        // salting demo: result must equal the plain equi-join (oracle is
        // the plain SQL join) while the fact side's shuffle is spread
        // across 8 salt buckets
        val l = Tables(spark, dir, "lineitem")
          .select(col("l_partkey").as("k"), col("l_orderkey"),
            col("l_linenumber"), col("l_quantity"))
        val p = Tables(spark, dir, "part")
          .select(col("p_partkey").as("k"), col("p_brand"))
        Skew.saltedJoin(l, p, "k", 8,
            Seq(col("l_orderkey"), col("l_linenumber")))
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("long")).as("sum_qty"))
          .orderBy("p_brand")
      },
      Some("SELECT p_brand, COUNT(*) AS n, " +
        "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "GROUP BY p_brand ORDER BY p_brand")),

    "q_join_chain" -> Q(
      (spark, dir) => {
        // TPC-H Q5 shape: revenue by nation for one region + order year.
        val region = Tables(spark, dir, "region")
          .filter(col("r_name") === "ASIA")
        val nation = Tables(spark, dir, "nation")
        val cust = Tables(spark, dir, "customer")
        val ord = Tables(spark, dir, "orders")
          .filter(col("o_orderdate") >= Cols.ts("1995-01-01") &&
            col("o_orderdate") < Cols.ts("1997-01-01"))
        val li = Tables(spark, dir, "lineitem")
        val sup = Tables(spark, dir, "supplier")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name")
          .agg(sum(Cols.cents(col("l_extendedprice") *
            (lit(1) - col("l_discount")))).as("__rev_c"),
            count(lit(1)).as("n"))
          .select(col("n_name"),
            (col("__rev_c").cast("double") / 100.0).as("revenue"), col("n"))
          .orderBy(desc("revenue"), col("n_name"))
      },
      Some("SELECT n_name, " +
        "CAST(CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100,0) AS BIGINT)) AS BIGINT) AS DOUBLE)/100.0 AS revenue, " +
        "COUNT(*) AS n " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1995-01-01' " +
        "AND o_orderdate < TIMESTAMP '1997-01-01' " +
        "GROUP BY n_name ORDER BY revenue DESC, n_name")),

    "q_join_lateral_topk" -> {
      // correlated LATERAL subquery with ORDER BY + LIMIT (top-2 suppliers
      // per nation by balance). Catalyst decorrelates this into
      // WindowGroupLimit (map-side per-group limit BEFORE the shuffle,
      // then the rank filter) + one hash join — i.e. the per-outer-row
      // subquery never executes per row, and the shuffle carries at most
      // k rows per group. Plan-gated in PlanSpec; unique tiebreak
      // (s_name) keeps the top-2 deterministic.
      val sql = "SELECT n_name, s.s_name, s.s_acctbal FROM nation, " +
        "LATERAL (SELECT s_name, s_acctbal FROM supplier " +
        "WHERE s_nationkey = n_nationkey " +
        "ORDER BY s_acctbal DESC, s_name LIMIT 2) s " +
        "ORDER BY n_name, s_acctbal DESC, s_name"
      Q((spark, dir) => {
        Tables.views(spark, dir, "nation", "supplier")
        spark.sql(sql)
      }, Some(sql))
    })
}
