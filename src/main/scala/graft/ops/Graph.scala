package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Graph analytics over the event stream: the per-user event-type
  * transition graph (a Markov chain over event types) and PageRank on it.
  *
  * Scale notes (100 TB bar): the heavy lift is EDGE EXTRACTION — a lag
  * window per user (no window spans two users) followed by one hash
  * aggregation whose output is bounded by |event types|², independent of
  * event count. The rank solve then runs over that bounded edge table:
  * a fixed number of join+aggregate rounds where every participant is
  * broadcast-sized by construction. Trillions of events never touch the
  * iteration.
  */
object Graph {
  /** PageRank damping factor and fixed iteration count. */
  val Damping = 0.85
  val Iters = 5

  /** Edge list (src, dst, w): consecutive-event transitions per user,
    * weighted by occurrence count. Ordering ties broken by event_id so
    * lag() is deterministic.
    */
  private def edges(spark: org.apache.spark.sql.SparkSession, dir: String) = {
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        Cols.epochUs(col("ts")).as("tus"))
      .withColumn("src", lag(col("event_type"), 1).over(w))
      .filter(col("src").isNotNull)
      .groupBy(col("src"), col("event_type").as("dst"))
      .agg(count(lit(1)).as("w"))
  }

  /** Weighted PageRank over an edge table (src, dst, w), `iters` fixed
    * rounds from a uniform start, damping 0.85, dangling mass dropped
    * (classic simplified form). Each round quantizes the rank to the 1e-9
    * grid so the ≤|nodes| per-node float-sum's partial order can never
    * drift the result — deterministic under any partitioning. All
    * per-round tables are |nodes|-bounded → broadcast joins; the node
    * count is the one driver-side scalar (same bounded-collect discipline
    * as Kr's chromosome routing). Returns (node, r).
    */
  def pagerank(edges: org.apache.spark.sql.DataFrame,
      iters: Int = Iters): org.apache.spark.sql.DataFrame = {
    val e = Caches.register(edges.persist())
    val out = e.groupBy("src").agg(sum(col("w")).as("out_w"))
    val nodes = Caches.register(
      e.select(col("src").as("node"))
        .unionByName(e.select(col("dst").as("node")))
        .distinct().persist())
    val n = nodes.count().toDouble
    // 0.15 written as a literal, NOT 1.0 − Damping: the subtraction
    // yields 0.15000000000000002 while the oracle parses "0.15"
    val base = lit(0.15) / lit(n)
    var r = nodes.select(col("node"), (lit(1.0) / lit(n)).as("r"))
    for (_ <- 1 to iters) {
      // Seq-keyed joins (not df("col") refs): r's lineage includes e
      // and nodes, so apply-column equality would be an ambiguous
      // self-join on later rounds
      val contrib = e.join(broadcast(out), "src")
        .join(broadcast(r.withColumnRenamed("node", "src")), Seq("src"))
        .groupBy("dst")
        .agg(sum(col("w").cast("double") / col("out_w").cast("double") *
          col("r")).as("s"))
      r = nodes.join(
          broadcast(contrib.withColumnRenamed("dst", "node")),
          Seq("node"), "left")
        .select(col("node"),
          Cols.fround(base + lit(Damping) * coalesce(col("s"),
            lit(0.0)), 9).as("r"))
    }
    r
  }

  private val edgesSql: String =
    "WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tus " +
      "FROM events), " +
      "lagged AS (SELECT event_type AS dst, LAG(event_type) OVER " +
      "(PARTITION BY user_id ORDER BY tus, event_id) AS src FROM ev), " +
      "edges AS (SELECT src, dst, COUNT(*) AS w FROM lagged " +
      "WHERE src IS NOT NULL GROUP BY src, dst)"

  /** Ordered triangle enumeration over a canonical undirected edge list
    * (src < dst, unique): rows (a, b, c) with a < b < c and all three
    * edges present. Two equi-joins — the wedge build on the shared
    * middle vertex, then the closing-edge check — so each triangle is
    * counted exactly once and nothing is a cross product. Wedge fan-out
    * is bounded by per-vertex degree; on dedup pair graphs degree is
    * cluster-size-bounded by construction. (Degree-ORDERED orientation
    * would tighten the wedge bound on power-law graphs — id-ordering is
    * kept here because it needs no degree pass and is deterministic.)
    */
  def triangles(edges: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val e = Caches.register(edges.select(col("src"), col("dst")).persist())
    // materialize the cache BEFORE the three self-references: the edge
    // derivation (e.g. the shingle pipeline feeding the near-dup graph)
    // must run once — otherwise the per-reference broadcast futures race
    // an unfilled cache and each recomputes the full lineage (measured
    // 3× the derivation cost at sf0.1)
    e.count()
    val wedges = e.select(col("src").as("a"), col("dst").as("b"))
      .join(e.select(col("src").as("b"), col("dst").as("c")), "b")
    wedges.join(e.select(col("src").as("a"), col("dst").as("c")),
        Seq("a", "c"))
      .select(col("a"), col("b"), col("c"))
  }

  def queries: Map[String, Q] = Map(
    "q_graph_transitions" -> Q(
      (spark, dir) => {
        // Markov transition matrix: P(dst | src) over consecutive events.
        // Integer edge weights are exact; the probability is one double
        // division with identical expression shape on both sides.
        val e = edges(spark, dir)
        val out = e.groupBy("src").agg(sum(col("w")).as("out_w"))
        e.join(broadcast(out), "src")
          .select(col("src"), col("dst"), col("w"),
            Cols.fround(col("w").cast("double") /
              col("out_w").cast("double"), 8).as("p"))
          .orderBy("src", "dst")
      },
      Some(edgesSql + ", out AS (SELECT src, CAST(SUM(w) AS BIGINT) " +
        "AS out_w FROM edges GROUP BY src) " +
        "SELECT e.src, e.dst, e.w, " +
        Cols.froundSql("CAST(e.w AS DOUBLE) / CAST(o.out_w AS DOUBLE)", 8) +
        " AS p FROM edges e JOIN out o ON e.src = o.src " +
        "ORDER BY e.src, e.dst")),

    "q_graph_pagerank" -> Q(
      (spark, dir) => {
        // weighted PageRank over the transition graph — see [[pagerank]]
        // (the fixture's graph has no dangling nodes, so the dropped-mass
        // simplification loses nothing here)
        pagerank(edges(spark, dir), Iters)
          .select(col("node"), Cols.fround(col("r"), 6).as("rank"))
          .orderBy("node")
      },
      Some {
        // unrolled Iters rounds, same per-round 1e-9 quantization
        val rounds = (1 to Iters).map { k =>
          s"r$k AS (SELECT nd.node, " +
            Cols.froundSql("(SELECT 0.15/CAST(n AS DOUBLE) FROM nn) + " +
              "0.85*COALESCE(c.s, 0)", 9) + " AS r " +
            "FROM nodes nd LEFT JOIN (SELECT e.dst, " +
            "SUM(CAST(e.w AS DOUBLE)/CAST(o.out_w AS DOUBLE) * " +
            s"p.r) AS s FROM edges e JOIN out o ON e.src = o.src " +
            s"JOIN r${k - 1} p ON p.node = e.src GROUP BY e.dst) c " +
            "ON c.dst = nd.node)"
        }.mkString(", ")
        edgesSql + ", out AS (SELECT src, CAST(SUM(w) AS BIGINT) " +
          "AS out_w FROM edges GROUP BY src), " +
          "nodes AS (SELECT src AS node FROM edges UNION " +
          "SELECT dst FROM edges), " +
          "nn AS (SELECT COUNT(*) AS n FROM nodes), " +
          "r0 AS (SELECT node, 1.0/CAST((SELECT n FROM nn) AS DOUBLE) " +
          "AS r FROM nodes), " + rounds +
          s" SELECT node, ${Cols.froundSql("r", 6)} AS rank FROM r$Iters " +
          "ORDER BY node"
      })
  )
}
