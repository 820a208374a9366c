package graft.ops

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Scan / projection / filter queries (SURVEY.md §2.B). The point of these
  * is the *plan*: parquet column pruning and pushed filters — verified in
  * GraftSpec by inspecting the formatted plan, not just the rows.
  */
object Relational {
  /** Writes (overwrite, idempotent) the Z-ordered lineitem layout for
    * `dir` to a per-(JVM, sfDir) stable scratch path and returns it —
    * shared by q_sink_zorder (the OPTIMIZE op) and q_scan_skipping (the
    * manifest-pruned consumer). Morton code over
    * (l_partkey, l_suppkey), each min/max-rescaled to 16 bits; 8 range
    * partitions sorted by the code.
    */
  private val zorderWritten =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val zorderEpoch =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Current physical path of the Z-ordered layout for `dir`, if one has
    * been written in this JVM (spec hook: PlanSpec inspects the files). */
  private[graft] def zorderPath(dir: String): Option[String] =
    Option(zorderWritten.get(
      "zorder_" + java.lang.Integer.toHexString(dir.hashCode)))

  private def zorderLayout(spark: org.apache.spark.sql.SparkSession,
      dir: String, force: Boolean = true): String = {
    val key = "zorder_" + java.lang.Integer.toHexString(dir.hashCode)
    def write(): String = {
      // fresh versioned directory per rewrite: a concurrent reader of
      // the PREVIOUS layout keeps reading intact files; the map entry
      // swaps to the new path only after the write completes
      val out = graft.io.Scratch.stable(
        key + "_v" + zorderEpoch.incrementAndGet())
      val li = Tables(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"), col("l_quantity"))
      val b = li.agg(
        min("l_partkey").as("mnp"), max("l_partkey").as("mxp"),
        min("l_suppkey").as("mns"), max("l_suppkey").as("mxs"))
      li.crossJoin(broadcast(b))
        .withColumn("z", Cols.morton2(
          Cols.norm16(col("l_partkey"), col("mnp"), col("mxp")),
          Cols.norm16(col("l_suppkey"), col("mns"), col("mxs"))))
        .drop("mnp", "mxp", "mns", "mxs")
        .repartitionByRange(8, col("z"), col("l_orderkey"),
          col("l_linenumber"))
        .sortWithinPartitions("z")
        .write.mode("overwrite").parquet(out)
      out
    }
    // the OPTIMIZE op (q_sink_zorder) re-writes by design; consumers
    // (q_scan_skipping) reuse this JVM's layout. computeIfAbsent runs
    // the first write INSIDE the mapping function, so a concurrent
    // consumer blocks until a layout exists; a forced rewrite builds a
    // fresh versioned directory and swaps the entry atomically, so it
    // never mutates a directory a concurrent consumer may be reading.
    // Superseded versions are reclaimed with a ONE-version grace (v(N-1)
    // survives for in-flight readers; older ones are deleted) so a
    // bench/test JVM forcing many rewrites cannot stack full layout
    // copies in tmpfs for its whole lifetime.
    if (force) {
      val out = write()
      zorderWritten.put(key, out)
      // grace = the two highest versions OF THIS KEY (the epoch counter
      // is global across sfDirs, so "current - 1" would be wrong when
      // two corpora interleave rewrites)
      val versions = Option(new java.io.File(out).getParentFile
          .listFiles()).toSeq.flatten
        .filter(_.getName.startsWith(key + "_v"))
        .flatMap(f =>
          f.getName.stripPrefix(key + "_v").toLongOption.map(_ -> f))
        .sortBy(-_._1)
      // age gate on top of the grace window: a version younger than
      // 60 s may still be under a long in-flight scan that started two
      // rewrites ago (deleteTree swallows errors, so a mid-read reap
      // would surface as an opaque scan failure, not here)
      val cutoff = System.currentTimeMillis() - 60000L
      versions.drop(2)
        .filter { case (_, f) => f.lastModified() < cutoff }
        .foreach { case (_, f) => graft.io.Scratch.reap(f.getPath) }
      out
    } else zorderWritten.computeIfAbsent(key, _ => write())
  }

  private val bloomIdxWritten =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Writes (once per JVM × corpus) the POINT-LOOKUP index layout:
    * lineitem hash-clustered by l_partkey into 32 files — placement
    * deliberately UNCORRELATED with the lookup key, the regime where
    * min/max zone maps (q_scan_skipping) prune nothing because every
    * file's key range spans the whole domain — plus a per-file Bloom
    * MANIFEST (one row per file, metadata-sized: thousands of rows
    * against petabytes at 100 TB) built with Spark's own
    * bloom_filter_agg. Per-file bits are fixed here (32 KB/file); a
    * production writer sizes them to per-file key cardinality —
    * an overloaded filter degrades to reading more files, never to a
    * wrong answer (the row predicate is re-applied after the read).
    */
  private[graft] def bloomIndexLayout(
      spark: org.apache.spark.sql.SparkSession, dir: String): String =
    bloomIdxWritten.computeIfAbsent(dir + "#bloomidx", { _ =>
      val out = graft.io.Scratch.stable("bloomidx_" +
        java.lang.Integer.toHexString(dir.hashCode))
      Tables(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_quantity"), col("l_extendedprice"))
        .withColumn("line_id",
          col("l_orderkey") * 10 + col("l_linenumber"))
        .repartition(32, col("l_partkey"))
        .write.mode("overwrite").parquet(s"$out/data")
      graft.llm.Selection.registerBloom(spark)
      spark.read.parquet(s"$out/data")
        .groupBy(input_file_name().as("file"))
        .agg(call_function("bloom_filter_agg", col("line_id"),
          lit(1L << 15), lit(1L << 18)).as("bf"))
        .write.mode("overwrite").parquet(s"$out/manifest")
      out
    })

  /** Prunes the layout's file list for a point-lookup key set via the
    * persisted Bloom manifest: (all files, surviving files). The probe
    * is driver-side over manifest rows — the file-count-sized metadata
    * operation every lakehouse planner runs, never a data scan.
    */
  private[graft] def bloomPrunedFiles(
      spark: org.apache.spark.sql.SparkSession, root: String,
      keys: Seq[Long]): (Seq[String], Seq[String]) = {
    import org.apache.spark.util.sketch.BloomFilter
    val man = spark.read.parquet(s"$root/manifest").collect()
      .map(r => (r.getAs[String]("file"), r.getAs[Array[Byte]]("bf")))
    val surviving = man.filter { case (_, bytes) =>
      val bf = BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bytes))
      keys.exists(bf.mightContainLong)
    }
    (man.map(_._1).toSeq, surviving.map(_._1).toSeq)
  }

  def queries: Map[String, Q] = Map(
    "q_scan_bloom_skipping" -> Q(
      (spark, dir) => {
        // BLOOM-MANIFEST FILE SKIPPING — the point-lookup complement to
        // q_scan_skipping's min/max zone maps: the layout is clustered
        // by a DIFFERENT column, so every file's line_id range spans
        // the domain and range stats prune nothing; the per-file Bloom
        // sidecars still prune to the handful of files that can
        // contain the probed keys (PlanSpec gates the skipping law).
        // The lookup keys here are a deterministic fixture stand-in
        // (the 4 smallest first-line ids) for the application-supplied
        // id list of a real point-lookup; the derivation scan is
        // fixture setup, not the lookup path. Pruning is
        // semantics-invisible: the predicate is re-applied after the
        // read and the oracle runs on the ORIGINAL table.
        val root = bloomIndexLayout(spark, dir)
        val keys = Tables(spark, dir, "lineitem")
          .filter(col("l_linenumber") === 1)
          .select((col("l_orderkey") * 10 + 1).as("line_id"))
          .distinct().orderBy("line_id").limit(4)
          .collect().map(_.getLong(0)).toSeq
        val (_, surviving) = bloomPrunedFiles(spark, root, keys)
        val src =
          if (surviving.isEmpty)
            spark.read.parquet(s"$root/data").limit(0)
          else spark.read.parquet(surviving: _*)
        src.filter(col("line_id").isin(keys: _*))
          .select("line_id", "l_quantity", "l_extendedprice")
          .orderBy("line_id", "l_quantity", "l_extendedprice")
      },
      Some("WITH k AS (SELECT DISTINCT l_orderkey*10+1 AS line_id " +
        "FROM lineitem WHERE l_linenumber = 1 ORDER BY line_id LIMIT 4) " +
        "SELECT l_orderkey*10+l_linenumber AS line_id, l_quantity, " +
        "l_extendedprice FROM lineitem " +
        "WHERE l_orderkey*10+l_linenumber IN (SELECT line_id FROM k) " +
        "ORDER BY line_id, l_quantity, l_extendedprice")),

    "q_warehouse_retention" -> Q(
      (spark, dir) => {
        // RETENTION by PARTITION DROP — the data-lifecycle op every
        // time-partitioned 100 TB table runs nightly: the table is
        // laid out by event day, and expiring data older than the
        // retention cut means REMOVING PARTITION DIRECTORIES — a
        // filesystem/metadata operation, O(#expired partitions), zero
        // data read or rewritten (ALTER TABLE DROP PARTITION; the
        // row-level alternative rewrites every old file). Surviving
        // partitions keep byte-identical files (PlanSpec gates the
        // metadata-only law); the read-back aggregate spans ALL
        // remaining partitions and the oracle replays the retention as
        // a timestamp predicate, so an over- or under-drop breaks the
        // hash.
        val out = graft.io.Scratch.sub("retention")
        Tables(spark, dir, "events")
          .withColumn("d", date_format(col("ts"), "yyyy-MM-dd"))
          .write.mode("overwrite").partitionBy("d").parquet(out)
        val cut = "2024-01-16"
        new java.io.File(out).listFiles().toSeq
          .filter(f => f.getName.startsWith("d=") &&
            f.getName.stripPrefix("d=") < cut)
          .foreach(f => graft.io.Scratch.reap(f.getPath))
        spark.read.parquet(out)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"),
            sum(Cols.cents(col("value"))).as("sum_value_c"))
          .orderBy("event_type")
      },
      Some("SELECT event_type, COUNT(*) AS n, " +
        "COUNT(DISTINCT user_id) AS n_users, " +
        "CAST(SUM(CAST(ROUND(value*100,0) AS BIGINT)) AS BIGINT) " +
        "AS sum_value_c " +
        "FROM events WHERE ts >= TIMESTAMP '2024-01-16' " +
        "GROUP BY event_type ORDER BY event_type")),

    "q_schema_evolution" -> Q(
      (spark, dir) => {
        // SCHEMA EVOLUTION — the widened-table read every long-lived
        // ingestion hits: day-1 files were written under schema v1,
        // day-2 files carry a NEW column (`channel`); mergeSchema
        // reconciles the footers so old files surface the column as
        // NULL, and the aggregate coalesces them into a legacy bucket.
        // At 100 TB the alternative is rewriting history for every
        // added column. The oracle replays the evolution as a CASE
        // over the ORIGINAL table, so a dropped or misaligned column
        // breaks the hash.
        val out = graft.io.Scratch.sub("schema_evo")
        val cut = Cols.ts("2024-01-16")
        val ev = Tables(spark, dir, "events")
        ev.filter(col("ts") < cut)
          .select("event_id", "user_id", "ts", "value")
          .write.mode("overwrite").parquet(s"$out/d1")
        ev.filter(col("ts") >= cut)
          .select(col("event_id"), col("user_id"), col("ts"),
            col("value"), col("event_type").as("channel"))
          .write.mode("overwrite").parquet(s"$out/d2")
        spark.read.option("mergeSchema", "true")
          .parquet(s"$out/d1", s"$out/d2")
          .groupBy(coalesce(col("channel"), lit("(legacy)"))
            .as("channel"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"),
            sum(Cols.cents(col("value"))).as("sum_value_c"))
          .orderBy("channel")
      },
      Some("SELECT CASE WHEN ts >= TIMESTAMP '2024-01-16' " +
        "THEN event_type ELSE '(legacy)' END AS channel, " +
        "COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users, " +
        "CAST(SUM(CAST(ROUND(value*100,0) AS BIGINT)) AS BIGINT) " +
        "AS sum_value_c " +
        "FROM events GROUP BY 1 ORDER BY 1")),

    "q_scan_project" -> Q(
      (spark, dir) =>
        Tables(spark, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
          // lineitem has no unique key (TESTDATA): order by ALL output
          // columns so tied rows are identical → hash-stable.
          .orderBy("l_orderkey", "l_linenumber", "l_quantity",
            "l_extendedprice"),
      Some("SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity, " +
        "l_extendedprice")),

    "q_scan_filter_pushdown" -> Q(
      (spark, dir) =>
        Tables(spark, dir, "lineitem")
          .filter(col("l_shipdate") < Cols.ts("1996-01-01") &&
            col("l_discount").between(0.05, 0.07))
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            col("l_discount"), Cols.epochUs(col("l_shipdate")).as("ship_us"))
          .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
            "ship_us"),
      Some("SELECT l_orderkey, l_linenumber, l_quantity, l_discount, " +
        "epoch_us(l_shipdate) AS ship_us FROM lineitem " +
        "WHERE l_shipdate < TIMESTAMP '1996-01-01' " +
        "AND l_discount BETWEEN 0.05 AND 0.07 " +
        "ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount, ship_us")),

    "q_project_expr" -> Q(
      (spark, dir) =>
        Tables(spark, dir, "lineitem")
          .select(
            (col("l_orderkey") * 10L + col("l_linenumber")).as("line_id"),
            abs(col("l_partkey") - col("l_suppkey")).as("key_gap"),
            Cols.fround(log(col("l_extendedprice")), 6).as("log_price"),
            Cols.fround(col("l_extendedprice") * (lit(1) - col("l_discount")),
              2).as("disc_price"))
          .orderBy("line_id", "key_gap", "log_price", "disc_price"),
      Some("SELECT l_orderkey*10+l_linenumber AS line_id, " +
        "ABS(l_partkey-l_suppkey) AS key_gap, " +
        Cols.froundSql("LN(l_extendedprice)", 6) + " AS log_price, " +
        Cols.froundSql("l_extendedprice*(1-l_discount)", 2) +
        " AS disc_price " +
        "FROM lineitem ORDER BY line_id, key_gap, log_price, disc_price")),

    "q_filter_null_in" -> Q(
      (spark, dir) =>
        Tables(spark, dir, "orders")
          .filter(col("o_orderstatus").isin("O", "F") &&
            col("o_totalprice") > 1000.0 && col("o_custkey").isNotNull)
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
          .orderBy("o_orderkey"),
      Some("SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders " +
        "WHERE o_orderstatus IN ('O','F') AND o_totalprice > 1000.0 " +
        "AND o_custkey IS NOT NULL ORDER BY o_orderkey")),

    "q_sink_partitioned" -> Q(
      (spark, dir) => {
        // Hive-style partitioned parquet sink + partition-PRUNED read-back:
        // directory pruning (PartitionFilters on the scan, gated in
        // PlanSpec) is a different mechanism from q_scan_filter_pushdown's
        // row-group predicate pushdown — at 100 TB it's the difference
        // between listing 2 directories and scanning every file's footer.
        // Per-run scratch subdir (unique per call, reaped at JVM exit —
        // graft.io.Scratch). The oracle runs the identical SQL on the
        // ORIGINAL events table: a correct round-trip is invisible to
        // the query.
        val out = graft.io.Scratch.sub("sink_part")
        Tables(spark, dir, "events")
          .write.mode("overwrite").partitionBy("event_type").parquet(out)
        spark.read.parquet(out)
          .filter(col("event_type").isin("click", "purchase"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"),
            min(Cols.epochUs(col("ts"))).as("min_ts_us"),
            max(Cols.epochUs(col("ts"))).as("max_ts_us"))
          .orderBy("event_type")
      },
      Some("SELECT event_type, COUNT(*) AS n, " +
        "COUNT(DISTINCT user_id) AS n_users, " +
        "MIN(epoch_us(ts)) AS min_ts_us, MAX(epoch_us(ts)) AS max_ts_us " +
        "FROM events WHERE event_type IN ('click','purchase') " +
        "GROUP BY event_type ORDER BY event_type")),

    "q_sink_partition_overwrite" -> Q(
      (spark, dir) => {
        // DYNAMIC partition overwrite — the nightly partition-correction
        // op: the base table is partitioned by event_type; a correction
        // batch carrying ONLY the 'click' partition (values doubled)
        // overwrites in dynamic mode, so every untouched partition
        // survives WITHOUT a rewrite (static mode would truncate the
        // whole table first). At 100 TB this is replace-one-partition,
        // never rewrite-the-table. The read-back aggregate covers ALL
        // partitions, so a clobbered one breaks the oracle (which
        // replays the correction as a CASE over the ORIGINAL events).
        val out = graft.io.Scratch.sub("sink_dynpart")
        val ev = Tables(spark, dir, "events")
        ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
        val key = "spark.sql.sources.partitionOverwriteMode"
        val prev = spark.conf.getOption(key)
        try {
          spark.conf.set(key, "dynamic")
          ev.filter(col("event_type") === "click")
            .withColumn("value", col("value") * 2)
            .write.mode("overwrite").partitionBy("event_type").parquet(out)
        } finally prev match {
          case Some(v) => spark.conf.set(key, v)
          case None => spark.conf.unset(key)
        }
        spark.read.parquet(out)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(Cols.cents(col("value"))).as("sum_value_c"))
          .select(col("event_type"), col("n"),
            (col("sum_value_c").cast("double") / 100.0).as("sum_value"))
          .orderBy("event_type")
      },
      Some("SELECT event_type, COUNT(*) AS n, " +
        "CAST(CAST(SUM(CAST(ROUND((CASE WHEN event_type = 'click' " +
        "THEN value * 2 ELSE value END)*100,0) AS BIGINT)) AS BIGINT) " +
        "AS DOUBLE)/100.0 AS sum_value " +
        "FROM events GROUP BY event_type ORDER BY event_type")),

    "q_sink_orc" -> Q(
      (spark, dir) => {
        // ORC round-trip (the other columnar interchange format): write,
        // read back with a predicate — ORC scans take pushed filters the
        // same way parquet does, so the round-trip must not lose the
        // pushdown. The oracle runs the identical SQL on the ORIGINAL
        // table: a correct round-trip is invisible to the query.
        val out = graft.io.Scratch.sub("sink_orc")
        Tables(spark, dir, "lineitem")
          .select("l_orderkey", "l_quantity", "l_shipdate",
            "l_returnflag")
          .write.mode("overwrite").orc(out)
        spark.read.orc(out)
          .filter(col("l_shipdate") >= Cols.ts("1998-01-01"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("long")).as("sum_qty"))
          .orderBy("l_returnflag")
      },
      Some("SELECT l_returnflag, COUNT(*) AS n, " +
        "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty " +
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01' " +
        "GROUP BY l_returnflag ORDER BY l_returnflag")),

    "q_sink_compaction" -> Q(
      (spark, dir) => {
        // small-file compaction — the lakehouse maintenance op: a
        // fragmented 64-way write rewritten to 4 right-sized files
        // (repartition, one shuffle), then consumed. At 100 TB this is
        // the nightly job that keeps scan task counts sane after
        // streaming/incremental ingests; correctness = the rewrite is
        // INVISIBLE, so the oracle runs the same aggregate on the
        // ORIGINAL table. File-count law (≥32 in, exactly 4 out) is
        // gated in PlanSpec.
        // per-call dirs, like every sibling sink query: a JVM-stable
        // shared path with mode overwrite lets a concurrent invocation
        // clobber a layout another query's returned (lazy) frame is
        // still reading — FileNotFound at best, another corpus's rows
        // at worst (ConcurrencySpec's serving contract)
        val frag = graft.io.Scratch.sub("compact_frag")
        val compact = graft.io.Scratch.sub("compact_out")
        Tables(spark, dir, "events")
          .repartition(64).write.mode("overwrite").parquet(frag)
        spark.read.parquet(frag).repartition(4)
          .write.mode("overwrite").parquet(compact)
        spark.read.parquet(compact)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"),
            min(col("event_id")).as("min_id"),
            max(col("event_id")).as("max_id"))
          .orderBy("event_type")
      },
      Some("SELECT event_type, COUNT(*) AS n, " +
        "COUNT(DISTINCT user_id) AS n_users, " +
        "MIN(event_id) AS min_id, MAX(event_id) AS max_id " +
        "FROM events GROUP BY event_type ORDER BY event_type")),

    "q_scan_skipping" -> Q(
      (spark, dir) => {
        // FILE SKIPPING from a min/max MANIFEST — the lakehouse metadata
        // mechanism (Iceberg manifests / Delta file stats) made
        // explicit over the z-ordered layout: ONE scan builds the
        // per-file stats table (input_file_name groupBy — the manifest
        // a writer would persist), the predicate prunes the FILE LIST
        // before any data scan (the collect is metadata-sized: one row
        // per file — thousands of rows against petabytes at 100 TB),
        // and only surviving files are opened. The row predicate is
        // re-applied after the read, so pruning is semantics-invisible
        // (the oracle recomputes from the ORIGINAL table) and
        // layout-independent; the skipping LAW (files read < files
        // present) is gated in PlanSpec.
        val out = zorderLayout(spark, dir, force = false)
        val bounds = Tables(spark, dir, "lineitem")
          .agg(min("l_partkey"), max("l_partkey")).head()
        val (mnp, mxp) = (bounds.getLong(0), bounds.getLong(1))
        val hi = mnp + (mxp - mnp) / 4 // first quarter of the range
        val files = spark.read.parquet(out)
          .groupBy(input_file_name().as("f"))
          .agg(min("l_partkey").as("mn"))
          .filter(col("mn") <= hi)
          .select("f").collect().map(_.getString(0))
        spark.read.parquet(files.toIndexedSeq: _*)
          .filter(col("l_partkey") <= hi)
          .groupBy((col("l_suppkey") % 8).as("sgrp"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("long")).as("sum_qty"),
            min(col("l_partkey")).as("min_pk"),
            max(col("l_partkey")).as("max_pk"))
          .orderBy("sgrp")
      },
      Some("WITH b AS (SELECT MIN(l_partkey) mnp, MAX(l_partkey) mxp " +
        "FROM lineitem) " +
        "SELECT l_suppkey % 8 AS sgrp, COUNT(*) AS n, " +
        "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, " +
        "MIN(l_partkey) AS min_pk, MAX(l_partkey) AS max_pk " +
        "FROM lineitem, b WHERE l_partkey <= mnp + (mxp - mnp) // 4 " +
        "GROUP BY 1 ORDER BY 1")),

    "q_sink_zorder" -> Q(
      (spark, dir) => {
        // Z-ORDER clustering sink — the multi-dimensional layout
        // maintenance op: interleave the bits of the two predicate
        // dimensions (l_partkey, l_suppkey; each rescaled to 16 bits off
        // its own min/max), range-partition + sort by the Morton code,
        // write. Each output file then covers a small HYPERCUBE of the
        // key space instead of a thin slab of one dimension, so min/max
        // row-group stats prune scans filtered on EITHER key — at 100 TB
        // this is the nightly OPTIMIZE that makes two unrelated predicate
        // columns both skippable from one layout. The z-code is exact
        // integer bit math, identical in DuckDB (oracle pins it via
        // sum_z); the clustering law (per-file ranges shrink on BOTH
        // dims) is gated in PlanSpec; the read-back aggregate makes the
        // roundtrip itself invisible.
        val out = zorderLayout(spark, dir)
        val b = Tables(spark, dir, "lineitem").agg(
          min("l_partkey").as("mnp"), max("l_partkey").as("mxp"),
          min("l_suppkey").as("mns"), max("l_suppkey").as("mxs"))
        // selective single-dimension read-back: first quarter of the
        // partkey range — the probe a z-ordered layout prunes to ~1/4 of
        // the files where a suppkey-sorted layout would read all of them
        spark.read.parquet(out).crossJoin(broadcast(b))
          .filter((col("l_partkey") - col("mnp")) * 4 <=
            col("mxp") - col("mnp"))
          .groupBy((col("l_suppkey") % 8).as("sgrp"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("long")).as("sum_qty"),
            sum(col("z")).as("sum_z"))
          .orderBy("sgrp")
      },
      Some("WITH b AS (SELECT MIN(l_partkey) mnp, MAX(l_partkey) mxp, " +
        "MIN(l_suppkey) mns, MAX(l_suppkey) mxs FROM lineitem), " +
        "n0 AS (SELECT l_suppkey, l_quantity, " +
        Cols.norm16Sql("l_partkey", "mnp", "mxp") + " AS za, " +
        Cols.norm16Sql("l_suppkey", "mns", "mxs") + " AS zb " +
        "FROM lineitem, b WHERE (l_partkey - mnp) * 4 <= mxp - mnp), " +
        Cols.mortonSpreadCtes("n0") + " " +
        "SELECT l_suppkey % 8 AS sgrp, COUNT(*) AS n, " +
        "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, " +
        "CAST(SUM(za | (zb << 1)) AS BIGINT) AS sum_z FROM s4 " +
        "GROUP BY 1 ORDER BY 1")),

    "q_join_dpp" -> Q(
      (spark, dir) => {
        // dynamic partition pruning: the fact is a Hive-partitioned sink
        // (by event_type), the dim arrives with a non-partition filter —
        // Catalyst plants a runtime subquery filter on the fact SCAN
        // (`dynamicpruning` in the plan, gated in PlanSpec), so only the
        // dim's surviving partitions are ever listed or read. At 100 TB
        // this is THE mechanism that turns a fact×dim join into a read
        // of 2 directories; static pushdown (q_sink_partitioned) can't
        // do it because the partition set is only known at runtime.
        import spark.implicits._
        val out = graft.io.Scratch.sub("dpp_fact")
        Tables(spark, dir, "events")
          .write.mode("overwrite").partitionBy("event_type").parquet(out)
        // the dim must be a SOURCE with a runtime Filter above it — a
        // local Seq would constant-fold the predicate away and DPP's
        // selective-predicate test never fires
        val dimOut = graft.io.Scratch.sub("dpp_dim")
        Seq(("click", 1L), ("purchase", 2L), ("view", 3L),
          ("signup", 4L), ("logout", 5L)).toDF("etype", "pri")
          .write.mode("overwrite").parquet(dimOut)
        spark.read.parquet(out)
          .join(broadcast(spark.read.parquet(dimOut)
            .filter(col("pri") <= 2)),
            col("event_type") === col("etype"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"))
          .orderBy("event_type")
      },
      Some("SELECT event_type, COUNT(*) AS n, " +
        "COUNT(DISTINCT user_id) AS n_users FROM events " +
        "JOIN (VALUES ('click', 1), ('purchase', 2)) AS d(etype, pri) " +
        "ON event_type = etype GROUP BY event_type ORDER BY event_type")),

    "q_sink_jsonl" -> Q(
      (spark, dir) => {
        // gzip JSON-lines round-trip — the interchange format every LLM
        // corpus actually ships as. Write documents as .jsonl.gz, read
        // back WITH an explicit schema (schema inference would re-scan
        // the corpus at 100 TB), aggregate. Oracle runs on the original
        // table: the round-trip must be lossless.
        val out = graft.io.Scratch.sub("sink_jsonl")
        val docs = Tables(spark, dir, "documents")
        docs.write.mode("overwrite").option("compression", "gzip")
          .json(out)
        // content integrity, not just counts: order-independent checksum
        // over (doc_id, text) that survives the round-trip. md5-ascii
        // arithmetic (not xxhash64) so DuckDB computes the identical
        // term — the oracle runs the same aggregate on the ORIGINAL
        // table, pinning losslessness hash-for-hash. Per-term modulo
        // keeps the ANSI BIGINT sum overflow-free at any corpus size.
        val term = (1 to 8).map(i =>
          "CAST(ascii(substring(md5(concat(cast(doc_id as string), " +
            s"'|', text)), $i, 1)) AS BIGINT) * " + (1L << ((8 - i) * 8)))
          .mkString("(", " + ", s") % 1000000007L")
        spark.read.schema(docs.schema).json(out)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"),
            sum(expr(term)).as("content_sum"))
          .orderBy("lang")
      },
      Some {
        val term = (1 to 8).map(i =>
          "CAST(ascii(substring(md5(CAST(doc_id AS VARCHAR) || '|' || " +
            s"text), $i, 1)) AS BIGINT) * " + (1L << ((8 - i) * 8)))
          .mkString("(", " + ", ") % 1000000007")
        "SELECT lang, COUNT(*) AS n_docs, " +
        "CAST(SUM(n_chars) AS BIGINT) AS chars, " +
        s"CAST(SUM($term) AS BIGINT) AS content_sum " +
        "FROM documents GROUP BY lang ORDER BY lang"
      }))
}
