package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Runnable streaming entry point: drives the SAME [[Events]] logics the
  * batch-equivalent queries and StreamingSpec share, as a real
  * `readStream` → transform → `writeStream` pipeline a user can launch.
  *
  * Usage (all flags optional):
  *   runMain graft.stream.StreamMain
  *     [--logic tumbling|sliding|session|dedup|join|join_outer|
  *       join_full|join_right|marginals|ema|spline|cdc|scd2|
  *       scd2_compact|ivm_distinct]
  *     [--source rate|files] [--dir /root/testdata/sf0.001]
  *     [--sink console|parquet] [--out outDir]
  *     [--watermark "10 seconds"] [--timeout-sec 30]
  *     [--lineage-retain 256] [--lease-grace-ms 5000]
  *
  * A durable (`--sink parquet`) run holds a single-writer LEASE on
  * `--out` for its lifetime (heartbeat file; see [[graft.io.Lease]]):
  * a second CLI on the same root dies BEFORE touching the shared
  * checkpoint, and a resume after kill -9 must wait out
  * `--lease-grace-ms`.
  *
  * `--source files` streams the driver-generated events parquet through
  * the file source (one micro-batch per file); `rate` synthesizes events
  * locally so the pipeline runs with zero inputs. `--sink parquet`
  * (requires `--out`, a durable directory) materializes each
  * micro-batch via foreachBatch — the incremental-materialization shape
  * a production job would use. The run stops cleanly after
  * `--timeout-sec` (0 = run until killed).
  */
object StreamMain {
  // ts is parquet TIMESTAMP(NANOS): read as long (nanosAsLong) and floor
  // to micros — same discipline as graft.Tables, and timestamp_micros
  // yields the TIMESTAMP type event-time watermarks require
  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  // non-long footers: take ts's type straight from the batch sniff
  // (TIMESTAMP(MICROS) arrives as NTZ today, but a regeneration flipping
  // isAdjustedToUTC would otherwise silently diverge readStream from the
  // batch Tables path, which infers)
  private def eventsSchemaWith(ts: DataType) = StructType(eventsSchema.map(
    f => if (f.name == "ts") f.copy(dataType = ts) else f))

  /** CAS-commits state version `v` through the OCC log, failing FAST on
    * a contested commit: losing the CAS means another live run owns
    * this state directory (split-brain) — the batch that lost must not
    * keep folding on a lineage the winner has already advanced. The
    * orphaned data directory is reaped; the pointer log stays dense
    * under the winner. CommitLogSpec pins the guard.
    */
  private[graft] def commitStateVersion(logic: String, base: String,
      v: Int, path: String): Unit =
    if (!graft.io.CommitLog.tryCommit(base, v - 1, path)) {
      graft.io.Scratch.reap(path)
      throw new IllegalStateException(s"[$logic] split-brain: lost the " +
        s"version-$v CAS in $base — another writer is live; aborting")
    }

  /** Highest prior state version from the data-dir listing of a
    * durable state root — the legacy-resume path for roots that
    * predate (or lost) the commit log. Data dirs are named
    * `v$N-$runId`, so the parse takes the leading digits after the
    * `v` (a bare `.toIntOption` on the full suffix never matches and
    * silently disables this scan — found by review).
    */
  private def priorStateVersion(stateBase: String): Option[Int] = {
    val prior = Option(new java.io.File(stateBase).listFiles())
      .getOrElse(Array.empty)
      .flatMap { f =>
        val n = f.getName
        if (!n.startsWith("v")) None
        else Some(n.drop(1).takeWhile(_.isDigit)).filter(_.nonEmpty)
          .map(_.toInt)
      }
    if (prior.isEmpty) None else Some(prior.max)
  }

  def main(args: Array[String]): Unit = {
    // strict flag/value pairing: a forgotten value silently drops the
    // flag (an operator typing `--out` with no path would run on
    // scratch state the shutdown hook deletes) or re-pairs everything
    // after it
    require(args.length % 2 == 0,
      s"StreamMain: expected --flag value pairs, got ${args.length} " +
        s"args: ${args.mkString(" ")}")
    val opts = args.sliding(2, 2).map {
      case Array(k, v) =>
        require(k.startsWith("--") && !v.startsWith("--"),
          s"StreamMain: misaligned flag/value pair '$k $v'")
        k -> v
    }.toMap
    val logic = opts.getOrElse("--logic", "tumbling")
    val source = opts.getOrElse("--source", "rate")
    val dir = opts.getOrElse("--dir", "/root/testdata/sf0.001")
    val sink = opts.getOrElse("--sink", "console")
    // parquet output must be durable — Scratch subdirs are reaped by the
    // shutdown hook at JVM exit, so a defaulted path would vanish with
    // the process right after the run reports it
    val out = opts.get("--out").getOrElse {
      if (sink == "parquet")
        sys.error("--sink parquet requires --out <durable dir>")
      ""
    }
    val watermark = opts.getOrElse("--watermark", "10 seconds")
    val timeoutSec = opts.getOrElse("--timeout-sec", "30").toInt
    // SINGLE-WRITER LEASE on the durable root, BEFORE anything touches
    // the shared Spark checkpoint. The state-CAS split-brain guard
    // arbitrates too late to protect the offset WAL: a second CLI's
    // query can record an offset range nobody's surviving commits
    // folded (and Spark's first-writer-wins WAL detection can kill
    // BOTH queries), which a LATER resume trusts — the live race on
    // one root reproduced a silently shifted fold exactly this way
    // (caught by DevIvmAudit; see io.Lease). A second CLI now dies
    // HERE, with the checkpoint untouched; resume after kill -9 waits
    // out the grace.
    // keyed on --out, NOT --sink: the durable-STATE branches
    // (ivm_distinct/cdc/scd2) use $out for their checkpoint and
    // commit log whenever out is set, even with the default console
    // sink — a sink-gated lease left exactly those runs exposed to
    // the WAL race it exists to prevent
    val lease =
      if (out.nonEmpty)
        Some(graft.io.Lease.acquire(s"$out/LEASE",
          graceMs = opts.getOrElse("--lease-grace-ms", "5000").toLong))
      else None
    // checkpoint-marker lineage retention (io.CommitLog): how many
    // recent slots keep their ownership record in every marker. The
    // 256 default is the production setting; endurance legs shrink it
    // to engage the floor within a short run.
    val lineageRetain = opts.getOrElse("--lineage-retain", "256").toInt
    // fail fast instead of letting checkpoint() silently clamp to 1 —
    // an operator who typed 0 or a negative would otherwise run with a
    // one-version undecidable-verdict window they never configured
    require(lineageRetain > 0,
      s"--lineage-retain must be positive, got $lineageRetain")

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def events: DataFrame = source match {
      case "files" =>
        // the driver's parquet as a file-stream source (micro-batch per
        // file) — the real "new shard landed" production shape. (The file
        // source wants a DIRECTORY; the driver writes each table as a
        // single file, so glob-filter the events table out of the sf dir.)
        // match Tables: adapt to nanos-as-long vs native-micros footers
        // (readStream needs the schema up front, so sniff it via a batch
        // read of the same file — cheap, footer-only).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val sniffedTs = spark.read.parquet(s"$dir/events.parquet")
          .schema("ts").dataType
        val tsIsLong = sniffedTs == LongType
        val raw = spark.readStream
          .schema(if (tsIsLong) eventsSchema else eventsSchemaWith(sniffedTs))
          .option("pathGlobFilter", "events.parquet")
          .parquet(dir)
        if (tsIsLong)
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        else
          // driver MICROS footers read as TIMESTAMP_NTZ, which event-
          // time watermarks reject — cast to TIMESTAMP (wall clock
          // interpreted in the session's UTC, a no-op if already TZ)
          raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ =>
        spark.readStream.format("rate").option("rowsPerSecond", 500).load()
          .select(col("value").as("event_id"), col("timestamp").as("ts"),
            (col("value") % 97).as("user_id"),
            element_at(array(lit("click"), lit("view"), lit("purchase")),
              (col("value") % 3 + 1).cast("int")).as("event_type"),
            (col("value") % 1000 / 10.0).as("value"),
            lit("{}").as("props"))
    }

    // contact stream for the incremental-marginals state logic:
    // `--contacts-dir <dir>` streams REAL gz-TSV contact files through
    // the connector's micro-batch source (one batch per arriving file,
    // ingest-time stamped) — the production ingest shape; without it a
    // rate source synthesizes contacts
    def contacts = opts.get("--contacts-dir") match {
      case Some(d) =>
        spark.readStream.format("hic-tsv").option("kind", "contacts")
          .load(d)
          .select(current_timestamp().as("ts"), col("chr1"),
            col("mid1"), col("chr2"), col("mid2"), col("contactCount"))
          .as[HicStream.ContactEvent]
      case None =>
        spark.readStream.format("rate")
          .option("rowsPerSecond", 500).load()
          .select(col("timestamp").as("ts"),
            concat(lit("c"), col("value") % 4).as("chr1"),
            (col("value") % 100 * 5000 + 2500).as("mid1"),
            concat(lit("c"), col("value") % 4).as("chr2"),
            (col("value") * 7 % 100 * 5000 + 2500).as("mid2"),
            lit(1L).as("contactCount"))
          .as[HicStream.ContactEvent]
    }

    val (frame, mode) = logic match {
      case "tumbling" => (Events.tumbling(events, watermark), "update")
      case "sliding" => (Events.sliding(events, watermark), "update")
      // session_window streaming aggregation rejects update mode (Spark's
      // UnsupportedOperationChecker); complete matches StreamingSpec
      case "session" => (Events.sessions(events, watermark), "complete")
      case "dedup" => (Events.dedup(events, watermark), "append")
      case "join" | "join_outer" | "join_full" | "join_right" =>
        // stream-stream interval join (purchase ⋈ prior views): the two
        // sides are independent filters of the same source stream — the
        // production shape where both legs arrive on one bus. The
        // outer variants emit their null rows as watermarks pass.
        val ev = events
        val join = logic match {
          case "join_outer" => Events.intervalJoinOuter _
          case "join_full" => Events.intervalJoinFull _
          case "join_right" => Events.intervalJoinRight _
          case _ => Events.intervalJoin _
        }
        (join(
          ev.filter(col("event_type") === "purchase"),
          ev.filter(col("event_type") === "view"), watermark), "append")
      case "marginals" =>
        (HicStream.incrementalMarginals(contacts, watermark).toDF(),
          "update")
      case "ema" =>
        // transformWithState per-user EMA state (TwsEma) — needs the
        // RocksDB state store provider, set here so the CLI runs out of
        // the box
        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state" +
            ".RocksDBStateStoreProvider")
        (TwsEma.emaStream(events).toDF(), "update")
      case "cdc" | "scd2" | "scd2_compact" =>
        // incremental CDC apply: each micro-batch's keyed ops merge into
        // the running dimension state via ops.Warehouse.applyCdc — the
        // sequencing law (CdcLawSpec) makes this fold equal a one-shot
        // apply of the full feed. `scd2` applies applyCdcScd2 instead:
        // the state is the full type-2 HISTORY (close/open versions, the
        // monotone boundary guard making micro-batch replays no-ops) —
        // simple, but the per-batch state rewrite grows with history.
        // `scd2_compact` is the long-running production shape: state
        // carries only open versions + per-key tombstones (key-bounded),
        // each batch's newly-closed versions APPEND to
        // <state>/history/ (reconstruction law in CdcLawSpec).
        // State lives as a VERSIONED parquet table (write the next
        // version, then swap the pointer — a reader of version N is
        // never raced by the batch producing N+1), seeded from the
        // batch base table.
        val isScd2 = logic.startsWith("scd2")
        val isCompact = logic == "scd2_compact"
        val stateBase =
          if (out.nonEmpty) out else graft.io.Scratch.sub(s"${logic}_state")
        // a durable --out directory may hold a PRIOR run's state:
        // silently re-seeding v0 over it would orphan that history —
        // resume the version counter past it instead of overwriting.
        // Versions are arbitrated through the OCC commit log (pointer
        // CAS per version): a prior run that predates the log is
        // covered by the legacy v* listing, and TWO LIVE runs on one
        // state directory — the split-brain case — now fail fast at
        // the first contested CAS instead of silently interleaving
        // versions
        var stateV = math.max(
          priorStateVersion(stateBase).map(_ + 1).getOrElse(0),
          graft.io.CommitLog.currentVersion(stateBase) + 1)
        val seedV = stateV
        if (stateV > 0)
          println(s"[$logic] resuming past prior state " +
            s"v${stateV - 1} in $stateBase: seeding v$stateV")
        // the compact variant maintains a SIDE TABLE (history/) that is
        // append-only across the run: re-seeding a fresh base over a
        // root that already accumulated history would re-derive and
        // re-append every closed version (the checkpoint is per-run
        // scratch, so the feed replays from zero). The plain cdc/scd2
        // re-seed is harmless — the re-folded STATE converges — but
        // the compact history would double-count; refuse loudly until
        // a real state resume exists for this logic.
        if (isCompact && stateV > 0 && java.nio.file.Files.exists(
            java.nio.file.Paths.get(s"$stateBase/history")))
          sys.error(s"[$logic] $stateBase already holds a prior run's " +
            "closed-version history; re-seeding would replay the feed " +
            "and append duplicates to history/ — use a fresh --out " +
            "(scd2_compact durable roots are single-run)")
        // data directories carry a RUN-UNIQUE suffix: two racing runs
        // must never share a staging path, or the CAS loser's
        // overwrite+reap would destroy the very state the CAS winner
        // committed — the pointer, not the path convention, names the
        // live version
        val runId = java.util.UUID.randomUUID().toString.take(8)
        // this run's own committed (version → path), for the grace reap
        val ownPaths = scala.collection.mutable.Map[Int, String]()
        var statePath = s"$stateBase/v$stateV-$runId"
        val seed = graft.ops.Warehouse.cdcBase(spark, dir)
        (if (isScd2)
          seed.withColumn("vf_us", lit(0L))
            .withColumn("vt_us", lit(graft.ops.Warehouse.Scd2OpenUs))
        else seed)
          .withColumn("action", lit("kept"))
          .write.mode("overwrite").parquet(statePath)
        commitStateVersion(logic, stateBase, stateV, statePath)
        ownPaths(stateV) = statePath
        val q = events.writeStream.outputMode("append")
          .foreachBatch { (batch: DataFrame, id: Long) =>
            // the compact variant's history append happens AFTER the
            // version CAS below: a split-brain CAS loser previously
            // appended its closedNow rows to the shared history/ and
            // THEN died — the winner appended the same closures, a
            // silent duplicate. Deferring makes the loser abort with
            // zero history side effects; the narrowed residual is a
            // crash between CAS and append (one batch's closures
            // missing — loud in the reconstruction law, vs the
            // duplicate which was silent).
            var pendingHistory: Option[DataFrame] = None
            val next =
              if (isCompact) {
                val (nc, closedNow) = graft.ops.Warehouse
                  .applyCdcScd2Compact(
                    spark.read.parquet(statePath)
                      .select("key", "name", "bal_c", "vf_us", "vt_us"),
                    graft.ops.Warehouse.cdcChangesFullFrom(batch))
                pendingHistory = Some(closedNow)
                nc.withColumn("action",
                  when(col("vt_us") === graft.ops.Warehouse.Scd2OpenUs,
                    "open").otherwise("tombstone"))
              } else if (isScd2) graft.ops.Warehouse.applyCdcScd2(
                spark.read.parquet(statePath)
                  .select("key", "name", "bal_c", "vf_us", "vt_us"),
                graft.ops.Warehouse.cdcChangesFullFrom(batch))
              else graft.ops.Warehouse.applyCdc(
                spark.read.parquet(statePath)
                  .select("key", "name", "bal_c"),
                graft.ops.Warehouse.cdcChangesFrom(batch))
            stateV += 1
            val nextPath = s"$stateBase/v$stateV-$runId"
            next.write.mode("overwrite").parquet(nextPath)
            commitStateVersion(logic, stateBase, stateV, nextPath)
            // post-CAS: only the arbitration WINNER appends closures
            // (closedNow still lazily reads the OLD statePath, which
            // outlives this batch by the reap grace)
            pendingHistory.foreach(_.write.mode("append")
              .parquet(s"$stateBase/history"))
            statePath = nextPath
            ownPaths(stateV) = nextPath
            // reap superseded versions with the same ONE-version grace
            // as the layout rewrites (an in-flight reader of v(N-1) is
            // protected; older versions would otherwise accumulate
            // without bound on a durable --out). Only reaps paths THIS
            // run committed (ownPaths) — never another run's or a
            // prior history's, so a resumed-past lineage stays put
            // log compaction FIRST: each version is a FULL state, so
            // the checkpoint snapshot covering 0..N-1 is simply
            // v(N-1)'s own data — one marker supersedes every older
            // pointer (and older markers), keeping the commit log
            // batch-count-independent. Runs BEFORE the reap so the
            // marker always advances past a version before that
            // version's data can vanish. The layering guard never
            // fires here (upTo advances monotonically within a run);
            // a racing run dies at its version CAS first.
            if (stateV - 1 >= seedV)
              ownPaths.get(stateV - 1).foreach(prev =>
                graft.io.CommitLog.checkpoint(stateBase, stateV - 1,
                  prev, lineageRetain))
            // data-dir reap lags the checkpoint by ONE EXTRA batch:
            // checkpointing v(N-1) just pruned marker c(N-2), and an
            // external reader that resolved c(N-2) an instant earlier
            // still points at v(N-2)'s data — reaping v(N-2) here
            // would yank the snapshot out from under it. v(N-3)'s
            // marker was pruned a full batch ago, so its data dir has
            // had the same one-version grace the pointers get.
            if (stateV - 3 >= seedV)
              ownPaths.remove(stateV - 3).foreach(graft.io.Scratch.reap)
            val acts = spark.read.parquet(nextPath)
              .groupBy("action").count().collect()
              .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted
            println(s"[$logic] batch $id -> $nextPath: ${acts.mkString(" ")}")
            graft.ops.Caches.drain()
          }
          .option("checkpointLocation", graft.io.Scratch.sub("cdc_ckpt"))
          .start()
        if (timeoutSec > 0) {
          q.awaitTermination(timeoutSec * 1000L); q.stop()
        } else q.awaitTermination()
        spark.stop()
        return

      case "ivm_distinct" =>
        // streaming count-distinct IVM: per micro-batch the events
        // delta folds into the merge-on-read support state (sidecar
        // append — O(delta)) and the VIEW version publishes through
        // the same commit-log CAS/checkpoint discipline as cdc/scd2;
        // the support state compacts every few batches (touched
        // buckets only). StreamingSpec pins micro-batch ≡ batch
        // recompute; this branch adds the durability discipline.
        val stateBase =
          if (out.nonEmpty) out else graft.io.Scratch.sub("ivmdc_state")
        // resuming = a committed head exists; stateV tracks the LAST
        // committed version (fresh root: -1 → the seed publishes v0)
        var stateV = math.max(
          priorStateVersion(stateBase).getOrElse(-1),
          graft.io.CommitLog.currentVersion(stateBase))
        val resuming = stateV >= 0
        // first version THIS run publishes — the reap/checkpoint guards
        // below must never touch versions a previous run owns
        val seedV = stateV + 1
        if (resuming)
          println(s"[ivm_distinct] resuming past committed head " +
            s"v$stateV in $stateBase")
        val runId = java.util.UUID.randomUUID().toString.take(8)
        val ownPaths = scala.collection.mutable.Map[Int, String]()
        // support state under the same durable root: a resumed run
        // reattaches to the live base + surviving sidecars via the
        // manifest. Seed choice is SOURCE-dependent: the files source
        // replays the events table itself from offset zero, so seeding
        // from that same table would double-count every pair from the
        // very first run (cnt inflation the view hides only by
        // presence-idempotence) — files seeds EMPTY and batch 0 builds
        // the state; rate synthesizes events the table doesn't
        // contain, so there "yesterday's" batch corpus is a genuine
        // prior. Sidecars carry this run's tag and compaction is
        // driven POST-CAS below (compactEvery = 0): a split-brained
        // loser must never mutate a path or swap a manifest the
        // winner references
        val seedFrame = {
          val corpus = graft.ops.Warehouse.eventPairDelta(
            graft.Tables(spark, dir, "events"))
          if (source == "files") corpus.limit(0) else corpus
        }
        val stream = new graft.ops.Warehouse.IvmDistinctStream(
          spark, s"$stateBase/support", seedFrame,
          compactEvery = 0, runTag = runId)
        // publish a seed version only on a FRESH root. A resume must
        // NOT publish its constructor view: in the crash window between
        // a version CAS and markCommitted, the resumed state is one
        // batch BEHIND the committed head (the orphan sidecar was
        // reaped) — publishing it would hand readers a version that
        // RETRACTS committed rows until the replayed batch lands. The
        // head stays current; the first folded batch publishes past it
        // (and fail-fasts the split-brain case the seed CAS used to
        // catch).
        if (!resuming) {
          stateV = 0
          val seedPath = s"$stateBase/v0-$runId"
          stream.view.write.mode("overwrite").parquet(seedPath)
          commitStateVersion("ivm_distinct", stateBase, 0, seedPath)
          ownPaths(0) = seedPath
        }
        val q = events.writeStream.outputMode("append")
          .foreachBatch { (batch: DataFrame, id: Long) =>
            // replay guard: a crash AFTER markCommitted but before the
            // streaming checkpoint's offset commit re-delivers a batch
            // whose fold is already durably published (the floor
            // records its stream batch id) — folding it again would
            // double-count the support state. Skip; the committed
            // view version already carries this batch.
            if (stream.committedFloor.exists(_._2 >= id)) {
              println(s"[ivm_distinct] batch $id already published " +
                s"(floor ${stream.committedFloor.get._2}) — skipping " +
                "replay")
            } else {
            val mv = stream.processBatch(
              graft.ops.Warehouse.eventPairDelta(batch))
            stateV += 1
            val nextPath = s"$stateBase/v$stateV-$runId"
            mv.write.mode("overwrite").parquet(nextPath)
            try commitStateVersion("ivm_distinct", stateBase, stateV,
              nextPath)
            catch {
              case e: IllegalStateException =>
                // the CAS loser's just-written sidecar is an orphan a
                // later resume would double-count — reap before dying
                stream.lastSidecar.foreach(graft.io.Scratch.reap)
                throw e
            }
            // durable publication record: resume reaps any sidecar
            // above this floor (written, never committed) and skips
            // stream batch ids at or below it (committed, offset lost)
            stream.markCommitted(id)
            ownPaths(stateV) = nextPath
            // support compaction only AFTER this batch's version is
            // durably ours
            if (stream.compactDue(3)) stream.compact()
            if (stateV - 1 >= seedV)
              ownPaths.get(stateV - 1).foreach(prev =>
                graft.io.CommitLog.checkpoint(stateBase, stateV - 1,
                  prev, lineageRetain))
            if (stateV - 3 >= seedV)
              ownPaths.remove(stateV - 3).foreach(graft.io.Scratch.reap)
            val n = spark.read.parquet(nextPath).count()
            println(s"[ivm_distinct] batch $id -> $nextPath: " +
              s"$n suppliers")
            graft.ops.Caches.drain()
            }
          }
          // the streaming checkpoint must be as durable as the state it
          // feeds: a scratch checkpoint on a durable --out makes every
          // restart REPLAY the whole source into the already-seeded
          // support counts (cnt inflation; the view only stays right by
          // presence-idempotence)
          .option("checkpointLocation",
            if (out.nonEmpty) s"$stateBase/ckpt"
            else graft.io.Scratch.sub("ivmdc_ckpt"))
          .start()
        if (timeoutSec > 0) {
          q.awaitTermination(timeoutSec * 1000L); q.stop()
        } else q.awaitTermination()
        spark.stop()
        return

      case "spline" =>
        // §2.10 incremental null-model: foreachBatch spline refit over
        // the synthetic contact stream; prints the knot count + first/last
        // fitted probability after each refit
        val refitter = new HicStream.SplineRefitter(
          nBins = 20, distLo = 0L, distHi = Long.MaxValue)
        val q = contacts.writeStream
          .outputMode("append")
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[
              HicStream.ContactEvent], id: Long) =>
            refitter.processBatch(batch, id)
            refitter.latest.foreach { f =>
              println(s"[spline] batch $id: total=${f.total} " +
                s"knots=${f.avgDist.length} " +
                s"p=[${f.fittedProb.headOption.getOrElse(0.0)}.." +
                s"${f.fittedProb.lastOption.getOrElse(0.0)}]")
            }
          }
          .start()
        if (timeoutSec > 0) { q.awaitTermination(timeoutSec * 1000L); q.stop() }
        else q.awaitTermination()
        refitter.close()
        spark.stop()
        return
      case other => sys.error(s"unknown --logic $other")
    }

    val writer = sink match {
      case "parquet" =>
        frame.writeStream.outputMode(mode)
          .option("checkpointLocation", graft.io.Scratch.sub("stream_ckpt"))
          .foreachBatch { (batch: DataFrame, id: Long) =>
            // persist so count + write are ONE execution of the
            // incremental plan, not two end-to-end re-runs; complete
            // mode re-emits the full result set each batch — overwrite,
            // don't accumulate duplicates. UPDATE-mode logics
            // (tumbling/sliding/marginals/ema) re-emit a GROUP each
            // time it changes, so the appended table holds superseded
            // rows for the same key — the batch_id column makes
            // latest-wins reads possible (max batch_id per key);
            // without it the stale generations are indistinguishable.
            val n = batch.persist().count()
            (if (mode == "update") batch.withColumn("batch_id", lit(id))
             else batch).write
              .mode(if (mode == "complete") "overwrite" else "append")
              .parquet(out)
            batch.unpersist()
            println(s"[stream] batch $id: $n rows -> $out")
          }
      case _ =>
        frame.writeStream.outputMode(mode).format("console")
          .option("truncate", "false").option("numRows", "20")
    }

    val query = writer.start()
    if (timeoutSec > 0) {
      query.awaitTermination(timeoutSec * 1000L)
      query.stop()
    } else query.awaitTermination()
    spark.stop()
  }
}
