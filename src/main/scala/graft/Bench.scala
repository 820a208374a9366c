package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // per-query repeats (median reported): machine-load spikes on a shared
    // box otherwise masquerade as regressions on unchanged code
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt.max(1)
    // BASELINE's calibration anchor, run in-process so the driver-facing
    // artifact self-adjudicates: the host window is whatever it is at the
    // driver's launch, and the pinned normalized gate
    // total × (0.825 / anchor_now) < 120 s needs anchor_now IN the JSON,
    // not in builder-side shell logs.
    val anchorStart = anchorSec()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val loadStart = sysLoad()
    // warm up JVM/codegen/parquet reader once so the first timed query
    // doesn't absorb session startup (best-effort: a bad sfDir must still
    // reach the fault-isolated loop below and emit the JSON line)
    try SparkEntry.queries.get("q_scan_project")
      .foreach(fn => fn(spark, sfDir).count())
    catch { case _: Throwable => () }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        finally graft.ops.Caches.drain()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      // true median (mean of middles for even run counts — picking the
      // upper-middle would let one load spike through at runs=2)
      val median =
        if (times.length % 2 == 1) times(times.length / 2)
        else (times(times.length / 2 - 1) + times(times.length / 2)) / 2
      name -> median
    }
    // The driver keeps only the LAST 2000 chars of stdout (measured:
    // BENCH_r05..r07 all have tail len 2000 and parsed:null — the full
    // per-query map NEVER fit once the surface passed ~70 queries, and
    // sbt's trailing "[success] Total time..." line consumes ~75 of the
    // window too). So the final line is a budget-capped map: slowest
    // queries first until ~1575 chars, remainder rolled into "_rest"
    // (so the map still sums to the total). The full map goes out on an
    // earlier line for local tooling; the driver's tail discards it.
    val fullMap = results.toSeq
      .sortBy { case (k, v) => (-v, k) }
      .map { case (k, v) => s"\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    println("BENCH_FULL " + fullMap)
    // sidecar: the driver keeps only the last 2000 chars of stdout, so
    // with 250+ queries the budget-capped final line rolls most of the
    // map into "_rest" and regression adjudication loses the tail.
    // Persist the complete per-query map per run — latest for tooling,
    // a timestamped history line for cross-round A/Bs.
    val anchorEnd = anchorSec()
    try {
      val full = "{\"ts\":\"" + java.time.Instant.now().toString +
        "\",\"sf\":\"" + sfDir + "\",\"runs\":" + runs +
        ",\"load\":[" + f3(loadStart) + "," + f3(sysLoad()) +
        "],\"anchor\":[" + f3(anchorStart) + "," + f3(anchorEnd) +
        "],\"queries\":" + fullMap + "}"
      java.nio.file.Files.write(
        java.nio.file.Paths.get("/tmp/graft_bench_full_latest.json"),
        full.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.write(
        java.nio.file.Paths.get("/tmp/graft_bench_full_history.jsonl"),
        (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    } catch { case _: Throwable => () } // never fail the bench line
    println(renderLine(results, runs, sfDir, loadStart, sysLoad(),
      anchorStart, anchorEnd))
    spark.stop()
  }

  /** 1-minute system load average (exec-host truth for the run window);
    * -1.0 where the platform can't report one.
    */
  def sysLoad(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .getSystemLoadAverage

  /** BASELINE's single-thread calibration anchor: 8M iterations of
    * `s+=i*i%7` in CPython, timed INSIDE the interpreter (startup
    * excluded). Measured identically to the pinned 0.825 s slow-window
    * constant — a JVM reimplementation would JIT to a different constant
    * and break the comparison. -1.0 when python3 is unavailable (the
    * raw total then stands on its own).
    */
  def anchorSec(): Double =
    try {
      val p = new ProcessBuilder("python3", "-c",
        "import time\nt=time.time()\ns=0\n" +
          "for i in range(8000000):\n s+=i*i%7\n" +
          "print('%.3f' % (time.time()-t))")
        .redirectErrorStream(true).start()
      // waitFor BEFORE reading: draining stdout to EOF first would make
      // the timeout dead code (a stdin-blocked python3 shim never
      // closes its pipe, hanging the bench at startup where the -1.0
      // fallback can't fire). The one-line output fits the pipe
      // buffer, so reading after exit loses nothing.
      if (!p.waitFor(120, java.util.concurrent.TimeUnit.SECONDS)) {
        p.destroyForcibly(); -1.0
      } else if (p.exitValue() != 0) -1.0
      else new String(p.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim.toDouble
    } catch { case _: Throwable => -1.0 }

  private def f3(v: Double): String =
    "%.3f".formatLocal(java.util.Locale.ROOT, v)

  /** The driver-facing final JSON line. Budget-capped (BenchSpec pins it
    * under 1 900 chars for the FULL current registry, so surface growth
    * can never silently push it past the driver's 2 000-char stdout tail
    * window again): slowest queries first until ~1575 chars of map body,
    * remainder rolled into `_rest` so the map still sums to the total.
    */
  def renderLine(results: Map[String, Double], runs: Int,
      sfDir: String, loadStart: Double = -1.0,
      loadEnd: Double = -1.0, anchorStart: Double = -1.0,
      anchorEnd: Double = -1.0): String = {
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // the pinned normalized budget gate (BASELINE v18): raw total scaled
    // by how much slower/faster the host is than the 0.825 s anchor
    // window the budget was adjudicated in; raw total when no anchor
    val norm =
      if (anchorStart > 0) total * (0.825 / anchorStart) else total
    val bySlowest = results.toSeq.sortBy { case (k, v) => (-v, k) }
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var used = 0
    var shownSum = 0.0
    var full = false // stop at the first overflow so the emitted map is a
                     // strict slowest-first prefix (shorter later entries
                     // must not sneak in past a skipped slower one)
    for ((k, v) <- bySlowest if !full) {
      val s = "\"" + k + "\":" + f3(v)
      if (used + s.length + 1 <= 1575) {
        parts += s; used += s.length + 1; shownSum += v
      } else full = true
    }
    if (parts.length < results.size) parts += "\"_rest\":" + f3(total - shownSum)
    val qs = parts.mkString("{", ",", "}")
    s"""{"metric":"total","value":${f3(total)},"unit":"sec","runs":$runs,"n":${results.size},"load":[${f3(loadStart)},${f3(loadEnd)}],"anchor":[${f3(anchorStart)},${f3(anchorEnd)}],"norm_value":${f3(norm)},"queries":$qs,"sf":"$sfDir"}"""
  }
}
