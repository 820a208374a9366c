package graft
import org.apache.spark.sql.SparkSession

/** Dev-only: one warm pass over every declared query, printing per-query
  * job count, summed job wall, and query wall — the census that tells the
  * optimization rounds where scheduling barriers (actions, broadcast
  * builds, probe jobs) concentrate. Sorted by job count descending.
  */
object DevJobCensus {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // core-count A/Bs (e.g. the local[8]-vs-local[32] scaling
    // adjudications): same env knob as Bench
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val jobNanos = new java.util.concurrent.atomic.AtomicLong()
    val t0s = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          t0s.put(j.jobId, System.nanoTime())
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          jobs.incrementAndGet()
          val t0 = Option(t0s.remove(j.jobId))
            .getOrElse(System.nanoTime())
          jobNanos.addAndGet(System.nanoTime() - t0)
        }
      })
    // warm: JIT + parquet reader + codegen
    try SparkEntry.queries("q_scan_project")(spark, dir).count()
    catch { case _: Throwable => () }
    def quiesce(): Unit = { Thread.sleep(300) }
    // run each query twice: the first pass pays memoized builds
    // (standing parquet, persisted indexes) exactly as the bench's first
    // run does; the SECOND pass is what the bench's 3-run median sees —
    // report that one.
    // optional query-name filter (args after the dir): a targeted census
    // doesn't pay the full 252-query pass
    val wanted = args.drop(1).toSet
    val selected =
      if (wanted.isEmpty) SparkEntry.queries.toSeq
      else SparkEntry.queries.filter(q => wanted(q._1)).toSeq
    val rows = selected.sortBy(_._1).map { case (name, fn) =>
      try fn(spark, dir).count() catch { case _: Throwable => () }
      graft.ops.Caches.drain()
      quiesce()
      val j0 = jobs.get(); val n0 = jobNanos.get()
      val t0 = System.nanoTime()
      try fn(spark, dir).count() catch { case _: Throwable => () }
      val wall = (System.nanoTime() - t0) / 1e9
      graft.ops.Caches.drain()
      quiesce()
      (name, jobs.get() - j0, (jobNanos.get() - n0) / 1e9, wall)
    }
    println(f"${"query"}%-45s jobs jobsum wall")
    rows.sortBy(-_._2).foreach { case (n, j, js, w) =>
      println(f"$n%-45s $j%4d $js%6.2f $w%6.2f")
    }
    println(f"TOTAL jobs=${rows.map(_._2).sum} " +
      f"wall=${rows.map(_._4).sum}%.1f")
    spark.stop()
  }
}
