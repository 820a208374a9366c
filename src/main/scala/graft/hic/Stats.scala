package graft.hic

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.ops.Caches

/** Statistical kernels of the significance pipeline (SURVEY.md A18–A19). */
object Stats {
  /** Benjamini–Hochberg q-values (SURVEY A19), scalable.
    *
    * q_i = min(1, min_{j ≥ i}(p_j · M / j)) with i the ascending p-rank and
    * M the number of tests (FitHiC uses *possible* pair count, not observed
    * rows — pass it via `mOpt`; defaults to the observed row count, which
    * the offset job already yields — no separate count() runs either way).
    *
    * Shape (SURVEY §7.3 #3): ONE range exchange on (p, tieCols) into a
    * sorted cache, then three narrow passes over it — per-partition row
    * counts (job), per-partition min of p·M/rank (job), and the final
    * backward suffix-min walk that runs inside the consumer's own job.
    * No single-partition window, and no `Window.partitionBy(pid)` either:
    * that would hash-exchange the full table a second time. Per-task
    * memory for the backward walk is one partition — bounded by the
    * shuffle partitioning, not the data size.
    */
  def bhQ(df: DataFrame, pCol: String, tieCols: Seq[String], qCol: String,
      mOpt: Option[Long] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val n = spark.sessionState.conf.numShufflePartitions
    val orderCols = col(pCol) +: tieCols.map(col)
    // the range exchange samples its child first — persist so the
    // upstream plan runs once; released once the ranged cache exists
    // (inputs the caller already cached are left untouched)
    val preCached = df.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val src = if (preCached) df else df.persist()
    val ranged = Caches.register(
      src.repartitionByRange(n, orderCols: _*)
        .sortWithinPartitions(orderCols: _*)
        .persist())
    val pIdx = ranged.schema.fieldIndex(pCol)
    // The per-partition passes key their offset maps by the RANGED
    // CACHE's partition index. That index must come from the RDD
    // partition object (mapPartitionsWithIndex), NEVER from
    // TaskContext.getPartitionId(): the final narrow pass executes fused
    // inside the CONSUMER's stage, and a consumer that renumbers
    // partitions — a union (child offsets), a coalesce — hands every task
    // a SHIFTED id, silently misranking everything. (Found live: pass-2
    // of the refinement union had its ranks restarted per partition.)
    val rangedRdd = ranged.rdd
    // job 1 (materializes the cache): per-partition row counts
    val counts = rangedRdd.mapPartitionsWithIndex { (pid, it) =>
      var c = 0L
      it.foreach(_ => c += 1)
      Iterator.single((pid, c))
    }.collect().sortBy(_._1)
    if (!preCached) src.unpersist()
    val m = mOpt.getOrElse(counts.map(_._2).sum)
    var acc = 0L
    val roffs: Map[Int, Long] = counts.map { case (pid, c) =>
      val row = pid -> acc; acc += c; row
    }.toMap
    // job 2: per-partition min of p·M/rank (global rank = local + offset)
    val mins = rangedRdd.mapPartitionsWithIndex { (pid, it) =>
      var i = roffs.getOrElse(pid, 0L)
      var mn = Double.MaxValue
      it.foreach { r =>
        i += 1
        // fail with intent, not an unboxing NPE deep in a task: a null p
        // would otherwise have silently sorted to rank 1 above
        require(!r.isNullAt(pIdx),
          s"bhQ: null $pCol at rank $i — p-values must be non-null")
        val v = r.getDouble(pIdx) * m / i
        if (v < mn) mn = v
      }
      Iterator.single((pid, mn))
    }.collect().sortBy(-_._1)
    // tail(pid) = min of p·M/rank over all strictly-later partitions
    var run = Double.MaxValue
    val tails: Map[Int, Double] = mins.map { case (pid, mn) =>
      val t = pid -> run; run = math.min(run, mn); t
    }.toMap
    // final narrow pass: backward suffix-min within the partition, seeded
    // with the later-partition tail
    val outSchema = ranged.schema.add(qCol, DoubleType, nullable = false)
    val outRdd = rangedRdd.mapPartitionsWithIndex { (pid, it) =>
      val off = roffs.getOrElse(pid, 0L)
      val rows = it.toArray
      val q = new Array[Double](rows.length)
      var sm = tails.getOrElse(pid, Double.MaxValue)
      var i = rows.length - 1
      while (i >= 0) {
        val v = rows(i).getDouble(pIdx) * m / (off + i + 1)
        sm = math.min(sm, v)
        q(i) = math.min(1.0, sm)
        i -= 1
      }
      rows.iterator.zipWithIndex.map { case (r, k) =>
        Row.fromSeq(r.toSeq :+ q(k))
      }
    }
    spark.createDataFrame(outRdd, outSchema)
  }
}
