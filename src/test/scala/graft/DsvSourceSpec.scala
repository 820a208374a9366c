package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The hic-tsv DataSource V2 connector (graft.sources.HicTsv): row parity
  * with the csv()-based reader on every kind, null semantics for empty
  * fields, and — because the v2 contract REMOVES pushed filters from the
  * post-scan Filter — exact pushdown evaluation incl. nulls.
  */
class DsvSourceSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  private def fragments = Seq(
    ("chr1", Some(1L), 5000L, 10L, Some(1)),
    ("chr1", None: Option[Long], 15000L, 0L, Some(0)), // null extraField
    ("chr2", Some(3L), 25000L, 7L, None: Option[Int]), // null mappable
    ("chr10", Some(4L), 35000L, 2L, Some(1))
  ).toDF("chr", "extraField", "mid", "hitCount", "mappable")

  private lazy val dir: String = {
    val out = graft.io.Scratch.stable("dsv_spec_frags")
    graft.io.Tsv.write(fragments, out,
      graft.io.Tsv.fragmentSchema.fieldNames)
    out
  }

  private def viaDsv2 =
    spark.read.format("hic-tsv").option("kind", "fragments").load(dir)

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("DSv2 read ≡ csv() reader, including empty-field nulls") {
    rows(viaDsv2) shouldBe rows(graft.io.Tsv.readFragments(spark, dir))
    rows(viaDsv2) should have size 4
  }

  test("pushed filters evaluate exactly (v2 removes the post-scan Filter)") {
    def check(cond: org.apache.spark.sql.Column): Unit =
      rows(viaDsv2.filter(cond)) shouldBe
        rows(graft.io.Tsv.readFragments(spark, dir).filter(cond))
    check(col("chr") === "chr1")
    check(col("mid") > 5000L && col("mid") <= 25000L)
    check(col("extraField").isNull) // null row must survive IsNull
    check(col("extraField").isNotNull)
    check(col("mappable") === 1) // null mappable must NOT match
    check(col("chr").isin("chr1", "chr10"))
    check(col("hitCount") >= 2L && col("chr") =!= "chr2")
  }

  test("column pruning reaches the scan (ReadSchema shrinks)") {
    val p = viaDsv2.select("chr", "hitCount")
      .queryExecution.executedPlan.toString
    p should include("ReadSchema: chr,hitCount")
    p should not include "ReadSchema: chr,extraField"
  }

  test("connector write → csv() read parity, incl. nulls and overwrite") {
    val out = graft.io.Scratch.sub("dsv_write")
    fragments.write.format("hic-tsv").option("kind", "fragments")
      .mode("overwrite").save(out)
    rows(graft.io.Tsv.readFragments(spark, out)) shouldBe rows(fragments)
    // overwrite must TRUNCATE: a second write with fewer rows leaves
    // exactly those rows, no stale part files
    val half = fragments.filter(col("chr") === "chr1")
    half.write.format("hic-tsv").option("kind", "fragments")
      .mode("overwrite").save(out)
    rows(graft.io.Tsv.readFragments(spark, out)) shouldBe rows(half)
    // no staging residue
    new java.io.File(out).listFiles()
      .count(_.getName.startsWith("_staging")) shouldBe 0
  }

  test("connector write resolves columns BY NAME (Spark reorders)") {
    // DSv2 writes match the table schema by name before the writer sees
    // rows — a reordered select must land in canonical file order
    val out = graft.io.Scratch.sub("dsv_reorder")
    fragments.select("mid", "chr", "extraField", "hitCount", "mappable")
      .write.format("hic-tsv").option("kind", "fragments")
      .mode("overwrite").save(out)
    rows(graft.io.Tsv.readFragments(spark, out)) shouldBe rows(fragments)
    // wrong column NAMES are an analysis error
    intercept[Exception] {
      fragments.withColumnRenamed("mid", "midpoint")
        .write.format("hic-tsv").option("kind", "fragments")
        .mode("overwrite").save(graft.io.Scratch.sub("dsv_badname"))
    }
  }

  test("malformed lines: failfast names file+line; permissive skips") {
    val out = graft.io.Scratch.sub("dsv_malformed")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(out, "part-0.tsv"),
      ("chr1\t1\t5000\t10\t1\n" +
        "chr1\tnot_a_number\t6000\t2\t1\n" + // corrupt extraField
        "chr2\t3\t7000\t4\t0\n").getBytes("UTF-8"))
    // count() prunes every column, so the corrupt field is never even
    // parsed (pruning doing its job); failfast needs the column READ
    spark.read.format("hic-tsv").option("kind", "fragments")
      .load(out).count() shouldBe 3
    val ff = intercept[Exception] {
      spark.read.format("hic-tsv").option("kind", "fragments")
        .load(out).select("extraField").collect()
    }
    ff.getMessage + Option(ff.getCause).mkString should
      include("malformed")
    // permissive skipping is COLUMN-LOCAL (like pruning): the corrupt
    // line drops only when the corrupt field is among the read columns
    val kept = spark.read.format("hic-tsv").option("kind", "fragments")
      .option("mode", "permissive").load(out)
      .select("chr", "extraField").collect()
      .map(_.getString(0)).sorted
    kept shouldBe Array("chr1", "chr2") // the corrupt line is skipped
    spark.read.format("hic-tsv").option("kind", "fragments")
      .option("mode", "permissive").load(out)
      .select("chr").count() shouldBe 3 // untouched when not read
  }

  test("empty value in a non-nullable column: failfast errors, permissive skips") {
    val out = graft.io.Scratch.sub("dsv_nonnull")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(out, "part-0.tsv"),
      ("chrX\t1000\tchrX\t5000\t3\n" +
        "chrY\t\tchrY\t6000\t2\n").getBytes("UTF-8")) // empty mid1
    val ff = intercept[Exception] {
      spark.read.format("hic-tsv").option("kind", "contacts")
        .load(out).select("mid1").collect()
    }
    (ff.getMessage + Option(ff.getCause).mkString) should
      include("non-nullable")
    spark.read.format("hic-tsv").option("kind", "contacts")
      .option("mode", "permissive").load(out)
      .select("chr1", "mid1").collect()
      .map(_.getString(0)).toSeq shouldBe Seq("chrX")
  }

  test("append mode accumulates jobs (job-unique part names)") {
    val out = graft.io.Scratch.sub("dsv_append")
    val first = fragments.filter(col("chr") === "chr1")
    val second = fragments.filter(col("chr") =!= "chr1")
    first.write.format("hic-tsv").option("kind", "fragments")
      .mode("append").save(out)
    second.write.format("hic-tsv").option("kind", "fragments")
      .mode("append").save(out)
    rows(graft.io.Tsv.readFragments(spark, out)) shouldBe rows(fragments)
  }

  test("offset advance never drops seen files (no re-ingest)") {
    import graft.sources.HicTsvOffset
    val seen = HicTsvOffset(Seq("/d/a.tsv", "/d/b.tsv"))
    // b.tsv vanished from the listing, c/d arrived, throttle 1
    val next = HicTsvOffset.advance(seen,
      Seq("/d/a.tsv", "/d/c.tsv", "/d/dd.tsv"), Some(1))
    next.files shouldBe Seq("/d/a.tsv", "/d/b.tsv", "/d/c.tsv")
    // unthrottled: admits the rest, still keeps the missing file
    HicTsvOffset.advance(next, Seq("/d/a.tsv", "/d/c.tsv", "/d/dd.tsv"),
      None).files shouldBe
      Seq("/d/a.tsv", "/d/b.tsv", "/d/c.tsv", "/d/dd.tsv")
  }

  test("aborted connector write leaves the target untouched") {
    val out = graft.io.Scratch.sub("dsv_abort")
    fragments.write.format("hic-tsv").option("kind", "fragments")
      .mode("overwrite").save(out)
    val before = rows(graft.io.Tsv.readFragments(spark, out))
    // a write whose task fails mid-stream must abort the whole job:
    // prior data intact, no staging residue
    val failing = fragments.withColumn("mid",
      when(col("chr") === "chr2",
        expr("raise_error('planted task failure')").cast("long"))
        .otherwise(col("mid")))
    intercept[Exception] {
      failing.write.format("hic-tsv").option("kind", "fragments")
        .mode("overwrite").save(out)
    }
    rows(graft.io.Tsv.readFragments(spark, out)) shouldBe before
    new java.io.File(out).listFiles()
      .count(_.getName.startsWith("_staging")) shouldBe 0
  }

  test("streaming write: epoch-committed gz parts, idempotent on replay") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val out = graft.io.Scratch.sub("dsv_stream")
    val ckpt = graft.io.Scratch.sub("dsv_stream_ckpt")
    val mem = MemoryStream[(String, Long, Long)]
    val q = mem.toDF().toDF("chr", "mid", "bias_i")
      .select(col("chr"), col("mid"),
        (col("bias_i").cast("double") / 100.0).as("bias"))
      .writeStream.format("hic-tsv").option("kind", "biases")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      mem.addData(Seq(("chr1", 5000L, 110L), ("chr2", 9000L, 95L)))
      q.processAllAvailable()
      mem.addData(Seq(("chr1", 15000L, 101L)))
      q.processAllAvailable()
    } finally q.stop()
    val got = graft.io.Tsv.readBiases(spark, out).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    got shouldBe Set(("chr1", 5000L, 1.1), ("chr2", 9000L, 0.95),
      ("chr1", 15000L, 1.01))
    // per-epoch file names; no staging residue
    val files = new java.io.File(out).listFiles().map(_.getName)
    files.count(_.endsWith(".tsv.gz")) should be >= 2
    files.count(_.startsWith("_streaming")) shouldBe 0
  }

  test("streaming read: file arrivals become micro-batches; offsets resume") {
    val dir = graft.io.Scratch.sub("dsv_streamread")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    def writeFile(name: String, lines: String): Unit = {
      val tmp = java.nio.file.Paths.get(dir, s"_tmp_$name")
      java.nio.file.Files.write(tmp, lines.getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(dir, name))
    }
    writeFile("a.tsv", "chr1\t5000\t1.1\nchr2\t9000\t0.95\n")
    val name = s"dsvread_${System.nanoTime()}"
    val q = spark.readStream.format("hic-tsv").option("kind", "biases")
      .load(dir)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      spark.table(name).count() shouldBe 2
      writeFile("b.tsv", "chr1\t15000\t1.01\n")
      q.processAllAvailable()
      val got = spark.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      got shouldBe Set(("chr1", 5000L, 1.1), ("chr2", 9000L, 0.95),
        ("chr1", 15000L, 1.01)) // file b arrived as its own batch
    } finally q.stop()
    // offset round-trip: escaping-safe serialize/parse
    val off = graft.sources.HicTsvOffset(
      Seq(s"$dir/a.tsv", "/odd/pa\"th/b.tsv"))
    graft.sources.HicTsvOffset.fromJson(off.json()) shouldBe off
  }

  test("maxFilesPerTrigger throttles a backlog into per-file batches") {
    val dir = graft.io.Scratch.sub("dsv_throttle")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    def put(name: String, body: String): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, name), body.getBytes("UTF-8"))
    put("a.tsv", "chr1\t5000\t1.1\nchr2\t9000\t0.95\n")
    put("b.tsv", "chr1\t15000\t1.01\n")
    put("c.tsv", "chr3\t25000\t0.99\n")
    val name = s"dsvthrottle_${System.nanoTime()}"
    val q = spark.readStream.format("hic-tsv").option("kind", "biases")
      .option("maxFilesPerTrigger", "1").load(dir)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      spark.table(name).count() shouldBe 4
      // the 3-file backlog drained as one-file batches: 2, 1, 1 rows
      q.recentProgress.map(_.numInputRows).filter(_ > 0)
        .sorted.toSeq shouldBe Seq(1L, 1L, 2L)
    } finally q.stop()
  }

  test("Trigger.AvailableNow reads the WHOLE backlog despite " +
      "maxFilesPerTrigger (the passed ReadLimit wins, not the option)") {
    // AvailableNow probes latestOffset(initial, allAvailable()) ONCE
    // for its terminal offset: capping that at maxFilesPerTrigger made
    // the query read the first N files, report success, and silently
    // strand the rest — the worst kind of truncation.
    val dir = graft.io.Scratch.sub("dsv_availnow")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    (1 to 5).foreach(i => java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, s"f$i.tsv"),
      s"chr$i\t${i * 1000}\t1.0\n".getBytes("UTF-8")))
    val name = s"dsvavailnow_${System.nanoTime()}"
    val q = spark.readStream.format("hic-tsv").option("kind", "biases")
      .option("maxFilesPerTrigger", "2").load(dir)
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000) shouldBe true
      spark.table(name).count() shouldBe 5 // every file, not the first 2
    } finally q.stop()
  }

  test("failfast rejects wrong column COUNTS (truncated and " +
      "extra-column lines), not just malformed fields; permissive " +
      "keeps the lenient missing-trailing read") {
    val dir = graft.io.Scratch.sub("dsv_colcount")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    // biases schema is (chr string, mid long, bias double) = 3 cols
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "bad.tsv"),
      "chr1\t5000\t1.1\nchr2\t9000\n".getBytes("UTF-8")) // 2nd truncated
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("hic-tsv").option("kind", "biases").load(dir)
        .count()
    }
    e.getCause.getMessage should include("expected 3 columns, got 2")
    spark.read.format("hic-tsv").option("kind", "biases")
      .option("mode", "permissive").load(dir).count() shouldBe 2
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "bad.tsv"),
      "chr1\t5000\t1.1\textra\n".getBytes("UTF-8")) // 4 columns
    val e2 = intercept[org.apache.spark.SparkException] {
      spark.read.format("hic-tsv").option("kind", "biases").load(dir)
        .count()
    }
    e2.getCause.getMessage should include("expected 3 columns, got 4")
  }

  test("write refuses string values the unescaped TSV format cannot " +
      "represent, and type-mismatched frames at plan time") {
    import spark.implicits._
    val dir = graft.io.Scratch.sub("dsv_badwrite")
    val bad = Seq(("chr1\tX", 100L, 1.0)).toDF("chr", "mid", "bias")
    val e = intercept[Exception] {
      bad.write.format("hic-tsv").option("kind", "biases")
        .mode("overwrite").save(dir)
    }
    e.getMessage + Option(e.getCause).fold("")(_.getMessage) should
      include("cannot represent")
    // Spark's own DSv2 analyzer rejects the unsafe cast first
    // (CANNOT_SAFELY_CAST); the builder's type require is the
    // defense-in-depth behind it — either way the write fails at plan
    // time, before any file exists
    val wrongType = Seq(("chr1", "100", 1.0)).toDF("chr", "mid", "bias")
    val e2 = intercept[Exception] {
      wrongType.write.format("hic-tsv").option("kind", "biases")
        .mode("overwrite").save(dir)
    }
    (e2.getMessage.contains("column types must be") ||
      e2.getMessage.contains("CANNOT_SAFELY_CAST")) shouldBe true
  }

  test("string-range pushdown uses UTF-8 binary order on supplementary-plane chars") {
    // U+10348 (𐍈, 4-byte UTF-8, surrogate pair in UTF-16) vs U+FFFD:
    // UTF-16 code-unit order puts the surrogate pair (D800 DF48) BELOW
    // FFFD while UTF-8 binary order puts F0 90 8D 88 ABOVE EF BF BD —
    // the exact case where a java String.compareTo in the reader would
    // silently disagree with Spark's collation on a TRUSTED pushed
    // filter (no post-scan re-check exists to save it)
    val supp = "chr" + new String(Character.toChars(0x10348))
    val bmp = "chr�"
    val d = graft.io.Scratch.stable("dsv_spec_unicode")
    graft.io.Tsv.write(Seq(
        (supp, Some(1L), 5000L, 1L, Some(1)),
        (bmp, Some(2L), 15000L, 2L, Some(1)))
      .toDF("chr", "extraField", "mid", "hitCount", "mappable"),
      d, graft.io.Tsv.fragmentSchema.fieldNames)
    def via = spark.read.format("hic-tsv")
      .option("kind", "fragments").load(d)
    def ref = graft.io.Tsv.readFragments(spark, d)
    for (cond <- Seq(col("chr") > bmp, col("chr") < supp,
        col("chr") >= supp, col("chr") <= bmp)) {
      rows(via.filter(cond)) shouldBe rows(ref.filter(cond))
    }
    // the discriminating direction: chr > U+FFFD must return the
    // supplementary row (UTF-8 order), not drop it (UTF-16 order)
    via.filter(col("chr") > bmp).collect()
      .map(_.getString(0)).toSeq shouldBe Seq(supp)
  }

  test("string-inequality pushdown is ORDER-correct (chr10 < chr2)") {
    // lexicographic, not numeric: chr10 < chr2 — a naive numeric parse
    // in the reader would diverge from Spark's semantics
    val cond = col("chr") < "chr2"
    rows(viaDsv2.filter(cond)) shouldBe
      rows(graft.io.Tsv.readFragments(spark, dir).filter(cond))
    viaDsv2.filter(cond).count() shouldBe 3 // chr1, chr1, chr10
  }

  test("connector soak: read → transform → sink loop survives kill, resume, and a forced epoch replay with exact batch parity") {
    // the full CLI-shaped loop: contact TSV files arrive → hic-tsv
    // streaming READ (checkpointed file-list offsets, one file per
    // trigger) → stateless enrich → hic-tsv streaming WRITE. The query
    // is stopped mid-stream, its newest checkpoint COMMIT marker is
    // deleted (simulating a crash inside the at-least-once window
    // between sink commit and checkpoint commit), more files arrive,
    // and the query resumes from the SAME checkpoint: the replayed
    // epoch must be SKIPPED by the sink's per-epoch idempotence (the
    // run-tagged part names make "already committed" checkable), the
    // new files must each arrive as their own batch, and the final
    // read-back must equal the batch transform of ALL input files —
    // exactly once each, nothing lost, nothing doubled.
    val in = graft.io.Scratch.sub("soak_in")
    val out = graft.io.Scratch.sub("soak_out")
    val ckpt = graft.io.Scratch.sub("soak_ckpt")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def putContacts(name: String, rows: Seq[(String, Long, Long, Long)])
        : Unit = {
      val body = rows.map { case (c, m1, m2, n) =>
        s"$c\t$m1\t$c\t$m2\t$n" }.mkString("", "\n", "\n")
      val tmp = java.nio.file.Paths.get(in, s"_tmp_$name")
      java.nio.file.Files.write(tmp, body.getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(in, name))
    }
    val all = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, Long, Long)]
    def feed(name: String, rows: Seq[(String, Long, Long, Long)]): Unit = {
      putContacts(name, rows); all ++= rows
    }
    feed("c0.tsv", Seq(("chr1", 5000L, 15000L, 3L),
      ("chr2", 5000L, 25000L, 1L)))
    feed("c1.tsv", Seq(("chr1", 5000L, 25000L, 7L)))
    def start() = spark.readStream.format("hic-tsv")
      .option("kind", "contacts").option("maxFilesPerTrigger", "1")
      .load(in)
      .select(col("chr1"), col("mid1"), col("chr2"), col("mid2"),
        (col("contactCount") * 2L).as("contactCount"))
      .writeStream.format("hic-tsv").option("kind", "contacts")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // crash inside the at-least-once window: the newest epoch's commit
    // marker vanishes, so the restart will RE-RUN that epoch against
    // sink files that were already moved into place
    val commits = new java.io.File(ckpt, "commits").listFiles()
      .filter(_.getName.forall(_.isDigit))
    commits.sortBy(_.getName.toLong).lastOption.foreach { f =>
      assert(f.delete())
      // the local FS pairs each entry with a .crc twin — a stale one
      // makes ChecksumFileSystem treat the re-written entry as a
      // concurrent writer, which is a test-harness artifact, not part
      // of the simulated crash
      new java.io.File(f.getParentFile, "." + f.getName + ".crc").delete()
    }
    feed("c2.tsv", Seq(("chr1", 15000L, 25000L, 2L),
      ("chr3", 5000L, 15000L, 9L)))
    feed("c3.tsv", Seq(("chr2", 15000L, 25000L, 4L)))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = graft.io.Tsv.readContacts(spark, out).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3),
        r.getLong(4))).toSeq.sorted
    val expected = all.map { case (c, m1, m2, n) => (c, m1, m2, n * 2) }
      .toSeq.sorted
    got shouldBe expected
    // no staging residue after the replayed + resumed epochs
    new java.io.File(out).listFiles()
      .count(_.getName.startsWith("_streaming")) shouldBe 0
  }
}
