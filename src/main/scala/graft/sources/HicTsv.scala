package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.compress.CompressionCodecFactory
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 implementation of the reference's gz-TSV file surface
  * (SURVEY §1.1 A1–A3) — the custom-SOURCE axis done as a first-class
  * connector instead of a csv() alias:
  *
  *   - `TableProvider` → `Table` → `ScanBuilder` → `Batch` →
  *     `PartitionReader`, selected with
  *     `spark.read.format("hic-tsv").option("kind", "contacts")`.
  *   - COLUMN PRUNING (`SupportsPushDownRequiredColumns`): only the
  *     requested fields are parsed/materialized per line — a projection
  *     of 2 of 5 columns never allocates the other 3.
  *   - FILTER PUSHDOWN (`SupportsPushDownFilters`): =, <, <=, >, >=, IN,
  *     IS [NOT] NULL on any column are evaluated inside the reader
  *     against the typed parse, BEFORE row materialization; they are
  *     removed from the post-scan Filter (v2 contract: pushed ⇒ exactly
  *     enforced) and reported in `.explain` via `Scan.description`.
  *   - One InputPartition per file: gzip streams are unsplittable, so
  *     the file is the parallelism grain — at 100 TB the layout answer
  *     is many files (exactly what the pass-numbered A4 sink produces),
  *     not splitting one stream.
  *
  * Kinds map to the fixed headerless schemas in [[graft.io.Tsv]]:
  * contacts (default), fragments, biases, significances. Empty fields
  * parse as null (nullable columns only — matching the csv() reader's
  * behavior).
  */
class HicTsv extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "hic-tsv"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HicTsv.schemaFor(options.getOrDefault("kind", "contacts"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new HicTsvTable(schema, properties.asScala.toMap)
}

object HicTsv {
  /** Sorted data files under `path` (or `path` itself when it's a
    * file): non-empty, not hidden/staging (`_`/`.` prefixes) — the ONE
    * definition of what batch and streaming reads of a directory see.
    */
  def listDataFiles(path: String,
      conf: org.apache.hadoop.conf.Configuration,
      allowMissing: Boolean = false): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (allowMissing && !fs.exists(p)) Nil
    else if (fs.getFileStatus(p).isDirectory)
      fs.listStatus(p).filter(s => s.isFile && s.getLen > 0 &&
        !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
        .map(_.getPath.toString).toSeq.sorted
    else Seq(path)
  }

  def schemaFor(kind: String): StructType = kind match {
    case "contacts" => graft.io.Tsv.contactSchema
    case "fragments" => graft.io.Tsv.fragmentSchema
    case "biases" => graft.io.Tsv.biasSchema
    case "significances" => graft.io.Tsv.significanceSchema
    case other => sys.error(s"hic-tsv: unknown kind '$other'")
  }
}

class HicTsvTable(tableSchema: StructType, props: Map[String, String])
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String =
    "hic-tsv:" + props.getOrElse("path", "<no path>")
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = {
    val mode = options.getOrDefault("mode",
      props.getOrElse("mode", "failfast"))
    require(mode == "failfast" || mode == "permissive",
      s"hic-tsv: mode must be failfast|permissive, got '$mode'")
    val maxFiles = Option(options.get("maxFilesPerTrigger"))
      .orElse(props.get("maxFilesPerTrigger")).map(_.toInt)
    require(maxFiles.forall(_ > 0),
      "hic-tsv: maxFilesPerTrigger must be positive")
    new HicTsvScanBuilder(tableSchema,
      Option(options.get("path")).getOrElse(
        props.getOrElse("path", sys.error("hic-tsv: path required"))),
      mode == "permissive", maxFiles)
  }
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    val path = Option(info.options.get("path")).getOrElse(
      props.getOrElse("path", sys.error("hic-tsv: path required")))
    require(info.schema().fieldNames.sameElements(tableSchema.fieldNames),
      s"hic-tsv write: columns must be exactly " +
        s"${tableSchema.fieldNames.mkString(",")} in order " +
        s"(got ${info.schema().fieldNames.mkString(",")})")
    // names alone let a type-mismatched frame write files the reader
    // then rejects line-by-line — fail at plan time instead
    require(info.schema().fields.map(_.dataType)
        .sameElements(tableSchema.fields.map(_.dataType)),
      s"hic-tsv write: column types must be " +
        s"${tableSchema.fields.map(_.dataType.simpleString).mkString(",")}" +
        s" (got ${info.schema().fields.map(_.dataType.simpleString).mkString(",")})")
    new HicTsvWriteBuilder(info.schema(), path, info.queryId())
  }
}

class HicTsvScanBuilder(fullSchema: StructType, path: String,
    permissive: Boolean, maxFilesPerTrigger: Option[Int] = None)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve file field order; Spark projects to its requested order
    required = StructType(
      fullSchema.filter(f => requiredSchema.fieldNames.contains(f.name)))

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, residual) =
      filters.partition(HicTsvFilters.supported(fullSchema, _))
    pushed = sup
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new HicTsvScan(fullSchema, required, pushed, path, permissive,
      maxFilesPerTrigger)
}

class HicTsvScan(fullSchema: StructType, required: StructType,
    pushed: Array[Filter], path: String, permissive: Boolean,
    maxFilesPerTrigger: Option[Int] = None)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"hic-tsv PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    HicTsv.listDataFiles(path, conf)
      .map(f => HicTsvPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableConfiguration(
      SparkSession.active.sparkContext.hadoopConfiguration)
    new HicTsvReaderFactory(fullSchema, required, pushed, conf,
      permissive)
  }

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new HicTsvMicroBatchStream(fullSchema, required, pushed, path,
      permissive, new SerializableConfiguration(
        SparkSession.active.sparkContext.hadoopConfiguration),
      maxFilesPerTrigger)
}

/** STREAMING read: the file-arrival micro-batch source. The OFFSET is
  * the sorted list of data files seen so far (serialized in the
  * checkpoint, so a restart resumes exactly); each micro-batch reads
  * the files in `end − start`, one partition per file, through the SAME
  * pruning/pushdown reader as the batch scan. Files must be complete
  * when they appear (write-then-move — exactly what the connector's own
  * sinks produce); at 100 TB the offset is file-count-sized, the
  * standard file-source trade.
  */
class HicTsvMicroBatchStream(fullSchema: StructType,
    required: StructType, pushed: Array[Filter], path: String,
    permissive: Boolean, conf: SerializableConfiguration,
    maxFilesPerTrigger: Option[Int] = None)
    extends org.apache.spark.sql.connector.read.streaming
      .MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming
      .SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private def listFiles(): Seq[String] =
    HicTsv.listDataFiles(path, conf.value, allowMissing = true)

  // admission control: cap each micro-batch at maxFilesPerTrigger new
  // files — the backlog drains across consecutive triggers instead of
  // one giant batch (the standard file-source throttle). The offset
  // stays a PREFIX of the sorted file list, so committed offsets from
  // throttled and unthrottled runs compose.
  override def latestOffset(): Offset = sys.error(
    "latestOffset(start, limit) is the entry point") // not reached:
  // Spark calls the SupportsAdmissionControl form below when implemented
  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit = {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    maxFilesPerTrigger.map(ReadLimit.maxFiles)
      .getOrElse(ReadLimit.allAvailable())
  }
  // honor the PASSED limit, not the option: Trigger.AvailableNow wraps
  // the source and probes latestOffset(initial, allAvailable()) ONCE
  // to fix its terminal offset — capping that at maxFilesPerTrigger
  // would make the query read the first N files, report success, and
  // silently strand the rest. The throttle is advertised through
  // getDefaultReadLimit and arrives here as ReadMaxFiles on normal
  // triggers.
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : Offset = {
    import org.apache.spark.sql.connector.read.streaming.{ReadAllAvailable, ReadMaxFiles}
    val cap = limit match {
      case _: ReadAllAvailable => None
      case m: ReadMaxFiles => Some(m.maxFiles())
      case _ => maxFilesPerTrigger
    }
    HicTsvOffset.advance(start.asInstanceOf[HicTsvOffset], listFiles(),
      cap)
  }
  override def initialOffset(): Offset = HicTsvOffset(Nil)
  override def deserializeOffset(json: String): Offset =
    HicTsvOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[HicTsvOffset].files.toSet
    end.asInstanceOf[HicTsvOffset].files.filterNot(seen)
      .map(f => HicTsvPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new HicTsvReaderFactory(fullSchema, required, pushed, conf,
      permissive)
}

case class HicTsvOffset(files: Seq[String])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = files.map(f =>
    "\"" + f.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
    .mkString("[", ",", "]")
}

object HicTsvOffset {
  /** Next offset from a directory listing: seen files are NEVER dropped
    * (a transient listing gap or a deleted-then-restored file must not
    * re-ingest committed rows), at most `max` fresh files admitted per
    * trigger, and the result stays sorted so offsets compose across
    * throttled and unthrottled runs. O(listing) via set membership.
    */
  def advance(start: HicTsvOffset, listed: Seq[String],
      max: Option[Int]): HicTsvOffset = {
    val seen = start.files.toSet
    val fresh = listed.filterNot(seen)
    val admit = max.fold(fresh)(fresh.take)
    HicTsvOffset((start.files ++ admit).sorted)
  }

  /** Minimal JSON string-array parse (the offsets this source writes). */
  def fromJson(json: String): HicTsvOffset = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inStr = false
    var esc = false
    json.foreach { c =>
      if (esc) { sb.append(c); esc = false }
      else if (inStr && c == '\\') esc = true
      else if (inStr && c == '"') {
        out += sb.toString; sb.clear(); inStr = false
      } else if (inStr) sb.append(c)
      else if (c == '"') inStr = true
    }
    HicTsvOffset(out.toSeq)
  }
}

case class HicTsvPartition(file: String) extends InputPartition

class HicTsvReaderFactory(fullSchema: StructType, required: StructType,
    pushed: Array[Filter], conf: SerializableConfiguration,
    permissive: Boolean)
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] =
    new HicTsvReader(fullSchema, required, pushed, conf,
      partition.asInstanceOf[HicTsvPartition].file, permissive)
}

/** Streams one (possibly gzipped) file: per line, parse ONLY the fields
  * the filters and projection need, evaluate pushed filters on the typed
  * values, then materialize the pruned row.
  */
class HicTsvReader(fullSchema: StructType, required: StructType,
    pushed: Array[Filter], conf: SerializableConfiguration, file: String,
    permissive: Boolean = false)
    extends PartitionReader[InternalRow] {

  private val fieldIdx = fullSchema.fieldNames.zipWithIndex.toMap
  private val predicates = pushed.map(HicTsvFilters.compile(fullSchema, _))
  // fields to parse = projected ∪ filter-referenced
  private val neededIdx: Array[Int] =
    (required.fieldNames.map(fieldIdx) ++
      pushed.flatMap(_.references).map(fieldIdx)).distinct.sorted
  private val outIdx: Array[Int] = required.fieldNames.map(fieldIdx)

  private val in = {
    val p = new Path(file)
    val fs = p.getFileSystem(conf.value)
    val codec = new CompressionCodecFactory(conf.value).getCodec(p)
    val raw = fs.open(p)
    new BufferedReader(new InputStreamReader(
      if (codec != null) codec.createInputStream(raw) else raw,
      StandardCharsets.UTF_8))
  }

  private val parsed = new Array[Any](fullSchema.length)
  private var row: InternalRow = _

  /** Typed parse of one line into `parsed`; false on a malformed
    * numeric field under permissive mode (the line is skipped),
    * descriptive failure under failfast.
    */
  private def parseLine(line: String): Boolean = {
    // limit -1: keep TRAILING empty fields (an empty nullable last
    // column is a valid line; the default split would drop it and
    // false-positive the count check below)
    val cols = line.split("\t", -1)
    // failfast's contract is to SURFACE malformed input: a truncated
    // line (missing trailing columns would otherwise read as empty →
    // null) or an extra-column line (fields silently dropped) is
    // structurally wrong even when every parsed field happens to be
    // valid. permissive keeps the lenient missing-trailing behavior.
    if (!permissive && cols.length != fullSchema.length)
      throw new RuntimeException(
        s"hic-tsv: expected ${fullSchema.length} columns, got " +
          s"${cols.length} in $file: '$line'")
    var i = 0
    while (i < neededIdx.length) {
      val f = neededIdx(i)
      val s = if (f < cols.length) cols(f) else ""
      parsed(f) =
        if (s.isEmpty) {
          // a null in a non-nullable column would silently unbox to 0
          // downstream (codegen trusts the schema) — enforce the
          // contract here, with the same failfast/permissive split as
          // malformed numerics
          if (!fullSchema(f).nullable) {
            if (permissive) return false
            throw new RuntimeException(
              s"hic-tsv: empty value for non-nullable " +
                s"${fullSchema(f).name} in $file: '$line'")
          }
          null
        } else
          try fullSchema(f).dataType match {
            case LongType => java.lang.Long.valueOf(s)
            case IntegerType => java.lang.Integer.valueOf(s)
            case DoubleType => java.lang.Double.valueOf(s)
            // convert ONCE at parse: both the pushed string predicates
            // and the materialized row want UTF8String, so converting
            // here makes the per-row filter loop allocation-free and
            // the materialize a plain copy
            case _ => UTF8String.fromString(s)
          } catch {
            case e: NumberFormatException =>
              if (permissive) return false
              throw new RuntimeException(
                s"hic-tsv: malformed ${fullSchema(f).name} in $file: " +
                  s"'$line'", e)
          }
      i += 1
    }
    true
  }

  override def next(): Boolean = {
    var line = in.readLine()
    while (line != null) {
      if (line.nonEmpty && parseLine(line)) {
        if (predicates.forall(_(parsed))) {
          val out = new GenericInternalRow(outIdx.length)
          var j = 0
          while (j < outIdx.length) {
            out(j) = parsed(outIdx(j)) // strings already UTF8String
            j += 1
          }
          row = out
          return true
        }
      }
      line = in.readLine()
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}

/** Pushed-filter support + compilation to closures over the typed parse
  * array. The v2 contract makes pushed filters load-bearing (Spark drops
  * them from the post-scan Filter), so only exactly-evaluable shapes are
  * accepted; everything else stays residual.
  */
object HicTsvFilters {
  def supported(schema: StructType, f: Filter): Boolean = f match {
    case EqualTo(a, v) => comparable(schema, a, v)
    case GreaterThan(a, v) => comparable(schema, a, v)
    case GreaterThanOrEqual(a, v) => comparable(schema, a, v)
    case LessThan(a, v) => comparable(schema, a, v)
    case LessThanOrEqual(a, v) => comparable(schema, a, v)
    case In(a, vs) => vs.forall(comparable(schema, a, _))
    case IsNotNull(a) => schema.fieldNames.contains(a)
    case IsNull(a) => schema.fieldNames.contains(a)
    case _ => false
  }

  private def comparable(schema: StructType, attr: String,
      value: Any): Boolean =
    schema.fieldNames.contains(attr) && (value match {
      case null => false
      case _: java.lang.Long | _: java.lang.Integer |
          _: java.lang.Double | _: String => true
      case _ => false
    })

  def compile(schema: StructType, f: Filter): Array[Any] => Boolean = {
    val idx = schema.fieldNames.zipWithIndex.toMap
    // allocation-free per-row path: this closure runs once per LINE per
    // predicate of a scan built for 100 TB inputs, so no Option
    // wrapping and no per-row string re-wraps — null handling is an
    // inline check (SQL semantics: comparisons against null are not
    // satisfied), and the comparison test is taken as a function of
    // the primitive compare result.
    def cmp(attr: String, value: Any,
        test: Int => Boolean): Array[Any] => Boolean = {
      val i = idx(attr)
      schema(i).dataType match {
        case LongType | IntegerType =>
          val v = value match {
            case l: java.lang.Long => l.longValue
            case n: java.lang.Integer => n.longValue
            case other => sys.error(s"hic-tsv: bad literal $other")
          }
          row => {
            val x = row(i)
            x != null && test(java.lang.Long.compare(x match {
              case l: java.lang.Long => l.longValue
              case n: java.lang.Integer => n.longValue
            }, v))
          }
        case DoubleType =>
          val v = value.asInstanceOf[Number].doubleValue
          row => {
            val x = row(i)
            x != null && test(java.lang.Double.compare(
              x.asInstanceOf[Number].doubleValue, v))
          }
        case StringType =>
          // Spark orders strings by UTF-8 BINARY order; java.lang.String
          // compareTo is UTF-16 code-unit order, and the two disagree on
          // supplementary-plane characters. Pushed filters are exactly
          // trusted (removed from the post-scan Filter), so range
          // predicates must compare in Spark's own collation. The parse
          // already materialized UTF8String, so this is compare-only.
          val v = org.apache.spark.unsafe.types.UTF8String
            .fromString(value.toString)
          row => {
            val x = row(i)
            x != null && test(x.asInstanceOf[
              org.apache.spark.unsafe.types.UTF8String].compareTo(v))
          }
        case other => sys.error(s"hic-tsv: unfilterable type $other")
      }
    }
    f match {
      case EqualTo(a, v) => cmp(a, v, _ == 0)
      case GreaterThan(a, v) => cmp(a, v, _ > 0)
      case GreaterThanOrEqual(a, v) => cmp(a, v, _ >= 0)
      case LessThan(a, v) => cmp(a, v, _ < 0)
      case LessThanOrEqual(a, v) => cmp(a, v, _ <= 0)
      case In(a, vs) =>
        val cs = vs.map(cmp(a, _, _ == 0)); r => cs.exists(_(r))
      case IsNotNull(a) => val i = idx(a); r => r(i) != null
      case IsNull(a) => val i = idx(a); r => r(i) == null
      case other => sys.error(s"hic-tsv: unpushable filter $other")
    }
  }
}

/** BATCH WRITE half of the connector — the canonical DSv2 staged-commit
  * protocol: every task writes one gzipped part file into a hidden
  * staging directory named by the job UUID, its commit MESSAGE carries
  * the staged file name, and the driver's `BatchWrite.commit` moves
  * exactly the messaged files into place (after clearing prior data
  * files under truncate/overwrite); `abort` deletes the staging
  * directory, so a failed job leaves the target untouched. Speculative
  * duplicate task attempts stage under distinct attempt-suffixed names
  * and only the committed attempt's file is moved.
  */
class HicTsvWriteBuilder(schema: StructType, path: String,
    queryId: String)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var doTruncate = false
  override def truncate()
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    doTruncate = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new org.apache.spark.sql.connector.write.Write {
      override def toBatch
          : org.apache.spark.sql.connector.write.BatchWrite =
        new HicTsvBatchWrite(schema, path, doTruncate,
          new SerializableConfiguration(SparkSession.active
            .sparkContext.hadoopConfiguration))
      override def toStreaming: org.apache.spark.sql.connector.write
          .streaming.StreamingWrite =
        new HicTsvStreamingWrite(schema, path,
          new SerializableConfiguration(SparkSession.active
            .sparkContext.hadoopConfiguration), queryId)
    }
}

class HicTsvBatchWrite(schema: StructType, path: String,
    truncate: Boolean, conf: SerializableConfiguration)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  private val jobId = java.util.UUID.randomUUID().toString
  private def stagingDir = new Path(path, s"_staging_$jobId")

  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DataWriterFactory =
    new HicTsvWriterFactory(schema, stagingDir.toString, conf,
      jobId.take(8))

  override def commit(
      messages: Array[org.apache.spark.sql.connector.write
        .WriterCommitMessage]): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf.value)
    val moves = messages.map { case m: HicTsvCommit =>
      new Path(m.staged) -> new Path(p, m.fileName)
    }
    // validate EVERYTHING before destroying or moving ANYTHING: every
    // staged source must exist and every destination must be free —
    // only then truncate and move. A rename failing after that point is
    // a genuine mid-commit fault (generic filesystems give no atomic
    // multi-file swap), but the common failure modes (lost staged file,
    // destination conflict) can no longer cost the previous table.
    fs.mkdirs(p)
    moves.find { case (src, _) => !fs.exists(src) }.foreach { case (s0, _) =>
      sys.error(s"hic-tsv commit: staged file $s0 is missing")
    }
    moves.find { case (_, dst) => fs.exists(dst) }.foreach { case (_, d) =>
      sys.error(s"hic-tsv commit: destination $d already exists")
    }
    if (truncate)
      fs.listStatus(p).filter(s => s.isFile &&
        !s.getPath.getName.startsWith("_"))
        .foreach(s => fs.delete(s.getPath, false))
    moves.foreach { case (src, dst) =>
      if (!fs.rename(src, dst))
        sys.error(s"hic-tsv commit: cannot move $src to $dst")
    }
    fs.delete(stagingDir, true)
  }

  override def abort(
      messages: Array[org.apache.spark.sql.connector.write
        .WriterCommitMessage]): Unit = {
    val fs = stagingDir.getFileSystem(conf.value)
    fs.delete(stagingDir, true)
  }
}

case class HicTsvCommit(staged: String, fileName: String)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

class HicTsvWriterFactory(schema: StructType, staging: String,
    conf: SerializableConfiguration, jobTag: String)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    // job-unique file names: append never collides with a prior job's
    // parts, so the commit loop cannot half-apply and then fail
    new HicTsvWriter(schema, staging, partitionId, taskId, conf,
      Some(f"part-$partitionId%05d-$jobTag.tsv.gz"))
}

class HicTsvWriter(schema: StructType, staging: String,
    partitionId: Int, taskId: Long, conf: SerializableConfiguration,
    fileName0: Option[String] = None)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  private val fileName =
    fileName0.getOrElse(f"part-$partitionId%05d.tsv.gz")
  private val stagedPath =
    new Path(staging, s"$fileName.attempt-$taskId")
  private val out = {
    val fs = stagedPath.getFileSystem(conf.value)
    new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      new java.util.zip.GZIPOutputStream(fs.create(stagedPath, true)),
      StandardCharsets.UTF_8))
  }
  private val types = schema.fields.map(_.dataType)

  override def write(row: InternalRow): Unit = {
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < types.length) {
      if (i > 0) sb.append('\t')
      if (!row.isNullAt(i)) types(i) match {
        case LongType => sb.append(row.getLong(i))
        case IntegerType => sb.append(row.getInt(i))
        case DoubleType => sb.append(row.getDouble(i))
        case _ =>
          val s = row.getUTF8String(i).toString
          // the format is headerless TSV with NO escaping (the
          // reference surface): a tab or newline inside a value writes
          // a row the reader re-parses shifted or split — refuse at
          // write time instead of corrupting silently
          if (s.indexOf('\t') >= 0 || s.indexOf('\n') >= 0 ||
              s.indexOf('\r') >= 0)
            sys.error(s"hic-tsv write: ${schema.fields(i).name} value " +
              "contains a tab/newline, which this unescaped TSV format " +
              s"cannot represent: '$s'")
          sb.append(s)
      }
      i += 1
    }
    sb.append('\n')
    out.write(sb.toString)
  }

  override def commit()
      : org.apache.spark.sql.connector.write.WriterCommitMessage = {
    out.close()
    HicTsvCommit(stagedPath.toString, fileName)
  }

  override def abort(): Unit = {
    out.close()
    val fs = stagedPath.getFileSystem(conf.value)
    fs.delete(stagedPath, false)
  }

  override def close(): Unit = ()
}

/** STREAMING write: one gz part file per (epoch, partition), staged and
  * moved on epoch commit. A replayed epoch (restart between the sink
  * commit and the checkpoint commit — the at-least-once window) finds
  * its destination files already present and SKIPS them, deleting the
  * re-staged copies: per-epoch file naming makes the sink idempotent,
  * which is exactly how file-based exactly-once sinks work.
  *
  * File names carry the streaming QUERY id (stable across restarts from
  * the same checkpoint, fresh for a new checkpoint): a new query writing
  * into a directory that already holds an old run's files must not
  * mistake the old `part-00000-...` for its own committed epoch 0 and
  * silently drop its staged data — epoch ids restart at 0 per
  * checkpoint, so epoch alone is not a dedup key across runs.
  */
class HicTsvStreamingWrite(schema: StructType, path: String,
    conf: SerializableConfiguration, queryId: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  private val runTag =
    queryId.replaceAll("[^0-9a-zA-Z]", "").takeRight(12) match {
      case "" => "q0"
      case t => t
    }

  override def createStreamingWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming
        .StreamingDataWriterFactory =
    new HicTsvStreamingWriterFactory(schema, path, conf, runTag)

  override def commit(epochId: Long,
      messages: Array[org.apache.spark.sql.connector.write
        .WriterCommitMessage]): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf.value)
    fs.mkdirs(p)
    val staging = new Path(path, s"_streaming_epoch$epochId")
    // EPOCH-level idempotency marker, written as the LAST step: the
    // per-file exists-skip below deduplicates a replay only while the
    // partitioning matches — a replayed epoch re-planned with a
    // DIFFERENT partition count (restart with new shuffle.partitions
    // inside the at-least-once window) stages the same rows under
    // names the original never used, and file-grain skipping would
    // rename them in as duplicates. The marker records "this epoch's
    // rows are fully visible", so such a replay drops its staging
    // wholesale. A crash between the last rename and the marker
    // leaves the file-grain path, which is exact when the replay's
    // partitioning matches — the narrower residual window is the
    // generic no-atomic-multi-file-swap fault the batch commit also
    // documents.
    val marker = new Path(p, f"_committed-$runTag-$epochId%05d")
    if (fs.exists(marker)) {
      fs.delete(staging, true)
      return
    }
    messages.foreach { case m: HicTsvCommit =>
      val dst = new Path(p, m.fileName)
      if (fs.exists(dst)) fs.delete(new Path(m.staged), false)
      else if (!fs.rename(new Path(m.staged), dst))
        sys.error(s"hic-tsv streaming commit: cannot move ${m.staged}")
    }
    if (fs.exists(staging)) fs.delete(staging, true)
    fs.create(marker, true).close()
    // only the newest marker matters (the at-least-once window is one
    // epoch deep) — reap this run's older ones so a long stream keeps
    // O(1) marker files, not one per epoch. Compare the trailing epoch
    // NUMERICALLY, not lexicographically: the %05d field widens at
    // epoch 100000, and '-100000' sorts below '-99999' as a string —
    // the last 5-digit-era marker would otherwise never reap.
    val prefix = s"_committed-$runTag-"
    fs.listStatus(p).map(_.getPath).foreach { f =>
      if (f.getName.startsWith(prefix) && f.getName != marker.getName &&
          f.getName.drop(prefix.length).toLongOption.exists(_ < epochId))
        fs.delete(f, false)
    }
  }

  override def abort(epochId: Long,
      messages: Array[org.apache.spark.sql.connector.write
        .WriterCommitMessage]): Unit = {
    val staging = new Path(path, s"_streaming_epoch$epochId")
    val fs = staging.getFileSystem(conf.value)
    if (fs.exists(staging)) fs.delete(staging, true)
  }
}

class HicTsvStreamingWriterFactory(schema: StructType, path: String,
    conf: SerializableConfiguration, runTag: String)
    extends org.apache.spark.sql.connector.write.streaming
      .StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new HicTsvWriter(schema, s"$path/_streaming_epoch$epochId",
      partitionId, taskId, conf,
      Some(f"part-$runTag-$epochId%05d-$partitionId%05d.tsv.gz"))
}
