package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.Charset
import java.util.{Map => JMap}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 TSV connector — the reference's file-scan surface
  * (`usnvc.py:109-218`: 18 tab-separated tables, ISO-8859-1, header
  * row) re-expressed as a first-class Spark `TableProvider`, which is
  * the remaining extension point the engine hadn't exercised
  * (`Expression`/`Aggregator`/optimizer `Rule`/`SparkSessionExtensions`
  * are covered elsewhere).
  *
  * What makes it Spark-native rather than a parser wrapped in a UDF:
  *  - **Column pruning reaches the parser**: `SupportsPushDownRequiredColumns`
  *    hands the pruned schema to the reader, which materializes ONLY
  *    the required fields — a projection of 2 of 50 columns splits the
  *    line once and converts 2 cells (the text-source equivalent of a
  *    parquet `ReadSchema`).
  *  - **Filter pushdown reaches the parser**: `SupportsPushDownFilters`
  *    evaluates equality/range/null predicates on the RAW cells and
  *    skips non-matching lines before any row materializes (the
  *    text-source analogue of row-group skipping); every filter is
  *    also left residual, so pushing is an accelerator, never a
  *    correctness dependency ([[TsvFilters]]).
  *  - **Statistics for the optimizer**: `SupportsReportStatistics`
  *    reports the files' byte size, so Catalyst can make the
  *    broadcast-vs-shuffle call for TSV dims like it does for parquet.
  *  - **One InputPartition per file**: the directory fans out across
  *    executors; at 100 TB the unit of parallelism is the file (the
  *    reference's export is sharded), and a reader task streams its
  *    file — constant memory, no whole-file buffering.
  *  - **Hadoop FileSystem paths** end to end, so `hdfs://`/`s3a://`
  *    URIs work unchanged on a real cluster; local `file://` is just
  *    the degenerate case.
  *
  * Usage: `spark.read.format("graft-tsv").schema(s).load(dir)` (or the
  * provider class name). Options: `charset` (default ISO-8859-1, the
  * reference's encoding), `header` (default true), `nullValue`
  * (default empty string → null for non-string types). Schema defaults
  * to all-strings inferred from the header; a user schema (the pinned
  * `UsnvcSchemas` contract) is honoured via `supportsExternalMetadata`.
  * Cells are split on bare tabs (the reference export never quotes
  * embedded tabs — writers must escape, as `q172`'s exporter does).
  */
class TsvTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-tsv"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val opts = TsvOptions(options)
    val conf = TsvSource.driverConf()
    val files = TsvSource.listFiles(opts.path, conf)
    require(files.nonEmpty, s"graft-tsv: no input files under ${opts.path}")
    val header = TsvSource.firstLine(files.head, opts.charset, conf)
      .getOrElse(throw new IllegalArgumentException(
        s"graft-tsv: cannot infer schema from empty file ${files.head}"))
    val names =
      if (opts.header) header.split("\t", -1).toSeq
      else header.split("\t", -1).indices.map(i => s"_c$i")
    StructType(names.map(n => StructField(n, StringType, nullable = true)))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new TsvTable(schema, new CaseInsensitiveStringMap(properties))
}

private[sources] case class TsvOptions(
    path: String, charset: String, header: Boolean, nullValue: String)

private[sources] object TsvOptions {
  def apply(options: CaseInsensitiveStringMap): TsvOptions = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-tsv: 'path' is required"))
    TsvOptions(
      path,
      Option(options.get("charset")).getOrElse("ISO-8859-1"),
      Option(options.get("header")).forall(_.toBoolean),
      Option(options.get("nullValue")).getOrElse(""))
  }
}

private[sources] object TsvSource {
  /** The session's Hadoop configuration on the driver — fs settings
    * from `spark.hadoopConfiguration` (s3a credentials, endpoints,
    * tuning) must reach the connector or the scaladoc promise that
    * `hdfs://`/`s3a://` URIs work unchanged is false. Falls back to a
    * bare Configuration only when no session exists (never in a Spark
    * job — `inferSchema`/`build`/`commit` all run inside one). */
  def driverConf(): Configuration =
    SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  /** Non-hidden regular files under `path` (or `path` itself),
    * RECURSING into non-hidden subdirectories (a partitioned layout
    * like `lang=en/part-0.tsv` must read completely — the builtin file
    * sources recurse too; dropping subdirectories silently would be
    * row loss). Sorted for deterministic partition numbering. */
  def listFiles(path: String, conf: Configuration): Seq[String] = {
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    def hidden(p: Path): Boolean =
      p.getName.startsWith("_") || p.getName.startsWith(".")
    def walk(st: FileStatus): Seq[Path] =
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq.filterNot(s => hidden(s.getPath)).flatMap(walk)
      else Seq(st.getPath)
    val st = fs.getFileStatus(root)
    val files = if (st.isDirectory) walk(st) else Seq(root)
    files.map(_.toString).sorted
  }

  def firstLine(file: String, charset: String, conf: Configuration): Option[String] = {
    val r = open(file, charset, conf)
    try Option(r.readLine()) finally r.close()
  }

  def open(file: String, charset: String, conf: Configuration): BufferedReader = {
    val p = new Path(file)
    val fs = p.getFileSystem(conf)
    new BufferedReader(new InputStreamReader(fs.open(p), Charset.forName(charset)))
  }
}

private[sources] class TsvTable(tableSchema: StructType,
    options: CaseInsensitiveStringMap)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-tsv(${options.get("path")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(caseInsensitiveStringMap: CaseInsensitiveStringMap): ScanBuilder = {
    // merge table properties with per-read options (read options win)
    val merged = new java.util.HashMap[String, String]()
    options.asCaseSensitiveMap().forEach((k, v) => merged.put(k, v))
    caseInsensitiveStringMap.asCaseSensitiveMap().forEach((k, v) => merged.put(k, v))
    new TsvScanBuilder(tableSchema, new CaseInsensitiveStringMap(merged))
  }
  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    val merged = new java.util.HashMap[String, String]()
    options.asCaseSensitiveMap().forEach((k, v) => merged.put(k, v))
    info.options().asCaseSensitiveMap().forEach((k, v) => merged.put(k, v))
    new TsvWriteBuilder(info.schema(), TsvOptions(new CaseInsensitiveStringMap(merged)))
  }
}

private[sources] class TsvScanBuilder(full: StructType,
    options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = full
  private var pushed: Array[sources.Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  /** Accept the predicates [[TsvFilters]] can evaluate during the
    * parse (rows are dropped before materialization — the text-source
    * equivalent of parquet row-group skipping, minus the statistics).
    * ALL filters are returned as residual: Spark re-evaluates them
    * post-scan, so a pushed predicate is a row-skipping accelerator,
    * never a correctness dependency. */
  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    pushed = filters.filter(f => TsvFilters.supported(full, f))
    filters
  }
  override def pushedFilters(): Array[sources.Filter] = pushed
  override def build(): Scan =
    new TsvScan(full, required, pushed, TsvOptions(options))
}

private[sources] class TsvScan(full: StructType, required: StructType,
    pushed: Array[sources.Filter], opts: TsvOptions)
    extends Scan with Batch with SupportsReportStatistics {
  // session Hadoop conf, captured driver-side at plan time and shipped
  // to executors inside the reader factory (s3a credentials etc.)
  private val confSer =
    new org.apache.spark.util.SerializableConfiguration(TsvSource.driverConf())
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-tsv ${opts.path} ReadSchema: ${required.simpleString}" +
      (if (pushed.nonEmpty) s" PushedFilters: ${pushed.mkString("[", ", ", "]")}"
       else "")
  override def planInputPartitions(): Array[InputPartition] =
    TsvSource.listFiles(opts.path, confSer.value).map(TsvFilePartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new TsvReaderFactory(full, required, pushed, opts, confSer)
  /** Byte size for the optimizer's broadcast-vs-shuffle call. A table
    * written by [[TsvWrite]] carries a `_graft_stats` sidecar with the
    * committed row/byte totals — served directly (including numRows,
    * which a raw text listing can never know) when its file count
    * still matches the directory; otherwise the file system is
    * re-scanned for byte size and numRows stays unknown. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val (bytes, rows) = {
      val conf = confSer.value
      val files = TsvSource.listFiles(opts.path, conf)
      TsvStatsSidecar.read(opts.path, conf) match {
        case Some(s) if s.files == files.length => (s.bytes, Some(s.rows))
        case _ =>
          (files.map { f =>
            val p = new Path(f)
            p.getFileSystem(conf).getFileStatus(p).getLen
          }.sum, None)
      }
    }
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong =
      rows.map(java.util.OptionalLong.of)
        .getOrElse(java.util.OptionalLong.empty())
  }
}

/** The `_graft_stats` sidecar: one line `files=N rows=R bytes=B`,
  * written by the commit that published those files (name starts with
  * `_` so readers never parse it as data). `files` is the staleness
  * guard — anything else writing into the directory changes the file
  * count and invalidates the sidecar back to a plain fs scan. */
private[sources] object TsvStatsSidecar {
  final case class Stats(files: Long, rows: Long, bytes: Long)
  val Name = "_graft_stats"

  def write(dir: String, s: Stats, conf: Configuration): Unit = {
    val p = new Path(dir, Name)
    val out = p.getFileSystem(conf).create(p, true)
    try out.write(s"files=${s.files} rows=${s.rows} bytes=${s.bytes}\n"
      .getBytes("UTF-8"))
    finally out.close()
  }

  def read(dir: String, conf: Configuration): Option[Stats] = {
    val p = new Path(dir, Name)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) None
    else scala.util.Try {
      val in = new BufferedReader(new InputStreamReader(fs.open(p),
        Charset.forName("UTF-8")))
      val line = try in.readLine() finally in.close()
      val kv = line.trim.split(" ").map { t =>
        val Array(k, v) = t.split("=", 2); k -> v.toLong
      }.toMap
      Stats(kv("files"), kv("rows"), kv("bytes"))
    }.toOption
  }
}

private[sources] case class TsvFilePartition(file: String) extends InputPartition

private[sources] class TsvReaderFactory(full: StructType, required: StructType,
    pushed: Array[sources.Filter], opts: TsvOptions,
    confSer: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TsvPartitionReader(partition.asInstanceOf[TsvFilePartition].file,
      full, required, pushed, opts, confSer.value)
}

// --- Write path: DSv2 BATCH_WRITE with a task-temp + driver-commit
// protocol (no partial output on task failure; `mode("overwrite")` →
// SupportsTruncate clears committed files inside the same commit) ---

private[sources] class TsvWriteBuilder(schema: StructType, opts: TsvOptions)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var truncateFirst = false
  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    truncateFirst = true
    this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new TsvWrite(schema, opts, truncateFirst)
}

private[sources] class TsvWrite(schema: StructType, opts: TsvOptions,
    truncateFirst: Boolean)
    extends org.apache.spark.sql.connector.write.Write
    with org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._

  private val confSer =
    new org.apache.spark.util.SerializableConfiguration(TsvSource.driverConf())

  override def toBatch: BatchWrite = this
  override def description(): String = s"graft-tsv write ${opts.path}"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new TsvWriterFactory(schema, opts, confSer)

  /** Driver-side commit: optionally clear the previous contents, then
    * rename every task's temp file into place — a task that failed or
    * was speculatively superseded never published anything. Renames run
    * on a bounded thread pool (a serial loop is O(files) of driver
    * round-trips — on an object store at real shard counts that IS the
    * commit wall time); any failed rename fails the whole commit
    * loudly. The committed row/byte totals land in the
    * [[TsvStatsSidecar]] so the scan's `SupportsReportStatistics` can
    * serve this table without re-listing file lengths. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(opts.path)
    val fs = dir.getFileSystem(confSer.value)
    if (truncateFirst && fs.exists(dir))
      fs.listStatus(dir)
        .filterNot { st =>
          val n = st.getPath.getName
          n.startsWith("_") || n.startsWith(".") // keep _temporary + markers
        }
        .foreach(st => fs.delete(st.getPath, true))
    fs.mkdirs(dir)
    val msgs = messages.collect { case m: TsvCommitMessage => m }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(16, msgs.length)))
    try {
      val futures = msgs.map { m =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = {
            val from = new Path(m.tempPath)
            if (!fs.rename(from, new Path(dir, m.fileName)))
              throw new java.io.IOException(
                s"graft-tsv: commit rename failed: $from")
          }
        })
      }
      // surface the FIRST failure (unwrapped) after all tasks settle —
      // a half-committed set plus a clear error beats a hung pool
      var failure: Option[Throwable] = None
      futures.foreach { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            if (failure.isEmpty) failure = Some(e.getCause)
        }
      }
      failure.foreach(throw _)
    } finally pool.shutdown()
    TsvStatsSidecar.write(opts.path,
      TsvStatsSidecar.Stats(msgs.length.toLong,
        msgs.map(_.rows).sum, msgs.map(_.bytes).sum),
      confSer.value)
    // temp dir is working state, not table contents — clear it
    fs.delete(new Path(dir, "_temporary"), true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(opts.path).getFileSystem(confSer.value)
    messages.foreach {
      case m: TsvCommitMessage =>
        try fs.delete(new Path(m.tempPath), false)
        catch { case _: java.io.IOException => () }
      case _ => ()
    }
  }
}

private[sources] case class TsvCommitMessage(tempPath: String,
    fileName: String, rows: Long, bytes: Long)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

private[sources] class TsvWriterFactory(schema: StructType, opts: TsvOptions,
    confSer: org.apache.spark.util.SerializableConfiguration)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new TsvDataWriter(schema, opts, partitionId, taskId, confSer.value)
}

/** One temp file per task under `<path>/_temporary`; QUOTE_MINIMAL
  * encoding (quote only when the value contains a tab, quote, CR or
  * LF; doubled-quote escaping) — the exact dialect [[TsvPartitionReader]]
  * and the reference's pandas reader parse. Nulls write as the
  * configured nullValue (default empty), UNQUOTED; a genuinely
  * non-null string equal to the nullValue (the empty string, usually)
  * is QUOTED, and the reader keeps a quoted field non-null — so
  * `'' ≠ NULL` survives the write→read roundtrip instead of silently
  * conflating (a data-dependent hash break at other scale factors). */
private[sources] class TsvDataWriter(schema: StructType, opts: TsvOptions,
    partitionId: Int, taskId: Long, conf: Configuration)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  import org.apache.spark.sql.connector.write.WriterCommitMessage

  private val fileName = f"part-$partitionId%05d-$taskId.tsv"
  private val tempPath = s"${opts.path}/_temporary/$fileName-${java.util.UUID.randomUUID()}"
  private val fs = new Path(tempPath).getFileSystem(conf)
  private val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
    fs.create(new Path(tempPath), true), Charset.forName(opts.charset)))
  private var rowCount = 0L
  if (opts.header) {
    out.write(schema.fieldNames.map(encode).mkString("\t"))
    out.write("\n")
  }

  private def quoted(s: String): String =
    "\"" + s.replace("\"", "\"\"") + "\""

  private def encode(s: String): String =
    if (s.indexOf('\t') < 0 && s.indexOf('"') < 0 &&
        s.indexOf('\n') < 0 && s.indexOf('\r') < 0) s
    else quoted(s)

  private val getters: Array[InternalRow => String] =
    schema.fields.zipWithIndex.map { case (f, i) =>
      val g: InternalRow => String = f.dataType match {
        case StringType => r => {
          val s = r.getUTF8String(i).toString
          // non-null value that READS as the null sentinel -> quote it
          if (s == opts.nullValue) quoted(s) else encode(s)
        }
        case IntegerType => r => r.getInt(i).toString
        case LongType => r => r.getLong(i).toString
        case DoubleType => r => r.getDouble(i).toString
        case BooleanType => r => r.getBoolean(i).toString
        case other => throw new IllegalArgumentException(
          s"graft-tsv: unsupported write type $other")
      }
      (r: InternalRow) => if (r.isNullAt(i)) opts.nullValue else g(r)
    }

  override def write(row: InternalRow): Unit = {
    var i = 0
    while (i < getters.length) {
      if (i > 0) out.write('\t')
      out.write(getters(i)(row))
      i += 1
    }
    out.write("\n")
    rowCount += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    TsvCommitMessage(tempPath, fileName, rowCount,
      fs.getFileStatus(new Path(tempPath)).getLen)
  }

  override def abort(): Unit = {
    try out.close() catch { case _: java.io.IOException => () }
    try fs.delete(new Path(tempPath), false)
    catch { case _: java.io.IOException => () }
  }

  override def close(): Unit = ()
}

/** Parse-time predicate evaluation for pushed-down v1 filters.
  *
  * Supported: EqualTo / In (any type), ordering comparisons on NUMERIC
  * columns only (string ordering differs between Java's UTF-16
  * compareTo and Spark's UTF-8 binary order for supplementary
  * characters, so string ranges stay post-scan), IsNull / IsNotNull,
  * And of supported children. SQL three-valued logic: a comparison on
  * a null cell is false (row skipped) — identical to what the residual
  * Filter would do, so skipping early never changes results. */
private[sources] object TsvFilters {
  import org.apache.spark.sql.sources._

  private def ordered(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | DoubleType => true
    case _ => false
  }

  def supported(schema: StructType, f: Filter): Boolean = f match {
    case EqualTo(a, _) => schema.fieldNames.contains(a)
    case In(a, _) => schema.fieldNames.contains(a)
    case GreaterThan(a, _) => has(schema, a, ordered)
    case GreaterThanOrEqual(a, _) => has(schema, a, ordered)
    case LessThan(a, _) => has(schema, a, ordered)
    case LessThanOrEqual(a, _) => has(schema, a, ordered)
    case IsNull(a) => schema.fieldNames.contains(a)
    case IsNotNull(a) => schema.fieldNames.contains(a)
    case And(l, r) => supported(schema, l) && supported(schema, r)
    case _ => false
  }

  private def has(schema: StructType, name: String,
      p: DataType => Boolean): Boolean =
    schema.fieldNames.contains(name) && p(schema(name).dataType)

  /** (full-schema cell index, raw-cell predicate). The raw cell is the
    * pre-conversion string (null = missing/nullValue). */
  type CellPred = (Int, String => Boolean)

  def compile(schema: StructType, f: Filter,
      parse: (String, String) => Any): Seq[CellPred] = f match {
    case And(l, r) =>
      compile(schema, l, parse) ++ compile(schema, r, parse)
    case IsNull(a) => Seq((schema.fieldIndex(a), raw => raw == null))
    case IsNotNull(a) => Seq((schema.fieldIndex(a), raw => raw != null))
    case EqualTo(a, v) => cmp(schema, a, parse)(x => x == 0, v)
    case GreaterThan(a, v) => cmp(schema, a, parse)(x => x > 0, v)
    case GreaterThanOrEqual(a, v) => cmp(schema, a, parse)(x => x >= 0, v)
    case LessThan(a, v) => cmp(schema, a, parse)(x => x < 0, v)
    case LessThanOrEqual(a, v) => cmp(schema, a, parse)(x => x <= 0, v)
    case In(a, vs) =>
      val set = vs.map(normalize).toSet
      Seq((schema.fieldIndex(a),
        raw => raw != null && set.contains(normalize(parse(a, raw)))))
    case _ => Seq.empty
  }

  /** Literal values arrive as external types (String for strings);
    * parsed cells are internal (UTF8String) — compare on one side. */
  private def normalize(v: Any): Any = v match {
    case u: UTF8String => u.toString
    case other => other
  }

  private def cmp(schema: StructType, name: String,
      parse: (String, String) => Any)(
      accept: Int => Boolean, lit: Any): Seq[CellPred] = {
    val idx = schema.fieldIndex(name)
    Seq((idx, raw => raw != null && {
      val cell = normalize(parse(name, raw))
      val l = normalize(lit)
      val c = (cell, l) match {
        case (a: Int, b: Int) => java.lang.Integer.compare(a, b)
        case (a: Long, b: Long) => java.lang.Long.compare(a, b)
        case (a: Double, b: Double) => java.lang.Double.compare(a, b)
        case (a: Boolean, b: Boolean) => java.lang.Boolean.compare(a, b)
        case (a: String, b: String) => if (a == b) 0 else Int.MinValue
        case _ => Int.MinValue // type mismatch: never matches
      }
      if (c == Int.MinValue) false else accept(c)
    }))
  }
}

/** Streams one file: split each line on tabs once, evaluate pushed
  * predicates on the raw cells (skipping non-matching rows BEFORE any
  * materialization), then convert ONLY the required columns (by their
  * index in the FULL schema). Short rows (trailing empty cells dropped
  * by the writer) read as nulls — PERMISSIVE, matching the reference
  * reader's tolerance. */
private[sources] class TsvPartitionReader(file: String, full: StructType,
    required: StructType, pushed: Array[sources.Filter], opts: TsvOptions,
    conf: Configuration)
    extends PartitionReader[InternalRow] {

  private val reader = TsvSource.open(file, opts.charset, conf)
  if (opts.header) reader.readLine() // discard header
  // required column -> index in the full row, resolved once
  private val fieldIdx: Array[Int] = required.fields.map { f =>
    val i = full.fieldIndex(f.name)
    require(full(i).dataType == f.dataType,
      s"graft-tsv: pruned type mismatch for ${f.name}")
    i
  }
  private val converters: Array[String => Any] =
    required.fields.map(f => converter(f.dataType))
  private val fullConverters: Array[String => Any] =
    full.fields.map(f => converter(f.dataType))
  private val preds: Array[TsvFilters.CellPred] = pushed.flatMap(f =>
    TsvFilters.compile(full, f,
      (name, raw) => fullConverters(full.fieldIndex(name))(raw))).toArray
  private var current: InternalRow = _

  private def converter(dt: DataType): String => Any = dt match {
    case StringType => s => UTF8String.fromString(s)
    case IntegerType => s => s.trim.toInt
    case LongType => s => s.trim.toLong
    case DoubleType => s => s.trim.toDouble
    case BooleanType => s => s.trim.toBoolean
    case other => throw new IllegalArgumentException(
      s"graft-tsv: unsupported column type $other (string/int/long/double/boolean)")
  }

  // quoted-ness of the CURRENT line's fields (null on the quote-free
  // fast path = nothing quoted): a QUOTED field equal to the nullValue
  // is a real value (the writer quotes non-null empties), an unquoted
  // one is null
  private var curQuoted: Array[Boolean] = _

  private def cell(cells: Array[String], idx: Int): String = {
    val raw = if (idx < cells.length) cells(idx) else null
    if (raw == null) null
    else if (raw == opts.nullValue &&
      (curQuoted == null || idx >= curQuoted.length || !curQuoted(idx))) null
    else raw
  }

  /** Quote-aware field split (pandas QUOTE_MINIMAL / RFC 4180 on a tab
    * separator): a field STARTING with `"` is quoted — embedded tabs
    * are literal and `""` is a literal quote — which is exactly what
    * the reference export can legally contain (the adversarial USNVC
    * fixture row pins it). Quote-free lines take the zero-allocation
    * split fast path. Like the builtin line-mode csv reader, embedded
    * NEWLINES in quoted fields are out of scope (multiLine=false).
    * Sets [[curQuoted]] as a side effect. */
  private def splitLine(line: String): Array[String] = {
    if (line.indexOf('"') < 0) { curQuoted = null; line.split("\t", -1) }
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val qs = scala.collection.mutable.ArrayBuffer.empty[Boolean]
      val n = line.length
      var i = 0
      var done = false
      while (!done) {
        val sb = new java.lang.StringBuilder
        var q = false
        if (i < n && line.charAt(i) == '"') {
          q = true
          i += 1
          var closed = false
          while (!closed && i < n) {
            val c = line.charAt(i)
            if (c == '"') {
              if (i + 1 < n && line.charAt(i + 1) == '"') { sb.append('"'); i += 2 }
              else { closed = true; i += 1 }
            } else { sb.append(c); i += 1 }
          }
          // lenient: text between the closing quote and the tab is literal
          while (i < n && line.charAt(i) != '\t') { sb.append(line.charAt(i)); i += 1 }
        } else {
          while (i < n && line.charAt(i) != '\t') { sb.append(line.charAt(i)); i += 1 }
        }
        out += sb.toString
        qs += q
        if (i < n) i += 1 // consume the tab; EOL-after-tab yields a final empty field
        else done = true
      }
      curQuoted = qs.toArray
      out.toArray
    }
  }

  override def next(): Boolean = {
    var line = reader.readLine()
    while (line != null) {
      val cells = splitLine(line)
      var pass = true
      var p = 0
      while (pass && p < preds.length) {
        val (idx, pred) = preds(p)
        pass = pred(cell(cells, idx))
        p += 1
      }
      if (pass) {
        val row = new GenericInternalRow(fieldIdx.length)
        var i = 0
        while (i < fieldIdx.length) {
          val raw = cell(cells, fieldIdx(i))
          row.update(i, if (raw == null) null else converters(i)(raw))
          i += 1
        }
        current = row
        return true
      }
      line = reader.readLine()
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
