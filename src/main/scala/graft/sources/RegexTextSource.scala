package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The Hive StorageHandler / RegexSerDe seat as a DataSource V2
  * `TableProvider` (VERDICT r16 #3): `spark.read.format("graft-regex")
  * .schema(...).option("regex", ...)` parses raw text lines into typed
  * columns via capture groups — the "read arbitrary log lines"
  * surface, but as a real pluggable storage format instead of a
  * post-scan expression pipeline (`scan_text_serde` now reads through
  * this source; ScanSpec keeps the expression form as a bit-identity
  * cross-check).
  *
  * Hive parity decisions:
  *   - the schema is DECLARED, never inferred (RegexSerDe requires
  *     the table definition); capture group i feeds column i;
  *   - READ-ONLY, like the original: Hive's RegexSerDe deserializes
  *     only (a regex does not define a serialization), so no
  *     BATCH_WRITE capability is claimed;
  *   - a line the regex does not match yields an all-NULL row, and a
  *     group that fails its type cast yields a NULL column (RegexSerDe
  *     null semantics).
  *
  * Scan capabilities, because a 100 TB log table lives or dies by
  * them:
  *   - COLUMN PRUNING (`SupportsPushDownRequiredColumns`): only the
  *     requested capture groups are converted; the plan's ReadSchema
  *     shows the pruned width;
  *   - FILTER PUSHDOWN (`SupportsPushDownFilters`): comparison/
  *     null-test predicates on parsed columns are evaluated INSIDE
  *     the reader, right after the regex match, so dropped rows never
  *     reach Spark (they are reported as PushedFilters and re-checked
  *     by nothing — the reader's evaluation is exact);
  *   - LINE-BOUNDARY FILE SPLITTING: files larger than `splitBytes`
  *     (option, default 64 MiB) become multiple byte-range
  *     partitions. A reader owns exactly the lines whose START offset
  *     falls in [start, end): for start > 0 it seeks to start-1 and
  *     discards one line (empty when start-1 is the previous line's
  *     newline), which lands it on the first owned line; it reads its
  *     last owned line through completion past end. Without this, one
  *     10 GB log file is one task — the difference between 1 core and
  *     a cluster on a real log table.
  */
class RegexTextSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-regex"
  // schema is user-declared, like a Hive table definition
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "graft-regex requires an explicit .schema(...) — capture group i feeds column i")
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    RegexTable(schema, properties.asScala.toMap)
}

case class RegexTable(declaredSchema: StructType, props: Map[String, String])
  extends Table with SupportsRead {
  override def schema(): StructType = declaredSchema
  override def name(): String =
    s"graft-regex(${props.getOrElse("path", "?")})"
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    RegexScanBuilder(declaredSchema,
      // a DataFrameReader load passes the path as a scan option; a
      // catalog table (CREATE TABLE ... USING graft-regex) carries it
      // in the table properties instead
      Option(options.get("path")).orElse(props.get("path"))
        .getOrElse(throw new IllegalArgumentException(
          "graft-regex requires option 'path'")),
      Option(options.get("regex")).getOrElse(props.getOrElse("regex",
        throw new IllegalArgumentException("graft-regex requires option 'regex'"))),
      Option(options.get("splitBytes")).map(_.toLong)
        .orElse(props.get("splitBytes").map(_.toLong))
        .map(sb => { require(sb > 0, s"splitBytes must be positive, got $sb"); sb })
        .getOrElse(64L << 20))
}

case class RegexScanBuilder(fullSchema: StructType, path: String, regex: String,
    splitBytes: Long)
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with SupportsPushDownFilters {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rest) = filters.partition(RegexScan.supported(fullSchema))
    pushed = supported
    rest // Spark keeps evaluating these above the scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    RegexScan(fullSchema, required, path, regex, pushed, splitBytes)
}

case class RegexScan(fullSchema: StructType, required: StructType,
    path: String, regex: String, filters: Array[Filter], splitBytes: Long)
  extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftRegexScan path=$path, PushedFilters: [${filters.mkString(", ")}], " +
      s"ReadSchema: ${required.simpleString}"

  /** Input byte size from the file listing, so the optimizer's join
    * planning (broadcast threshold, AQE) sees a real number instead
    * of the unknown-stats default — the property that decides whether
    * a 100 TB log table accidentally lands on the build side. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes = planInputPartitions().map(
      _.asInstanceOf[RegexFilePartition].length).sum
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
  }

  /** Listing + byte-range planning through the Hadoop FS API, so the
    * source works against any Spark-reachable filesystem (HDFS, S3A,
    * local), not just java.io — the property that lets a 1000-executor
    * cluster actually open these files. */
  override def planInputPartitions(): Array[InputPartition] = {
    val conf = RegexScan.driverHadoopConf()
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val status = fs.getFileStatus(root)
    val files =
      if (status.isFile) Array(status)
      else fs.listStatus(root).filter(st => st.isFile && {
        val n = st.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      })
    files.sortBy(_.getPath.getName).flatMap { st =>
      val len = st.getLen
      val p = st.getPath.toString
      if (len <= splitBytes) Seq(RegexFilePartition(p, 0L, len))
      else (0L until len by splitBytes).map(start =>
        RegexFilePartition(p, start, math.min(splitBytes, len - start)))
    }.map(p => p: InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // executors have no SparkSession: ship the driver's Hadoop conf
    // as a plain serializable map and rebuild it reader-side
    RegexReaderFactory(fullSchema, required, regex, filters,
      RegexScan.confToMap(RegexScan.driverHadoopConf()))
}

case class RegexFilePartition(file: String, start: Long, length: Long)
  extends InputPartition

case class RegexReaderFactory(fullSchema: StructType, required: StructType,
    regex: String, filters: Array[Filter], confMap: Map[String, String])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new RegexPartitionReader(
      partition.asInstanceOf[RegexFilePartition],
      fullSchema, required, regex, filters, confMap)
}

/** Byte-range line reader: owns exactly the lines whose START offset
  * is in [start, start+length) — for start > 0 it seeks to start-1
  * and discards one line (which the previous range read through),
  * and it reads its own last line through completion past the range
  * end. Per line: regex-match, convert the NEEDED capture groups
  * (required columns ∪ filter columns), evaluate pushed filters, emit
  * the pruned row. */
class RegexPartitionReader(part: RegexFilePartition, fullSchema: StructType,
    required: StructType, regex: String, filters: Array[Filter],
    confMap: Map[String, String])
  extends PartitionReader[InternalRow] {

  private val pattern = java.util.regex.Pattern.compile(regex)
  private val filterCols = filters.flatMap(RegexScan.references).toSet
  // full-schema ordinals that must be parsed at all
  private val neededOrdinals = fullSchema.fields.zipWithIndex.collect {
    case (f, i) if required.fieldNames.contains(f.name) || filterCols(f.name) => i
  }
  private val requiredOrdinals = required.fields.map(f => fullSchema.fieldIndex(f.name))

  // Hadoop FS open + positional seek (FSDataInputStream), so a range
  // at offset 10 GB starts with one seek, not a 10 GB skip loop —
  // and the file can live on HDFS/S3A, not just the local disk
  private val in: java.io.BufferedInputStream = {
    val hPath = new org.apache.hadoop.fs.Path(part.file)
    val stream = hPath.getFileSystem(RegexScan.mapToConf(confMap)).open(hPath)
    if (part.start > 0) stream.seek(part.start - 1)
    new java.io.BufferedInputStream(stream)
  }
  private val rangeEnd = part.start + part.length
  private var pos: Long = 0L // byte offset of the next unread byte
  // position on the first OWNED line: from start-1, discard one line
  // — empty when start-1 holds the previous line's newline
  if (part.start > 0) {
    pos = part.start - 1
    readLineBytes()
  }

  /** Read one '
'-terminated line (trailing 
 stripped), advancing
    * `pos` by the bytes CONSUMED; null at EOF. UTF-8-safe: multi-byte
    * sequences never contain the 0x0A byte. */
  private def readLineBytes(): String = {
    var b = in.read()
    if (b == -1) return null
    val buf = new java.io.ByteArrayOutputStream(128)
    while (b != -1 && b != 0x0A) { buf.write(b); b = in.read() }
    pos += buf.size() + (if (b == 0x0A) 1 else 0)
    val arr = buf.toByteArray
    val n = if (arr.nonEmpty && arr.last == 0x0D) arr.length - 1 else arr.length
    new String(arr, 0, n, java.nio.charset.StandardCharsets.UTF_8)
  }

  private var current: InternalRow = _

  override def next(): Boolean = {
    while (pos < rangeEnd) { // next line STARTS inside the range
      val line = readLineBytes()
      if (line == null) return false
      val m = pattern.matcher(line)
      // parsed full-width row (only needed ordinals converted)
      val full = new Array[Any](fullSchema.length)
      if (m.matches()) {
        neededOrdinals.foreach { i =>
          val g = if (i + 1 <= m.groupCount()) m.group(i + 1) else null
          full(i) = RegexScan.convert(g, fullSchema.fields(i).dataType)
        }
      } // no match -> all-NULL row (RegexSerDe semantics)
      if (filters.forall(f => RegexScan.eval(f, fullSchema, full))) {
        current = InternalRow.fromSeq(requiredOrdinals.toIndexedSeq.map(full))
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}

object RegexScan {
  /** The driver's Hadoop configuration (credentials, fs.* settings)
    * when a session is active; defaults otherwise (tests). */
  private[sources] def driverHadoopConf(): org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  /** Configuration → serializable map (only explicitly-set entries
    * matter cross-process; defaults reload from the executor's own
    * classpath). */
  private[sources] def confToMap(c: org.apache.hadoop.conf.Configuration): Map[String, String] = {
    val it = c.iterator()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
    b.result()
  }

  private[sources] def mapToConf(m: Map[String, String]): org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration()
    m.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** Typed conversion; a failed cast is a NULL column, like the
    * SerDe's. Strings become UTF8String (InternalRow contract). */
  def convert(s: String, dt: DataType): Any =
    if (s == null) null
    else try dt match {
      case StringType => UTF8String.fromString(s)
      case LongType => s.trim.toLong
      case IntegerType => s.trim.toInt
      case DoubleType => s.trim.toDouble
      case FloatType => s.trim.toFloat
      case BooleanType => s.trim.toBoolean
      case _ => null
    } catch { case _: IllegalArgumentException => null }

  def references(f: Filter): Seq[String] = f.references.toSeq

  /** Which source filters the reader can evaluate exactly. */
  def supported(schema: StructType)(f: Filter): Boolean = f match {
    case EqualTo(a, _) => schema.fieldNames.contains(a)
    case GreaterThan(a, _) => schema.fieldNames.contains(a)
    case GreaterThanOrEqual(a, _) => schema.fieldNames.contains(a)
    case LessThan(a, _) => schema.fieldNames.contains(a)
    case LessThanOrEqual(a, _) => schema.fieldNames.contains(a)
    case IsNotNull(a) => schema.fieldNames.contains(a)
    case IsNull(a) => schema.fieldNames.contains(a)
    case _ => false
  }

  /** SQL comparison semantics on the parsed row: NULL compares to
    * nothing (row dropped), numerics compare numerically, strings
    * and booleans by natural order. */
  def eval(f: Filter, schema: StructType, row: Array[Any]): Boolean = {
    def v(name: String): Any = row(schema.fieldIndex(name))
    def cmp(x: Any, y: Any): Option[Int] = (x, y) match {
      case (null, _) | (_, null) => None
      case (a: UTF8String, b) => Some(a.toString.compareTo(b.toString))
      case (a: Number, b: Number) =>
        Some(java.lang.Double.compare(a.doubleValue(), b.doubleValue()))
      case (a: Boolean, b: Boolean) => Some(a.compareTo(b))
      case _ => None
    }
    f match {
      case EqualTo(a, lit) => cmp(v(a), lit).contains(0)
      case GreaterThan(a, lit) => cmp(v(a), lit).exists(_ > 0)
      case GreaterThanOrEqual(a, lit) => cmp(v(a), lit).exists(_ >= 0)
      case LessThan(a, lit) => cmp(v(a), lit).exists(_ < 0)
      case LessThanOrEqual(a, lit) => cmp(v(a), lit).exists(_ <= 0)
      case IsNotNull(a) => v(a) != null
      case IsNull(a) => v(a) == null
      case _ => true // unsupported never pushed (see supported)
    }
  }
}
