package graft.sources.v2

import java.util
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.HadoopReadOptions
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.metadata.BlockMetaData
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.ColumnIOFactory
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Type}
import org.apache.parquet.schema.LogicalTypeAnnotation.{DecimalLogicalTypeAnnotation, TimestampLogicalTypeAnnotation, TimeUnit}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration
import scala.jdk.CollectionConverters._

/** DataSource V2 connector — the Spark-native re-expression of the
  * reference's MapReduce `InputFormat` chain
  * (reference: ArgodbMapreduceInputFormat.java:104-199 getSplits →
  * planInputPartitions; ArgodbMapreduceRecordReader.java:74-219 →
  * PartitionReader; MetaUtils schema discovery → inferSchema):
  *
  *   spark.read.format("graft").load("/path/table.parquet")
  *
  * Splits are parquet row groups (the rowset-group analog —
  * ArgodbMapreduceInputFormat.java:149-188 builds one split per
  * RowSetsGroup); pushed filters prune whole row groups from the scan
  * via footer min/max statistics (the partition/section pruning
  * analog), and Spark re-evaluates every filter on the surviving rows
  * so pruning is purely an optimization. Primitive columns only — the
  * engine's primary path stays `GraftCatalog` (Spark's own vectorized
  * parquet reader); this connector demonstrates the InputFormat
  * machinery Spark-natively.
  */
class GraftTableProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftV2.readSchema(GraftV2.pathOf(options), GraftV2.sessionConf().value)

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    GraftTable(properties.get("path"), schema)
}

/** `pinnedFiles` (when non-empty) fixes the exact data-file set the
  * scan reads instead of re-listing the path at plan time — the
  * SQL-catalog route passes the namespace's pinned snapshot through
  * here so a file landing mid-session is invisible (the GraftCatalog
  * snapshot semantics, carried into `SELECT ... FROM graft.ns.tbl`).
  */
case class GraftTable(path: String, tableSchema: StructType,
    pinnedFiles: Seq[String] = Seq.empty) extends Table with SupportsRead {
  override def name(): String = s"graft:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(path, tableSchema, pinnedFiles)
}

class GraftScanBuilder(path: String, fullSchema: StructType,
    pinnedFiles: Seq[String] = Seq.empty) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Keep every filter for row-group stats pruning, and hand every
    * filter back to Spark for exact row-level evaluation (stats
    * pruning is conservative, never exact).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = GraftScan(path, required, pushed,
    pinnedFiles = pinnedFiles)
}

case class GraftScan(path: String, required: StructType, filters: Array[Filter],
    conf: SerializableConfiguration = GraftV2.sessionConf(),
    pinnedFiles: Seq[String] = Seq.empty)
    extends Scan with Batch with SupportsRuntimeFiltering {

  /** Filters Spark hands over at RUNTIME (dynamic partition pruning /
    * runtime row-group filtering from a completed build side), on top
    * of the compile-time pushed ones. The reference's split pruning is
    * static only (ArgodbMapreduceInputFormat.java:208-255); this is
    * the Spark-native upgrade: an `In(join_key, values)` arriving
    * after the dim side materializes prunes row groups by footer
    * stats before any task launches.
    */
  private var runtimeFilters: Array[Filter] = Array.empty

  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    required.fieldNames.map(org.apache.spark.sql.connector.expressions.Expressions.column)

  override def filter(filters: Array[Filter]): Unit = { runtimeFilters = filters }

  override def readSchema(): StructType = required

  override def description(): String =
    s"graft parquet row-group scan, pushed=[${filters.mkString(",")}]"

  override def toBatch: Batch = this

  /** One split per surviving (file, row group): the table path may be
    * a single parquet file or a whole directory — the directory case
    * enumerates every data file, mirroring the reference's per-section
    * rowset-group enumeration (ArgodbMapreduceInputFormat.java:104-199
    * walks sections and emits one split per RowSetsGroup). Row groups
    * whose footer stats provably exclude every pushed/runtime filter
    * are dropped before any task launches.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val all = filters ++ runtimeFilters
    val fileSet =
      if (pinnedFiles.nonEmpty) pinnedFiles else GraftV2.dataFiles(path, conf.value)
    fileSet.flatMap { file =>
      val footer = GraftV2.withReader(file, conf.value)(_.getFooter)
      val blocks = footer.getBlocks.asScala.toArray
      // locality: hosts holding each row group's byte range, the analog
      // of the reference's ArgodbMapreduceInputSplit.java:49-60
      // getLocations(). Spark's scheduler uses these for NODE_LOCAL
      // placement on a real cluster; on local FS the listing is empty
      // or localhost and is simply ignored.
      val p = new Path(file)
      val fs = p.getFileSystem(conf.value)
      val status = fs.getFileStatus(p)
      blocks.zipWithIndex
        .filterNot { case (b, _) => GraftV2.canSkipRowGroup(b, all) }
        .map { case (b, i) =>
          val hosts =
            try fs.getFileBlockLocations(status, b.getStartingPos, b.getCompressedSize)
              .flatMap(_.getHosts).distinct
            catch { case _: java.io.IOException => Array.empty[String] }
          GraftInputPartition(file, i, hosts): InputPartition
        }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftReaderFactory(required, conf)
}

case class GraftInputPartition(path: String, rowGroup: Int,
    hosts: Array[String] = Array.empty) extends InputPartition {
  override def preferredLocations(): Array[String] = hosts
}

case class GraftReaderFactory(required: StructType,
    conf: SerializableConfiguration) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftInputPartition]
    new GraftPartitionReader(p.path, p.rowGroup, required, conf.value)
  }
}

/** The RecordReader analog: one parquet row group → InternalRows with
  * only the required columns materialized.
  */
class GraftPartitionReader(path: String, rowGroup: Int, required: StructType,
    hadoopConf: Configuration) extends PartitionReader[InternalRow] {

  private val reader = ParquetFileReader.open(
    HadoopInputFile.fromPath(new Path(path), hadoopConf),
    HadoopReadOptions.builder(hadoopConf).build())

  private val fileSchema = reader.getFooter.getFileMetaData.getSchema
  private val requestedTypes: Array[Type] =
    required.fieldNames.map(n => fileSchema.getType(Seq(n): _*))
  private val requested = new MessageType(fileSchema.getName, requestedTypes: _*)
  reader.setRequestedSchema(requested)

  (0 until rowGroup).foreach(_ => reader.skipNextRowGroup())
  private val store = reader.readNextRowGroup()
  private val recordReader = new ColumnIOFactory().getColumnIO(requested)
    .getRecordReader(store, new GroupRecordConverter(requested))
  private var remaining = store.getRowCount
  private var current: InternalRow = _

  private val converters: Array[Group => Any] =
    required.fields.zipWithIndex.map { case (f, i) =>
      GraftV2.valueConverter(requestedTypes(i), f.dataType, i)
    }

  override def next(): Boolean = {
    if (remaining <= 0) return false
    remaining -= 1
    val g = recordReader.read()
    val row = new GenericInternalRow(converters.length)
    var i = 0
    while (i < converters.length) {
      row.update(i, if (g.getFieldRepetitionCount(i) == 0) null else converters(i)(g))
      i += 1
    }
    current = row
    true
  }

  override def get(): InternalRow = current

  override def close(): Unit = reader.close()
}

object GraftV2 {

  def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("[GRAFT] v2 source requires a path"))
    p
  }

  /** The session's Hadoop conf wrapped for executor shipping — so a
    * store needing configured credentials (spark.hadoop.fs.s3a.* etc.)
    * works through this connector exactly as it does through
    * GraftCatalog. Falls back to a bare Configuration when no session
    * is active (driver-less unit use).
    */
  def sessionConf(): SerializableConfiguration =
    new SerializableConfiguration(
      SparkSession.getActiveSession.map(_.sessionState.newHadoopConf())
        .getOrElse(new Configuration()))

  /** Data files of a table path: the path itself when it is a single
    * parquet file, else every non-bookkeeping file under the directory
    * (recursive, `_SUCCESS`/dotfiles skipped), sorted for a
    * deterministic split order — the analog of the reference's
    * table-wide section enumeration
    * (ArgodbMapreduceInputFormat.java:104-147).
    */
  def dataFiles(path: String, conf: Configuration): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    if (st.isFile) Seq(path)
    else {
      val out = Seq.newBuilder[String]
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        val f = it.next()
        val n = f.getPath.getName
        if (!n.startsWith("_") && !n.startsWith(".") && f.getLen > 0)
          out += f.getPath.toString
      }
      out.result().sorted
    }
  }

  def withReader[T](path: String, conf: Configuration = new Configuration())(
      f: ParquetFileReader => T): T = {
    val r = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(path), conf),
      HadoopReadOptions.builder(conf).build())
    try f(r) finally r.close()
  }

  /** MessageType → StructType over the reference's primitive surface
    * (ArgodbSerdeUtils.java:71-102 enumerates the same types).
    * Directory tables take the schema of their first data file (one
    * writer, one schema — evolution goes through the engine path's
    * mergeSchema, not this connector).
    */
  def readSchema(path: String, conf: Configuration = new Configuration()): StructType = {
    val files = dataFiles(path, conf)
    require(files.nonEmpty, s"[GRAFT] no parquet data files under $path")
    StructType(withReader(files.head, conf)(_.getFooter.getFileMetaData.getSchema)
      .getFields.asScala.map(toField).toArray)
  }

  private def toField(t: Type): StructField = {
    if (!t.isPrimitive) {
      // the one nested shape this connector reads: a standard 3-level
      // parquet LIST of primitives (`optional group c (LIST) {
      // repeated group list { optional <prim> element } }`) — the
      // embeddings table's array<float> layout. Deeper nesting stays
      // unsupported (the engine path reads it via Spark's own reader).
      t.getLogicalTypeAnnotation match {
        case _: LogicalTypeAnnotation.ListLogicalTypeAnnotation =>
          val elem = t.asGroupType().getType(0).asGroupType().getType(0)
          require(elem.isPrimitive,
            s"[GRAFT] v2 connector supports lists of primitives only, got $t")
          return StructField(t.getName,
            ArrayType(primitiveDataType(elem.asPrimitiveType()), containsNull = true),
            nullable = true)
        case other => throw new IllegalArgumentException(
          s"[GRAFT] v2 connector supports primitive and LIST columns only, got $t ($other)")
      }
    }
    StructField(t.getName, primitiveDataType(t.asPrimitiveType()), nullable = true)
  }

  private def primitiveDataType(p: PrimitiveType): DataType = {
    val t: Type = p
    // DECIMAL can ride on INT32 (precision <= 9), INT64 (<= 18),
    // FIXED_LEN_BYTE_ARRAY or BINARY (two's-complement unscaled) —
    // the reference reads the same surface via its serde
    // (ArgodbSerdeUtils.java:71-102 lists DECIMAL alongside the
    // primitives; CHAR/VARCHAR arrive as STRING-annotated BINARY and
    // land in StringType below).
    p.getPrimitiveTypeName match {
      case BOOLEAN => BooleanType
      case INT32 => t.getLogicalTypeAnnotation match {
        case d: DecimalLogicalTypeAnnotation => DecimalType(d.getPrecision, d.getScale)
        case _: LogicalTypeAnnotation.DateLogicalTypeAnnotation => DateType
        case _ => IntegerType
      }
      case INT64 => t.getLogicalTypeAnnotation match {
        case d: DecimalLogicalTypeAnnotation => DecimalType(d.getPrecision, d.getScale)
        // isAdjustedToUTC=true marks an instant (UTC-normalized) →
        // session-TZ TimestampType; false is a wall-clock local
        // timestamp → TimestampNTZType. Mapping both to NTZ would be
        // silently offset by the session zone for UTC-adjusted files.
        // The reference's serde carries the one Hive TIMESTAMP surface
        // through the same distinction (ArgodbSerdeUtils.java:71-102).
        case ts: TimestampLogicalTypeAnnotation =>
          if (ts.isAdjustedToUTC) TimestampType else TimestampNTZType
        case _ => LongType
      }
      case FLOAT => FloatType
      case DOUBLE => DoubleType
      case FIXED_LEN_BYTE_ARRAY => t.getLogicalTypeAnnotation match {
        case d: DecimalLogicalTypeAnnotation => DecimalType(d.getPrecision, d.getScale)
        case other => throw new IllegalArgumentException(
          s"[GRAFT] Unsupported FIXED_LEN_BYTE_ARRAY annotation: $other")
      }
      case BINARY => t.getLogicalTypeAnnotation match {
        case _: LogicalTypeAnnotation.StringLogicalTypeAnnotation => StringType
        case d: DecimalLogicalTypeAnnotation => DecimalType(d.getPrecision, d.getScale)
        case _ => BinaryType
      }
      case other => throw new IllegalArgumentException(s"[GRAFT] Unsupported parquet type: $other")
    }
  }

  /** Per-field Group → Catalyst value converter. */
  def valueConverter(t: Type, dt: DataType, idx: Int): Group => Any = dt match {
    case ArrayType(et, _) =>
      // 3-level LIST: field idx holds the LIST group; its single
      // repeated child repeats once per element; each repetition holds
      // an optional primitive (absent repetition count 0 = null elem).
      val elemPrim = t.asGroupType().getType(0).asGroupType().getType(0).asPrimitiveType()
      val readElem = elementConverter(elemPrim, et)
      g => {
        val lst = g.getGroup(idx, 0)
        val n = lst.getFieldRepetitionCount(0)
        val out = new Array[Any](n)
        var i = 0
        while (i < n) {
          val entry = lst.getGroup(0, i)
          out(i) = if (entry.getFieldRepetitionCount(0) == 0) null else readElem(entry)
          i += 1
        }
        new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
      }
    case _ => scalarConverter(t.asPrimitiveType(), dt, idx)
  }

  /** Reader for one LIST element group (the primitive sits at field 0,
    * repetition 0 of each entry).
    */
  private def elementConverter(p: PrimitiveType, dt: DataType): Group => Any = dt match {
    case BooleanType => g => g.getBoolean(0, 0)
    case IntegerType | DateType => g => g.getInteger(0, 0)
    case LongType => g => g.getLong(0, 0)
    case FloatType => g => g.getFloat(0, 0)
    case DoubleType => g => g.getDouble(0, 0)
    case StringType => g => UTF8String.fromBytes(g.getBinary(0, 0).getBytes)
    case BinaryType => g => g.getBinary(0, 0).getBytes
    case other => throw new IllegalArgumentException(
      s"[GRAFT] Unsupported LIST element type: $other")
  }

  private def scalarConverter(p: PrimitiveType, dt: DataType, idx: Int): Group => Any = dt match {
    case BooleanType => g => g.getBoolean(idx, 0)
    case IntegerType | DateType => g => g.getInteger(idx, 0)
    case LongType => g => g.getLong(idx, 0)
    case FloatType => g => g.getFloat(idx, 0)
    case DoubleType => g => g.getDouble(idx, 0)
    case StringType => g => UTF8String.fromBytes(g.getBinary(idx, 0).getBytes)
    case BinaryType => g => g.getBinary(idx, 0).getBytes
    case d: DecimalType => p.getPrimitiveTypeName match {
      case INT32 => g => Decimal(g.getInteger(idx, 0).toLong, d.precision, d.scale)
      case INT64 => g => Decimal(g.getLong(idx, 0), d.precision, d.scale)
      // FLBA / BINARY: big-endian two's-complement unscaled value
      case _ => g => Decimal(new java.math.BigDecimal(
        new java.math.BigInteger(g.getBinary(idx, 0).getBytes), d.scale), d.precision, d.scale)
    }
    case TimestampNTZType | TimestampType =>
      val unit = p.getLogicalTypeAnnotation
        .asInstanceOf[TimestampLogicalTypeAnnotation].getUnit
      unit match {
        case TimeUnit.MILLIS => g => g.getLong(idx, 0) * 1000L
        case TimeUnit.MICROS => g => g.getLong(idx, 0)
        case TimeUnit.NANOS => g => Math.floorDiv(g.getLong(idx, 0), 1000L)
      }
    case other => throw new IllegalArgumentException(s"[GRAFT] Unsupported read type: $other")
  }

  /** Row-group elimination from footer statistics: skip when the
    * pushed filter provably matches nothing in [min, max]. Conservative
    * (unknown types/stats → keep).
    */
  def canSkipRowGroup(block: BlockMetaData, filters: Array[Filter]): Boolean =
    filters.exists(f => canSkip(block, f))

  private def canSkip(block: BlockMetaData, filter: Filter): Boolean = {
    def bounds(col: String): Option[(Any, Any)] =
      block.getColumns.asScala
        .find(_.getPath.toDotString == col)
        .flatMap { c =>
          val st = c.getStatistics
          if (st == null || !st.hasNonNullValue) None
          else c.getPrimitiveType.getLogicalTypeAnnotation match {
            // decimal stats are UNSCALED (int32/int64/binary two's
            // complement); comparing them raw against the filter's
            // scaled BigDecimal would mis-prune by 10^scale — rescale
            // here so cmp sees true values.
            case d: DecimalLogicalTypeAnnotation =>
              def scaled(v: Any): Any = v match {
                case n: java.lang.Integer => java.math.BigDecimal.valueOf(n.longValue, d.getScale)
                case n: java.lang.Long => java.math.BigDecimal.valueOf(n.longValue, d.getScale)
                case b: org.apache.parquet.io.api.Binary =>
                  new java.math.BigDecimal(new java.math.BigInteger(b.getBytes), d.getScale)
                case other => other
              }
              Some((scaled(st.genericGetMin), scaled(st.genericGetMax)))
            case _ => Some((st.genericGetMin, st.genericGetMax))
          }
        }
    // exact decimal comparison regardless of the stat/filter type mix:
    // a fractional filter value (l_quantity > 45.5) against integral
    // stats must NOT be truncated to 45 (a latent wrong prune), and
    // int64 stats above 2^53 must not round through double. BigDecimal
    // over the decimal string repr is exact for every JVM number type;
    // non-finite doubles (NaN/Inf) decline to compare (→ keep the
    // row group, pruning stays conservative).
    def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
      case (x: java.lang.Number, y: java.lang.Number) =>
        try Some(new java.math.BigDecimal(x.toString).compareTo(new java.math.BigDecimal(y.toString)))
        catch { case _: NumberFormatException => None }
      case (x: org.apache.parquet.io.api.Binary, y: String) =>
        Some(x.toStringUsingUTF8.compareTo(y))
      case _ => None
    }
    filter match {
      case EqualTo(c, v) => bounds(c).exists { case (mn, mx) =>
        cmp(mn, v).exists(_ > 0) || cmp(mx, v).exists(_ < 0) }
      case GreaterThan(c, v) => bounds(c).exists { case (_, mx) =>
        cmp(mx, v).exists(_ <= 0) }
      case GreaterThanOrEqual(c, v) => bounds(c).exists { case (_, mx) =>
        cmp(mx, v).exists(_ < 0) }
      case LessThan(c, v) => bounds(c).exists { case (mn, _) =>
        cmp(mn, v).exists(_ >= 0) }
      case LessThanOrEqual(c, v) => bounds(c).exists { case (mn, _) =>
        cmp(mn, v).exists(_ > 0) }
      // runtime row-group pruning: the In-set a dynamic filter carries
      // — skip when every value falls outside [min, max].
      case In(c, vs) => bounds(c).exists { case (mn, mx) =>
        vs.forall(v => cmp(mn, v).exists(_ > 0) || cmp(mx, v).exists(_ < 0)) }
      case _ => false
    }
  }
}
