package graft.sources.v2

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

/** VECTORIZED read path for clean splits (the A9 scale fix): one
  * parquet row group decoded straight into Spark `ColumnarBatch`es by
  * Spark's own `VectorizedParquetRecordReader` — the same engine the
  * built-in parquet source runs — instead of row-at-a-time parquet-mr
  * `Group` assembly. At 100 TB the scan IS the job: batch decoding
  * plus the columnar→whole-stage-codegen boundary is a 3-5× CPU win
  * on every wide scan, which is why the reference's native engine
  * reads columnar as well (its RowSetsGroup sections,
  * ArgodbMapreduceRecordReader.java:74-219, decode column blocks).
  *
  * Scope: splits with no metadata-column projection (decided
  * scan-wide so Spark sees a uniform columnar answer — DSv2 refuses
  * mixed row/columnar partitions). BOTH mutation-mask families ride
  * the columnar path: A42 POSITION masks as per-batch row-id mapping
  * vectors (the Iceberg DV shape), A44/A45 EQUALITY masks as a
  * vectorized per-batch key probe against the driver-loaded
  * tombstone map — key columns the projection pruned are appended to
  * the read schema (the Iceberg equality-delete read shape) and
  * dropped by the output projection, and each row's canonical key
  * (Long / Long-micros / String / BigDecimal, bit-identical to
  * [[GraftMorMask.canonicalKeyGetter]]) probes under the Iceberg-v2
  * rule (masked iff the tombstone sequence outranks the file's).
  * Only key TYPES outside the canonical set (and metadata-column
  * projections) keep the row-based reader.
  *
  * Mechanics mirror Spark's `ParquetPartitionReaderFactory`: the
  * split addresses the row group's byte range (footer coordinates
  * shipped in the InputPartition), the requested CATALYST schema
  * rides the hadoop conf, partition values are appended by
  * `initBatch`, and evolved columns the file predates are null-filled
  * by the reader's own missing-column handling. Because `initBatch`
  * appends partition columns at the END, a projection that interleaves
  * them is served through a zero-copy column permutation.
  */
object GraftColumnarReader {

  /** Conf keys Spark's ParquetReadSupport reads (stable public key
    * strings; set explicitly — this connector cannot assume the
    * session copied its SQL conf into the Hadoop conf).
    */
  private val RequestedSchemaKey = "org.apache.spark.sql.parquet.row.requested_schema"
  private val ReadSupportClass =
    "org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport"

  /** The session SQL confs ParquetReadSupport consults, captured on
    * the DRIVER at factory build (this connector cannot assume the
    * executor-side Hadoop conf carries them): hardcoding defaults here
    * would silently diverge the columnar path from the row path in any
    * session that overrides one (e.g. this repo's own
    * `nanosAsLong=true` for the nanos testdata).
    */
  def sessionSqlKeys(): Map[String, String] = {
    val sqlConf = org.apache.spark.sql.internal.SQLConf.get
    Seq("spark.sql.parquet.binaryAsString" -> "false",
      "spark.sql.parquet.int96AsTimestamp" -> "true",
      "spark.sql.caseSensitive" -> "false",
      "spark.sql.parquet.inferTimestampNTZ.enabled" -> "true",
      "spark.sql.legacy.parquet.nanosAsLong" -> "false",
      "spark.sql.parquet.fieldId.read.enabled" -> "false",
      "spark.sql.session.timeZone" ->
        java.util.TimeZone.getDefault.getID).map { case (k, d) =>
      k -> sqlConf.getConfString(k, d)
    }.toMap
  }

  def apply(p: GraftInputPartition, required: StructType,
      hadoopConf: Configuration, sqlKeys: Map[String, String],
      capacity: Int,
      eqKeyCols: Seq[String] = Seq.empty,
      eqKeyTypes: Seq[DataType] = Seq.empty,
      eqSingle: Map[Any, Long] = Map.empty,
      eqMulti: Map[Seq[Any], Long] = Map.empty): PartitionReader[ColumnarBatch] = {
    val sessionTz = sqlKeys.getOrElse("spark.sql.session.timeZone",
      java.util.TimeZone.getDefault.getID)
    val eqActive = eqKeyCols.nonEmpty && (eqSingle.nonEmpty || eqMulti.nonEmpty)
    val partFields = required.fields.filter(f => p.partValues.contains(f.name))
    val dataFields = required.fields.filterNot(f => p.partValues.contains(f.name))
    // equality-mask key columns the projection pruned still must be
    // READ (the Iceberg equality-delete read shape): appended to the
    // requested schema, dropped by the output projection below. A key
    // column this file predates null-fills through the reader's own
    // missing-column handling — null keys never match (sidecar keys
    // are non-null by contract), mirroring the row path.
    val extraFields: Array[StructField] =
      if (!eqActive) Array.empty
      else eqKeyCols.zip(eqKeyTypes).collect {
        case (c, t) if !p.partValues.contains(c) &&
            !dataFields.exists(_.name == c) =>
          StructField(c, t, nullable = true)
      }.toArray
    val readFields = dataFields ++ extraFields
    val dataSchema = StructType(readFields)
    val c = new Configuration(hadoopConf)
    c.set(org.apache.parquet.hadoop.ParquetInputFormat.READ_SUPPORT_CLASS,
      ReadSupportClass)
    c.set(RequestedSchemaKey, dataSchema.json)
    sqlKeys.foreach { case (k, v) => c.set(k, v) }
    // the OLD-API split class: SpecificParquetRecordReaderBase casts to
    // mapred.FileSplit (which subclasses the mapreduce one)
    val split = new org.apache.hadoop.mapred.FileSplit(
      new Path(p.path), p.rgOffset, p.rgLength, Array.empty[String])
    val ctx = new TaskAttemptContextImpl(c,
      new TaskAttemptID(new TaskID(new JobID(), TaskType.MAP, 0), 0))
    // CORRECTED rebase = no calendar rewrite on read, exactly what the
    // row-based reader does; the testdata carries no pre-Gregorian
    // instants for either mode to disagree on
    val reader = new VectorizedParquetRecordReader(
      null, "CORRECTED", sessionTz, "CORRECTED", sessionTz, false, capacity)
    var initialized = false
    try {
      reader.initialize(split, ctx)
      initialized = true
    } finally if (!initialized) reader.close()
    val partRow: InternalRow = new GenericInternalRow(
      partFields.map(f => GraftV2.toCatalystConstant(
        p.partValues(f.name), f.dataType)).toArray[Any])
    reader.initBatch(StructType(partFields), partRow)
    reader.enableReturningBatches()
    // batch columns come out [dataFields..., extraFields..., partFields...];
    // the output projection permutes to the projection's declared order
    // and drops the mask-only extras (zero-copy — vectors are shared)
    val perm: Array[Int] = required.fields.map { f =>
      val di = dataFields.indexWhere(_.name == f.name)
      if (di >= 0) di
      else readFields.length + partFields.indexWhere(_.name == f.name)
    }
    val identity = extraFields.isEmpty &&
      perm.zipWithIndex.forall { case (v, i) => v == i }
    val raw: PartitionReader[ColumnarBatch] = new PartitionReader[ColumnarBatch] {
      override def next(): Boolean = reader.nextKeyValue()
      override def get(): ColumnarBatch =
        reader.getCurrentValue.asInstanceOf[ColumnarBatch]
      override def close(): Unit = reader.close()
    }
    val dvMasked =
      if (p.masked.isEmpty) raw
      else new DvMaskedReader(raw, p.masked, p.rowGroupStart)
    val eqMasked =
      if (!eqActive) dvMasked
      else {
        val getters: Array[(ColumnarBatch, Int) => Any] =
          eqKeyCols.toArray.zip(eqKeyTypes).map { case (c, t) =>
            if (p.partValues.contains(c)) {
              // partition-valued key: a per-split constant (Long or
              // String, exactly the row path's accepted shapes). A NULL
              // partition value (`__HIVE_DEFAULT_PARTITION__` dir) is a
              // never-matching key — sidecar keys are non-null by
              // contract — mirroring the missing-column rule, NOT an
              // executor-time failure of the whole query.
              val const: Any = p.partValues(c) match {
                case null => null
                case n: java.lang.Long => n
                case s: String => s
                case other => throw new IllegalStateException(
                  s"[GRAFT] equality-mask key '$c' rides an unsupported " +
                    s"partition value $other")
              }
              (_: ColumnarBatch, _: Int) => const
            } else {
              val di = dataFields.indexWhere(_.name == c)
              val ci = if (di >= 0) di
                else dataFields.length + extraFields.indexWhere(_.name == c)
              canonicalVectorGetter(t, ci, c)
            }
          }
        new EqMaskedReader(dvMasked, getters, eqSingle, eqMulti, p.fileSeq)
      }
    if (identity) eqMasked
    else new PartitionReader[ColumnarBatch] {
      override def next(): Boolean = eqMasked.next()
      override def get(): ColumnarBatch = {
        val b = eqMasked.get()
        val cols = new Array[ColumnVector](perm.length)
        var i = 0
        while (i < perm.length) { cols(i) = b.column(perm(i)); i += 1 }
        new ColumnarBatch(cols, b.numRows())
      }
      override def close(): Unit = eqMasked.close()
    }
  }

  /** Catalyst types whose equality-mask key canonicalizes losslessly
    * from a ColumnVector — the columnar twin of the parquet-side set
    * [[GraftMorMask.canonicalKeyGetter]] serves (integral/date →
    * Long, timestamps → Long micros, string, decimal). A scan whose
    * eq keys fall outside keeps the row-based reader.
    */
  def columnarEqKeyType(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType | StringType | _: DecimalType => true
    case _ => false
  }

  /** Canonical per-row key getter over batch column `ci` — the SAME
    * JVM representations the sidecar loader produced, so map probes
    * hit across physical encodings: the vectorized reader already
    * normalizes timestamps (any INT64 unit, legacy INT96) to catalyst
    * micros and dates to epoch days. Null key values return null and
    * never match.
    */
  private def canonicalVectorGetter(t: DataType, ci: Int,
      name: String): (ColumnarBatch, Int) => Any = {
    val get: (ColumnVector, Int) => Any = t match {
      case ByteType => (v, i) => java.lang.Long.valueOf(v.getByte(i).toLong)
      case ShortType => (v, i) => java.lang.Long.valueOf(v.getShort(i).toLong)
      case IntegerType | DateType =>
        (v, i) => java.lang.Long.valueOf(v.getInt(i).toLong)
      case LongType | TimestampType | TimestampNTZType =>
        (v, i) => java.lang.Long.valueOf(v.getLong(i))
      case d: DecimalType =>
        // stripTrailingZeros: the sidecar loader canonicalizes with the
        // FILE's own scale, this getter with the TABLE schema's — both
        // strip, so BigDecimal's scale-sensitive equals compares values
        (v, i) => v.getDecimal(i, d.precision, d.scale)
          .toJavaBigDecimal.stripTrailingZeros()
      case StringType => (v, i) => v.getUTF8String(i).toString
      case other => throw new IllegalStateException(
        s"[GRAFT] equality-mask key '$name' has an unservable columnar " +
          s"type ($other) - the scan gate should have kept the row path")
    }
    (b: ColumnarBatch, i: Int) => {
      val v = b.column(ci)
      if (v.isNullAt(i)) null else get(v, i)
    }
  }

  /** A44/A45 equality masks on the COLUMNAR path: each batch probes
    * its rows' canonical key tuples against the driver-loaded
    * tombstone map and drops outranked rows through the same row-id
    * mapping vectors the DV path uses (wrap, never copy). Masked iff
    * the key's max tombstone sequence outranks this file's sequence
    * (Iceberg-v2 rule; erases stamp Long.MaxValue = masked forever).
    * Single-key masks (the common case: one long GDPR key) probe the
    * flat map with zero per-row allocation.
    */
  private final class EqMaskedReader(delegate: PartitionReader[ColumnarBatch],
      getters: Array[(ColumnarBatch, Int) => Any],
      eqSingle: Map[Any, Long], eqMulti: Map[Seq[Any], Long], fileSeq: Long)
      extends PartitionReader[ColumnarBatch] {
    private var out: ColumnarBatch = _
    private val single = getters.length == 1 && eqSingle.nonEmpty
    private def masked(b: ColumnarBatch, i: Int): Boolean = {
      if (single) {
        val k = getters(0)(b, i)
        if (k == null) return false
        eqSingle.get(k) match {
          case Some(maxSeq) => fileSeq < maxSeq
          case None => false
        }
      } else {
        val key = new Array[Any](getters.length)
        var j = 0
        while (j < getters.length) { key(j) = getters(j)(b, i); j += 1 }
        eqMulti.get(key.toSeq) match {
          case Some(maxSeq) => fileSeq < maxSeq
          case None => false
        }
      }
    }
    override def next(): Boolean = {
      while (delegate.next()) {
        val b = delegate.get()
        val n = b.numRows()
        val kept = new Array[Int](n)
        var i = 0; var k = 0
        while (i < n) {
          if (!masked(b, i)) { kept(k) = i; k += 1 }
          i += 1
        }
        if (k == n) { out = b; return true } // untouched batch
        if (k > 0) {
          val map = java.util.Arrays.copyOf(kept, k)
          val cols = new Array[ColumnVector](b.numCols())
          var c = 0
          while (c < b.numCols()) {
            cols(c) = new MappedColumnVector(b.column(c), map); c += 1
          }
          out = new ColumnarBatch(cols, k)
          return true
        } // else: fully-masked batch, keep draining
      }
      false
    }
    override def get(): ColumnarBatch = out
    override def close(): Unit = delegate.close()
  }

  /** A42 deletion vectors on the COLUMNAR path: each batch covering
    * file rows [cur, cur+n) drops its masked positions through an
    * int row-id mapping — every column vector is WRAPPED, never
    * copied (the Iceberg ColumnVectorWithFilter shape), so a
    * position-deleted table keeps the vectorized reader instead of
    * paying the row-path tax until compaction. `masked` is sorted and
    * batches arrive in file order, so one advancing pointer suffices.
    */
  private final class DvMaskedReader(delegate: PartitionReader[ColumnarBatch],
      masked: Array[Long], rowGroupStart: Long)
      extends PartitionReader[ColumnarBatch] {
    private var cur = rowGroupStart
    private var maskPtr = 0
    private var out: ColumnarBatch = _
    override def next(): Boolean = {
      while (delegate.next()) {
        val b = delegate.get()
        val n = b.numRows()
        val lo = cur
        cur += n
        // advance to this batch's mask slice
        while (maskPtr < masked.length && masked(maskPtr) < lo) maskPtr += 1
        var mEnd = maskPtr
        while (mEnd < masked.length && masked(mEnd) < lo + n) mEnd += 1
        if (mEnd == maskPtr) { out = b; return true } // untouched batch
        val kept = new Array[Int](n - (mEnd - maskPtr))
        var i = 0; var k = 0; var m = maskPtr
        while (i < n) {
          if (m < mEnd && masked(m) == lo + i) m += 1
          else { kept(k) = i; k += 1 }
          i += 1
        }
        maskPtr = mEnd
        if (k > 0) {
          val cols = new Array[ColumnVector](b.numCols())
          var c = 0
          while (c < b.numCols()) {
            cols(c) = new MappedColumnVector(b.column(c), kept); c += 1
          }
          out = new ColumnarBatch(cols, k)
          return true
        } // else: fully-masked batch, keep draining
      }
      false
    }
    override def get(): ColumnarBatch = out
    override def close(): Unit = delegate.close()
  }

  /** Row-id-mapping view over a ColumnVector: getter i reads the
    * delegate at map(i). Wrapping is allocation-per-batch O(columns),
    * never a data copy; children of nested types share the same map.
    * close() is a no-op — the delegate belongs to the reader's reused
    * batch.
    */
  private final class MappedColumnVector(d: ColumnVector, map: Array[Int])
      extends ColumnVector(d.dataType()) {
    override def close(): Unit = ()
    override def hasNull: Boolean = d.hasNull
    override def numNulls(): Int = d.numNulls()
    override def isNullAt(i: Int): Boolean = d.isNullAt(map(i))
    override def getBoolean(i: Int): Boolean = d.getBoolean(map(i))
    override def getByte(i: Int): Byte = d.getByte(map(i))
    override def getShort(i: Int): Short = d.getShort(map(i))
    override def getInt(i: Int): Int = d.getInt(map(i))
    override def getLong(i: Int): Long = d.getLong(map(i))
    override def getFloat(i: Int): Float = d.getFloat(map(i))
    override def getDouble(i: Int): Double = d.getDouble(map(i))
    override def getArray(i: Int): org.apache.spark.sql.vectorized.ColumnarArray =
      d.getArray(map(i))
    override def getMap(i: Int): org.apache.spark.sql.vectorized.ColumnarMap =
      d.getMap(map(i))
    override def getDecimal(i: Int, precision: Int, scale: Int)
        : org.apache.spark.sql.types.Decimal =
      d.getDecimal(map(i), precision, scale)
    override def getUTF8String(i: Int): org.apache.spark.unsafe.types.UTF8String =
      d.getUTF8String(map(i))
    override def getBinary(i: Int): Array[Byte] = d.getBinary(map(i))
    override def getChild(ordinal: Int): ColumnVector =
      new MappedColumnVector(d.getChild(ordinal), map)
  }

  /** Concatenated columnar read of a bucket cell's slices — each
    * slice keeps its own masks/sequence exactly as an ungrouped split
    * would.
    */
  def bucket(b: GraftBucketPartition, required: StructType,
      hadoopConf: Configuration, sqlKeys: Map[String, String],
      capacity: Int,
      eqKeyCols: Seq[String] = Seq.empty,
      eqKeyTypes: Seq[DataType] = Seq.empty,
      eqSingle: Map[Any, Long] = Map.empty,
      eqMulti: Map[Seq[Any], Long] = Map.empty): PartitionReader[ColumnarBatch] =
    new PartitionReader[ColumnarBatch] {
      private var i = 0
      private var cur: PartitionReader[ColumnarBatch] = _
      override def next(): Boolean = {
        while (true) {
          if (cur != null && cur.next()) return true
          if (cur != null) { cur.close(); cur = null }
          if (i >= b.slices.length) return false
          cur = GraftColumnarReader(b.slices(i), required, hadoopConf,
            sqlKeys, capacity, eqKeyCols, eqKeyTypes, eqSingle, eqMulti)
          i += 1
        }
        false
      }
      override def get(): ColumnarBatch = cur.get()
      override def close(): Unit = if (cur != null) cur.close()
    }
}
