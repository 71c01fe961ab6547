package graft.sources.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructType}

/** A65: the engine's V2 `bucket` function — the hash both the write
  * side (batch shaping) and the read side (reported partitioning)
  * agree on, and the object Spark's storage-partitioned-join machinery
  * resolves when it sees `bucket(n, col)` in a scan's reported
  * `KeyGroupedPartitioning` (V2ExpressionUtils loads it from the
  * table's catalog as a FunctionCatalog, the Iceberg pattern).
  *
  * bucket(n, k) = pmod(murmur3_32(k, seed=42), n) — EXACTLY Spark's
  * own `hash()`/HashPartitioning arithmetic on a BIGINT, so the value
  * the shaped insert computes with `pmod(hash(k), n)` and the value
  * this function produces for the planner are one number. NULL keys
  * hash like Spark's hash(null): the seed rides through unchanged.
  * The function is pure integer arithmetic and bucket ids are stable
  * forever; cross-table joins co-locate exactly when both tables
  * declared the same bucket count.
  */
object GraftBucketFunction extends UnboundFunction {

  override def name(): String = "bucket"

  override def description(): String =
    "bucket(numBuckets INT, key BIGINT) -> INT: " +
      "pmod(murmur3_32(key, seed=42), numBuckets), the graft declared-" +
      "layout bucket id (matches Spark hash()/HashPartitioning on BIGINT)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"[GRAFT] bucket takes (numBuckets INT, key BIGINT), got " +
        s"${inputType.simpleString}")
    require(inputType.fields(0).dataType == IntegerType,
      s"[GRAFT] bucket's first argument is the INT bucket count, got " +
        inputType.fields(0).dataType.simpleString)
    require(inputType.fields(1).dataType == LongType,
      s"[GRAFT] bucket keys are BIGINT (the declared-layout restriction), " +
        s"got ${inputType.fields(1).dataType.simpleString}")
    BucketLong
  }

  object BucketLong extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, LongType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket(bigint)"
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      Integer.valueOf(GraftBucketFunction.bucketId(
        if (input.isNullAt(1)) None else Some(input.getLong(1)), n))
    }
  }

  /** The shared arithmetic: Spark's Murmur3 long hash at seed 42
    * (what `hash()` and HashPartitioning compute for a BIGINT),
    * floor-mod'd into [0, n). A null key leaves the seed untouched,
    * exactly as Spark's hash(null) does.
    */
  def bucketId(key: Option[Long], n: Int): Int = {
    val h = key match {
      case Some(v) =>
        org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(v, 42)
      case None => 42
    }
    val m = h % n
    if (m < 0) m + n else m
  }
}
