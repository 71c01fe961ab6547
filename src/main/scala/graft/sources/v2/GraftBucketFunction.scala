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
    require(inputType.fields.length >= 2 && inputType.fields.length <= 5,
      s"[GRAFT] bucket takes (numBuckets INT, key BIGINT [, ...]), got " +
        s"${inputType.simpleString}")
    require(inputType.fields(0).dataType == IntegerType,
      s"[GRAFT] bucket's first argument is the INT bucket count, got " +
        inputType.fields(0).dataType.simpleString)
    inputType.fields.drop(1).foreach(f =>
      require(f.dataType == LongType,
        s"[GRAFT] bucket keys are BIGINT (the declared-layout " +
          s"restriction), got ${f.dataType.simpleString}"))
    new BucketLongs(inputType.fields.length - 1)
  }

  class BucketLongs(arity: Int) extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] =
      IntegerType +: Array.fill[DataType](arity)(LongType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String =
      s"graft.bucket(${Seq.fill(arity)("bigint").mkString(",")})"
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      val keys = (1 to arity).map(i =>
        if (input.isNullAt(i)) None else Some(input.getLong(i)))
      Integer.valueOf(GraftBucketFunction.bucketId(keys, n))
    }
  }

  /** The shared arithmetic: Spark's Murmur3 long hash at seed 42
    * folded across the key columns (what `hash(c1, c2, ...)` and a
    * multi-column HashPartitioning compute for BIGINTs), floor-mod'd
    * into [0, n). A null key leaves the running seed untouched,
    * exactly as Spark's hash(null) does.
    */
  def bucketId(keys: Seq[Option[Long]], n: Int): Int = {
    val h = keys.foldLeft(42) {
      case (seed, Some(v)) =>
        org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(v, seed)
      case (seed, None) => seed
    }
    val m = h % n
    if (m < 0) m + n else m
  }

  /** Single-key convenience (the pre-multi-column signature). */
  def bucketId(key: Option[Long], n: Int): Int = bucketId(Seq(key), n)
}
