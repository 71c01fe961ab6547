package graft

import graft.sources.GraftSchemaPolicy
import graft.sources.GraftSchemaPolicy._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A36: schema-evolution policy — compatible changes pass the gate,
  * breaking ones are refused by name.
  */
class SchemaPolicySpec extends SparkSpecBase {

  private def st(fields: (String, DataType, Boolean)*): StructType =
    StructType(fields.map { case (n, t, nn) => StructField(n, t, nullable = nn) })

  test("diff classifies the standard lake contract") {
    val old = st(("id", LongType, false), ("v", IntegerType, true),
      ("p", DecimalType(10, 2), true), ("gone", StringType, true))
    val next = st(("id", LongType, true), ("v", LongType, true),
      ("p", DecimalType(18, 2), true), ("extra", StringType, true),
      ("required", LongType, false))
    val changes = GraftSchemaPolicy.diff(old, next)
    assert(changes.toSet === Set(
      AddedColumn("extra", nullable = true),
      AddedColumn("required", nullable = false),
      DroppedColumn("gone"),
      WidenedType("v", IntegerType, LongType),
      WidenedType("p", DecimalType(10, 2), DecimalType(18, 2)),
      RelaxedNullability("id")))
    // breaking: the non-nullable add, the drop, the null relaxation,
    // and BOTH type changes (parquet can't merge physical types)
    assert(changes.filter(_.breaking).map {
      case c: WidenedType => s"widened ${c.name}"
      case c => c.describe
    }.toSet === Set(
      "added NON-NULLABLE column 'required'", "dropped column 'gone'",
      "'id' may now contain nulls (was non-nullable)",
      "widened v", "widened p"))
    // the write direction: stricter incoming data is compatible
    assert(!GraftSchemaPolicy.diff(st(("x", LongType, true)),
      st(("x", LongType, false))).head.breaking)
    // retype and scale change are breaking
    assert(GraftSchemaPolicy.diff(st(("x", LongType, true)),
      st(("x", IntegerType, true))).head.breaking)
    assert(GraftSchemaPolicy.diff(st(("x", DecimalType(10, 2), true)),
      st(("x", DecimalType(18, 4), true))).head.breaking)
  }

  test("the append gate refuses breaking changes by name; compatible ones land") {
    import spark.implicits._
    val path = graft.sources.GraftSink.scratchDir + "/spec_schema_gate"
    Seq((1L, 10), (2L, 20)).toDF("id", "v")
      .write.mode("overwrite").parquet(path)
    // compatible: add a nullable note column (same v type)
    val ok = Seq((3L, 30, "x")).toDF("id", "v", "note")
    val changes = GraftSchemaPolicy.enforceAppend(spark, ok, path)
    assert(changes.exists { case AddedColumn("note", true) => true; case _ => false })
    val merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert(merged.count() === 3)
    assert(merged.where(col("note").isNull).count() === 2)
    // breaking: a widened v is refused (mergeSchema could never read it)
    val widened = Seq((9L, 90L, "w")).toDF("id", "v", "note")
    val ew = intercept[IllegalStateException] {
      GraftSchemaPolicy.enforceAppend(spark, widened, path)
    }
    assert(ew.getMessage.contains("widened 'v'"), ew.getMessage)
    // breaking: dropping v is refused, and the error says so
    val bad = Seq((4L, "y")).toDF("id", "note")
    val e = intercept[IllegalStateException] {
      GraftSchemaPolicy.enforceAppend(spark, bad, path)
    }
    assert(e.getMessage.contains("dropped column 'v'"), e.getMessage)
    assert(spark.read.option("mergeSchema", "true").parquet(path).count() === 3,
      "a refused append must not land")
    // the explicit override lands it (reader beware - that's the point)
    GraftSchemaPolicy.enforceAppend(spark, bad, path, allowBreaking = true)
    assert(spark.read.option("mergeSchema", "true").parquet(path).count() === 4)
  }
}
