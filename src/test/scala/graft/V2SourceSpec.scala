package graft

import graft.sources.v2.GraftV2
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThan, LessThan}

class V2SourceSpec extends SparkSpecBase {

  private def v2(name: String) =
    spark.read.format("graft").load(s"$sfDir/$name.parquet")

  test("v2 schema matches the native parquet reader") {
    val got = v2("orders").schema.map(f => f.name -> f.dataType).toMap
    val exp = spark.read.parquet(s"$sfDir/orders.parquet")
      .schema.map(f => f.name -> f.dataType).toMap
    assert(got === exp)
  }

  test("v2 full-scan values equal the native reader (orders)") {
    val got = v2("orders").orderBy("o_orderkey").collect().map(_.toString)
    val exp = spark.read.parquet(s"$sfDir/orders.parquet")
      .orderBy("o_orderkey").collect().map(_.toString)
    assert(got.length === exp.length)
    assert(got.toSeq === exp.toSeq)
  }

  test("v2 filtered projection equals the native reader (lineitem)") {
    def q(df: org.apache.spark.sql.DataFrame) = df
      .where(col("l_quantity") > 45 && col("l_returnflag") === "R")
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")
      .collect().map(_.toString)
    assert(q(v2("lineitem")).toSeq ===
      q(spark.read.parquet(s"$sfDir/lineitem.parquet")).toSeq)
  }

  test("v2 scan reports pushed filters and prunes columns") {
    val df = v2("orders").where(col("o_totalprice") > 100000.0).select("o_orderkey")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft parquet row-group scan"), plan.take(500))
    assert(plan.contains("pushed=[") && plan.contains("o_totalprice"), plan.take(800))
  }

  test("row-group stats elimination logic") {
    import org.apache.parquet.hadoop.metadata.BlockMetaData
    // use a real footer block from lineitem for plumbing, then check
    // decisions against its actual stats
    val path = s"$sfDir/lineitem.parquet"
    val block: BlockMetaData = GraftV2.withReader(path)(_.getFooter.getBlocks.get(0))
    // l_quantity spans [1, 50]: a filter > 100 eliminates the group
    assert(GraftV2.canSkipRowGroup(block, Array(GreaterThan("l_quantity", 100.0))))
    assert(!GraftV2.canSkipRowGroup(block, Array(GreaterThan("l_quantity", 10.0))))
    assert(GraftV2.canSkipRowGroup(block, Array(LessThan("l_quantity", 0.5))))
    assert(GraftV2.canSkipRowGroup(block, Array(EqualTo("l_returnflag", "Z"))))
    assert(!GraftV2.canSkipRowGroup(block, Array(EqualTo("l_returnflag", "R"))))
    // unknown column or unsupported filter → never skip
    assert(!GraftV2.canSkipRowGroup(block, Array(EqualTo("nope", 1))))
  }

  test("v2 timestamp columns round-trip (events, nanos)") {
    val got = v2("events").select("event_id", "ts").orderBy("event_id")
      .limit(5).collect().map(r => (r.getLong(0), r.get(1).toString))
    // native reader needs nanosAsLong (engine convention) — compare
    // against the converted eventsTable
    val exp = graft.streaming.Events.eventsTable(spark, sfDir)
      .select("event_id", "ts").orderBy("event_id")
      .limit(5).collect().map(r => (r.getLong(0), r.get(1).toString))
    // v2 yields TimestampNTZ (LocalDateTime), engine path yields
    // Timestamp in UTC — compare the wall-clock prefix
    got.zip(exp).foreach { case ((gi, gt), (ei, et)) =>
      assert(gi === ei)
      assert(gt.take(19).replace('T', ' ') === et.take(19))
    }
  }
}
