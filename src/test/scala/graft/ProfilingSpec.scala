package graft

import graft.operators.Profiling
import org.apache.spark.sql.functions._

class ProfilingSpec extends SparkSpecBase {

  private def writeOrders(rows: Seq[(java.lang.Long, java.lang.Long, String, java.lang.Double, java.sql.Timestamp, String)]): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_prof").toString
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    tmp
  }

  test("skew profile flags a planted hot key with its exact salt factor") {
    import spark.implicits._
    // 9 keys × 10 rows + one key with 910 rows → top share 91%,
    // mean = 100, skew 9.1×, salt = ceil(910/100) = 10
    val lines = ((1L to 9L).flatMap(k => Seq.fill(10)(k)) ++ Seq.fill(910)(99L))
      .toDF("l_suppkey")
    val counts = lines.groupBy("l_suppkey")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("cnt"))
    // replay the single-row aggregate via the production code path by
    // writing a scratch lineitem table the operator can read
    val root = java.nio.file.Files.createTempDirectory("graft_skew").toString
    lines.write.parquet(s"$root/lineitem.parquet")
    val r = Profiling.skewProfile(spark, root).collect().head
    assert(r.getLong(0) === 10L && r.getLong(1) === 1000L)
    assert(r.getLong(2) === 99L && r.getLong(3) === 910L)
    assert(r.getLong(4) === 910000L, "top share = 91%")
    assert(r.getLong(5) === 100000000L, "mean = 100 rows/key")
    assert(r.getLong(6) === 9100000L, "hot key is 9.1x the mean")
    assert(r.getLong(7) === 10L, "salt factor levels the hot key")
    assert(counts.count() === 10L)
  }

  test("profile counts nulls and distincts per column in one pass") {
    val ts = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    val tmp = writeOrders(Seq(
      (1L, 10L, "F", Double.box(100.5), ts, "1-URGENT"),
      (2L, null, "O", Double.box(200.25), ts, "1-URGENT"),
      (3L, 10L, "F", null, ts, "2-HIGH")))
    val out = Profiling.profileOrders(spark, tmp).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("o_custkey").getLong(1) === 3L)   // n_rows
    assert(out("o_custkey").getLong(2) === 1L)   // n_nulls
    assert(out("o_custkey").getLong(3) === 1L)   // n_distinct (non-null)
    assert(out("o_totalprice").getLong(2) === 1L)
    assert(out("o_totalprice").getString(4) === "100.50") // decimal-formatted
    assert(out("o_totalprice").getString(5) === "200.25")
    assert(out("o_orderdate").getString(4) === "2024-03-01 00:00:00")
    assert(out("o_orderstatus").getLong(3) === 2L)
  }

  test("stratified sample applies the per-stratum rate deterministically") {
    val ts = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    // keys 0..999 cover the full hash range; per-status thresholds
    // 50/100/200 permille must select ~5%/10%/20%.
    val rows = (0L until 1000L).map { k =>
      val st = (k % 3) match { case 0 => "F"; case 1 => "O"; case _ => "P" }
      (Long.box(k), Long.box(k), st, Double.box(10.0), ts, "1-URGENT")
    }
    val tmp = writeOrders(rows)
    val out = Profiling.stratifiedSample(spark, tmp).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // each stratum has ~333 rows; achieved rate must sit near its target
    val (fTot, fSamp, fRate) = out("F")
    val (_, _, oRate) = out("O")
    val (_, _, pRate) = out("P")
    assert(fTot === 334L && fSamp >= 5L)
    assert(fRate < oRate && oRate < pRate,
      s"rates must order with thresholds: $fRate, $oRate, $pRate")
    // deterministic: a second run returns bit-identical accounting
    val again = Profiling.stratifiedSample(spark, tmp).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(again === out)
  }

  test("constraint report: clean corpus passes; planted violations are counted") {
    import org.apache.spark.sql.functions._
    val clean = Profiling.constraintReport(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(clean.size == 4 && clean.values.forall(_ == (0L, 1)),
      s"driver corpus must be clean: $clean")

    // corrupt a copy: 2 duplicate keys, 1 orphan custkey, 1 bad
    // status, 1 negative price — each breaks exactly one rule
    val root = graft.sources.GraftSink.scratchDir + "/constraint_bad"
    val cat = new graft.sources.GraftCatalog(spark, sfDir)
    val o = cat.table("orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val bad = o.limit(4).collect()
    val extra = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(bad(0).getLong(0), bad(0).getLong(1), "O", 10.0),
        org.apache.spark.sql.Row(bad(1).getLong(0), bad(1).getLong(1), "F", 10.0),
        org.apache.spark.sql.Row(777777770L, 999999999L, "O", 10.0),
        org.apache.spark.sql.Row(777777771L, bad(2).getLong(1), "X", 10.0),
        org.apache.spark.sql.Row(777777772L, bad(3).getLong(1), "P", -5.0)),
      o.schema)
    o.unionByName(extra).write.mode("overwrite").parquet(s"$root/orders.parquet")
    cat.table("customer").write.mode("overwrite").parquet(s"$root/customer.parquet")
    val dirty = Profiling.constraintReport(spark, root).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(dirty("orderkey_unique") == (2L, 0))
    assert(dirty("custkey_in_customer") == (1L, 0))
    assert(dirty("status_in_domain") == (1L, 0))
    assert(dirty("totalprice_positive") == (1L, 0))
  }

  test("equi-depth buckets hold near-equal row counts covering the table") {
    val rows = graft.operators.Analytic.qHistogramEquidepth(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 8)
    val counts = rows.map(_._2)
    assert(counts.max - counts.min <= 1, s"equi-depth: $counts")
    // bucket bounds are non-decreasing across buckets
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._4 <= b._3 || a._4 <= b._4, s"bounds must order: $a then $b")
      case _ =>
    }
  }

  test("scalable equi-depth buckets map-side: no single-partition window") {
    val df = graft.operators.Analytic.qHistogramEquidepthScalable(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition") && !plan.contains("Window"),
      "two-phase form must not funnel rows through one task:\n" + plan.take(1200))
    val rows = df.collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(rows.length == 8)
    val counts = rows.map(_._2)
    val n = counts.sum.toDouble
    // near-equal depths (boundary ties collapse into one bucket)
    assert(counts.forall(c => math.abs(c - n / 8) <= n / 80 + 2),
      s"depths should be within ~10% of n/8: ${counts.toSeq}")
  }

  test("B77: contingency scans documents once — every marginal derives from the cached cell grid") {
    val df = Profiling.contingency(spark, sfDir)
    val nodes = allPlanNodes(df.queryExecution.executedPlan)
    val scans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scans.isEmpty,
      "no direct file scan in the final plan: rs/cs/n must be exact sums over " +
        "the cached |sources|x|langs| cell grid, never a re-scan of documents")
    val ims = nodes.collect {
      case i: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => i }
    assert(ims.nonEmpty, "expected InMemoryTableScan of the cached cell grid")
    // marginal identity holds on the produced grid: sum of observed
    // counts per source equals that source's share of expected·N
    val rows = df.collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(2)).sum
    assert(total > 0L)
  }
}
