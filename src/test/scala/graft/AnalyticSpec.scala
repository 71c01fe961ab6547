package graft

import graft.operators.{Analytic, Relational}
import org.apache.spark.sql.functions._

class AnalyticSpec extends SparkSpecBase {

  test("bucketed join plans without a shuffle exchange on the join keys") {
    val df = Relational.srcBucketedJoin(spark, sfDir)
    // the join itself must not re-shuffle bucketed inputs; the final
    // groupBy(c_mktsegment) exchange is expected — so check the join
    // subtree only.
    val plan = df.queryExecution.executedPlan.toString
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, plan.take(400))
    val joinSubtree = plan.substring(joinIdx)
    assert(!joinSubtree.contains("Exchange hashpartitioning(o_custkey"),
      joinSubtree.take(600))
  }

  test("partitioned sink read-back prunes partitions in the scan") {
    Relational.srcPartitionedSink(spark, sfDir).collect() // writes + reads
    import graft.sources.GraftSink
    val plan = GraftSink.readPartitioned(spark, "orders_by_priority")
      .where(col("o_orderpriority") === "1-URGENT")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderpriority"), plan.take(800))
  }

  test("graft SQL functions are registered through extensions") {
    val r = spark.sql(
      "SELECT round(graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)), 6) AS c, " +
        "graft_simhash(array(1L, 1L, 1L)) AS s, " +
        "size(graft_minhash(array(7L), 16)) AS m, " +
        "size(graft_shingle_hashes(array('a','b','c'), 2)) AS g, " +
        "graft_span_hashes(array('a','b','c','d','e'), 4) AS sp").collect()(0)
    assert(r.getDouble(0) === 1.0)
    assert(r.getLong(1) === 1L) // all tokens identical → their bits win
    assert(r.getInt(2) === 16)
    assert(r.getInt(3) === 2)
    // 5 words, k=4 → 2 spans; values match the mod-P polynomial:
    // wh('a')=97 etc., span = fold((acc*1000003 + wh) % 1000000007)
    val spans = r.getSeq[Long](4)
    assert(spans.length === 2)
    val P = 1000000007L; val B = 1000003L
    def fold(ws: Seq[Long]) = ws.reduceLeft((a, x) => (a * B + x) % P)
    assert(spans === Seq(fold(Seq(97L, 98L, 99L, 100L)), fold(Seq(98L, 99L, 100L, 101L))))
  }

  test("non-integer lane count in graft SQL functions is a clear error") {
    // BIGINT literal widths are accepted
    assert(spark.sql("SELECT size(graft_minhash(array(7L), 8L)) AS m")
      .collect()(0).getInt(0) === 8)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash(array(7L), 'sixteen')").collect()
    }
    assert(e.getMessage.contains("[GRAFT]"), e.getMessage)
  }

  test("salted join equals the plain join") {
    val salted = Analytic.qSaltedJoinRevenue(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val plain = {
      val c = new graft.sources.GraftCatalog(spark, sfDir)
      c.table("lineitem").join(c.table("orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(28,6)")).cast("double"), 2).as("revenue"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    }
    assert(salted === plain)
  }

  test("as-of join picks the latest order at or before the event") {
    import spark.implicits._
    val out = Analytic.qAsofEventOrder(spark, sfDir)
    val sample = out.limit(5).collect()
    assert(sample.nonEmpty)
    // every matched order date must be <= some event ts for that user
    val withTs = graft.streaming.Events.eventsTable(spark, sfDir)
      .select(col("event_id"), col("ts"))
    val joined = out.join(withTs, "event_id")
      .where(to_date(col("order_date")) > col("ts"))
    assert(joined.count() === 0)
  }

  test("cube emits every grouping combination") {
    val rows = Analytic.qCubeStatusPriority(spark, sfDir).collect()
    val combos = rows.map(r => (r.getString(0) == "ALL", r.getString(1) == "ALL")).toSet
    assert(combos === Set((false, false), (false, true), (true, false), (true, true)))
    val grand = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(grand.length === 1 && grand(0).getLong(2) === 1500L)
  }

  test("partitioned sink writes null partition values as the Hive sentinel") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, Some("A")), (2L, None), (3L, Some("B")))
      .toDF("id", "part")
    val path = graft.sources.GraftSink.writePartitioned(df, "sentinel_rt", Seq("part"))
    // the directory name carries the reference's null sentinel
    val dirs = new java.io.File(path).listFiles().map(_.getName).filter(_.startsWith("part="))
    assert(dirs.contains(s"part=${graft.sources.GraftCatalog.DefaultPartitionName}"), dirs.toSeq)
    // read-back restores null, and the catalog's sentinel filter selects it
    val back = graft.sources.GraftSink.readPartitioned(spark, "sentinel_rt")
    assert(back.where(col("part").isNull).collect().map(_.getLong(0)).toSeq === Seq(2L))
    val viaFilter = back.where(graft.sources.GraftCatalog.compileFilter(
      s"part=${graft.sources.GraftCatalog.DefaultPartitionName}", back.schema))
    assert(viaFilter.collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("rolling 90-day revenue matches a hand fold for one customer") {
    val rows = Analytic.qRollingRevenue(spark, sfDir).collect()
    val custkey = rows.head.getLong(1)
    val mine = rows.filter(_.getLong(1) == custkey)
      .map(r => (java.time.LocalDate.parse(r.getString(2)), r.getDouble(3), r.getLong(4)))
    // hand fold: for each order, sum orders of the same customer
    // within [date-90d, date]
    mine.foreach { case (d, total, n) =>
      val inWin = mine.filter { case (d2, _, _) =>
        !d2.isAfter(d) && !d2.isBefore(d.minusDays(90))
      }
      assert(n === inWin.length.toLong, s"$custkey @ $d")
    }
    // frames with more orders accumulate at least the single-order sum
    assert(mine.forall(_._2 > 0))
  }

  test("bloom semi join: prefilter prunes map-side, never the answer") {
    val dir = "/root/testdata/sf0.01"
    val cat = new graft.sources.GraftCatalog(spark, dir)
    val li = cat.table("lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    val orders = cat.table("orders")
      .where(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
             col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderpriority")
    val pre = graft.operators.Analytic.bloomPrefilter(
      li, "l_orderkey", orders, "o_orderkey", 1000000L)
    // the sketch admits every true match (no false negatives) and, at
    // fpp<<1, drops most non-matches before the join shuffle
    val total = li.count()
    val trueMatches = li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .count()
    val kept = pre.count()
    val preJoined = pre.join(orders, col("l_orderkey") === col("o_orderkey")).count()
    assert(preJoined === trueMatches, "bloom must not lose true matches")
    assert(kept < total / 2, s"prefilter should prune (kept $kept of $total)")
    // the probe sits in the fact scan stage, before any exchange
    val plan = pre.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(400))
    // end to end: identical to the plain join aggregate
    val bloom = graft.operators.Analytic.qBloomSemiJoin(spark, dir).collect()
    val plain = li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority").collect()
    assert(bloom.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      plain.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("nation pagerank: exact driver replay of the integer power iteration") {
    import org.apache.spark.sql.functions._
    val out = Analytic.qNationPagerank(spark, sfDir).collect()
    assert(out.length === 25)
    assert(out.map(_.getLong(0)).toSeq === (1L to 25L))
    // mass is bounded above by 1 (floors only lose); the weak
    // formulation DROPS dangling mass, and at tiny SF most nations
    // have no suppliers, so the loss can be large — exactness, not
    // conservation, is the contract (the replay below)
    val mass = out.map(_.getLong(2)).sum
    assert(mass <= 1000000L && mass > 0L, s"mass out of bounds: $mass")
    // replay the recurrence on the driver from the same edge counts
    val c = new graft.sources.GraftCatalog(spark, sfDir)
    val e = c.table("lineitem")
      .join(c.table("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(c.table("customer"), col("o_custkey") === col("c_custkey"))
      .join(c.table("supplier"), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey").as("u"), col("c_nationkey").as("v"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue, r.getLong(2)))
    val outU = e.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val frac = e.map { case (u, v, n) => (u, v, n * 1000000L / outU(u)) }
    val nations = c.table("nation").select("n_nationkey", "n_name").collect()
      .map(r => r.getAs[Number](0).longValue -> r.getString(1)).toMap
    val nn = nations.size
    var r = nations.keys.map(_ -> 1000000L / nn).toMap
    for (_ <- 1 to Analytic.PrIters) {
      val inc = frac.groupBy(_._2).view.mapValues(
        _.map { case (u, _, f) => 850L * r(u) * f / 1000000000L }.sum).toMap
      r = nations.keys.map(k => k -> (150000L / nn + inc.getOrElse(k, 0L))).toMap
    }
    val expect = nations.toSeq.map { case (k, name) => (name, r(k)) }
      .sortBy { case (name, score) => (-score, name) }
    assert(out.map(r0 => (r0.getString(1), r0.getLong(2))).toSeq === expect,
      "engine pagerank must equal the driver replay exactly")
  }

  test("pagerank final ranking carries no window operator at all") {
    // the web-domain pitch has N = 10^8 nodes: the dense rank must be
    // GlobalOrder's range-partition + zipWithIndex, never a
    // SinglePartition `Window.orderBy`
    val plan = Analytic.qNationPagerank(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "ranking must not plan a window:\n" + plan.take(1200))
  }

  test("B75: gap-fill scans orders once — bounds, spine and join all read the cached daily grain") {
    val df = Analytic.qGapFill(spark, sfDir)
    val nodes = allPlanNodes(df.queryExecution.executedPlan)
    val scans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scans.isEmpty,
      "no direct file scan in the final plan: the span bounds and day spine " +
        "must derive from the cached (group, day) aggregate, not re-scan orders")
    val ims = nodes.collect {
      case i: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => i }
    assert(ims.nonEmpty, "expected InMemoryTableScan of the cached daily grain")
    assert(df.count() > 0L)
  }
}
