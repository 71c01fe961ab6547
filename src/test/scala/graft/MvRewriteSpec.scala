package graft

import graft.plans.GraftMv
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.BeforeAndAfterEach

/** B69: materialized-view auto-rewrite — the rule must re-point
  * matching aggregates at the MV, decline everything underivable,
  * and never change a result.
  */
class MvRewriteSpec extends SparkSpecBase with BeforeAndAfterEach {

  override def afterEach(): Unit = GraftMv.clear()

  private def base = s"$sfDir/lineitem.parquet"
  private val mvPath = graft.sources.GraftSink.scratchDir + "/spec_mv_lineitem"

  private def registerMv(): Unit =
    GraftMv.buildAndRegister(spark, GraftMv.MvDef(base, mvPath,
      groupCols = Seq("l_returnflag", "l_linestatus"),
      measures = Seq(
        "cnt" -> GraftMv.MvCount,
        "sum_qty" -> GraftMv.MvSum("l_quantity", Some(DecimalType(28, 6))),
        "mn_qty" -> GraftMv.MvMin("l_quantity"),
        "mx_qty" -> GraftMv.MvMax("l_quantity"),
        "cnt_tax" -> GraftMv.MvCountCol("l_tax"))))

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def readsMv(df: org.apache.spark.sql.DataFrame): Boolean = {
    val p = planOf(df)
    p.contains("spec_mv_lineitem") && !p.contains("lineitem.parquet")
  }

  test("rewrite fires on a filtered roll-up and the values are identical") {
    registerMv()
    def q = spark.read.parquet(base)
      .where(col("l_returnflag") =!= "N")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity").cast(DecimalType(28, 6))).cast("double"), 2).as("sq"),
        min(col("l_quantity")).as("mn"), max(col("l_quantity")).as("mx"),
        count(col("l_tax")).as("nt"))
      .orderBy("l_returnflag")
    val rewritten = q
    assert(readsMv(rewritten), planOf(rewritten).take(1200))
    val got = rewritten.collect().map(_.toString).toSeq
    GraftMv.clear()
    val exp = q.collect().map(_.toString).toSeq
    assert(got === exp)
  }

  test("global (ungrouped) aggregate rewrites too") {
    registerMv()
    def q = spark.read.parquet(base)
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity").cast(DecimalType(28, 6))).cast("double"), 2).as("sq"))
    val rewritten = q
    assert(readsMv(rewritten), planOf(rewritten).take(1200))
    val got = rewritten.collect().head
    GraftMv.clear()
    assert(got.toString === q.collect().head.toString)
  }

  test("exact MV-grain grouping rewrites (both group columns)") {
    registerMv()
    def q = spark.read.parquet(base)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), max(col("l_quantity")).as("mx"))
      .orderBy("l_returnflag", "l_linestatus")
    assert(readsMv(q), planOf(q).take(1200))
    val got = q.collect().map(_.toString).toSeq
    GraftMv.clear()
    assert(got === q.collect().map(_.toString).toSeq)
  }

  test("underivable shapes decline and read the base table") {
    registerMv()
    val b = spark.read.parquet(base)
    // sum of a column that is not a registered measure
    assert(!readsMv(b.groupBy("l_returnflag").agg(sum(col("l_discount")).as("s"))))
    // raw double sum when the MV stored the DECIMAL-cast sum
    assert(!readsMv(b.groupBy("l_returnflag").agg(sum(col("l_quantity")).as("s"))))
    // COUNT(DISTINCT) is not derivable from a rollup
    assert(!readsMv(b.groupBy("l_returnflag").agg(countDistinct(col("l_partkey")).as("d"))))
    // avg has no registered derivation
    assert(!readsMv(b.groupBy("l_returnflag").agg(avg(col("l_quantity")).as("a"))))
    // filter on a NON-grouping column
    assert(!readsMv(b.where(col("l_quantity") > 10)
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))))
    // grouping by a non-MV column
    assert(!readsMv(b.groupBy("l_shipdate").agg(count(lit(1)).as("n"))))
    // an unregistered table is untouched
    assert(!readsMv(spark.read.parquet(s"$sfDir/orders.parquet")
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))))
  }

  test("non-deterministic or subquery filters decline the rewrite") {
    registerMv()
    // rand() references no columns at all, so a reference-only guard
    // would wrongly accept it — but it evaluates per ROW, and per MV
    // group row it would change results; must read the base
    val nd = spark.read.parquet(base)
      .where(rand(42) < 0.5)
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    assert(!readsMv(nd), planOf(nd).take(800))
    // deterministic grouping-column filter still rewrites (control)
    val det = spark.read.parquet(base)
      .where(col("l_returnflag") =!= "zz")
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    assert(readsMv(det), planOf(det).take(800))
  }

  test("a maintenance swap of the MV files serves through the existing registration") {
    val root = graft.sources.GraftSink.scratchDir + "/spec_mv_swap"
    val rp = new org.apache.hadoop.fs.Path(root)
    rp.getFileSystem(spark.sessionState.newHadoopConf()).delete(rp, true)
    val tbl = s"$root/lineitem.parquet"
    val li = spark.read.parquet(base)
    li.where(col("l_linenumber") <= 2).write.mode("overwrite").parquet(tbl)
    val d = GraftMv.MvDef(tbl, graft.sources.GraftSink.scratchDir + "/spec_mv_swap_mv",
      groupCols = Seq("l_returnflag"),
      measures = Seq("cnt" -> GraftMv.MvCount))
    GraftMv.buildAndRegister(spark, d)
    def q = spark.read.parquet(tbl).groupBy("l_returnflag")
      .agg(count(lit(1)).as("n")).orderBy("l_returnflag")
    val before = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // base grows; maintenance REBUILDS the MV in place (delete+rewrite
    // of the MV files) WITHOUT re-registering — the registration must
    // not pin the old file listing
    li.where(col("l_linenumber") > 2).write.mode("append").parquet(tbl)
    GraftMv.refresh(spark, d) // rewrite-suppressed rebuild + swap
    val rewritten = q
    assert(planOf(rewritten).contains("spec_mv_swap_mv"),
      "rewrite must still fire after the swap:\n" + planOf(rewritten).take(800))
    val got = rewritten.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    GraftMv.clear()
    val exp = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === exp, "swapped MV must serve the CURRENT rollup")
    assert(got.values.sum > before.values.sum, "the append must be visible")
  }

  test("MV maintained from the snapshot diff keeps the rewrite exact across an append") {
    val root = graft.sources.GraftSink.scratchDir + "/spec_mv_inc"
    val rp = new org.apache.hadoop.fs.Path(root)
    rp.getFileSystem(spark.sessionState.newHadoopConf()).delete(rp, true)
    val tbl = s"$root/lineitem.parquet"
    val li = spark.read.parquet(base)
    li.where(col("l_linenumber") <= 2).write.mode("overwrite").parquet(tbl)
    val catOld = new graft.sources.GraftCatalog(spark, root)
    catOld.table("lineitem").count() // pin epoch 1
    val d = GraftMv.MvDef(tbl, graft.sources.GraftSink.scratchDir + "/spec_mv_inc_mv",
      groupCols = Seq("l_returnflag", "l_linestatus"),
      measures = Seq(
        "cnt" -> GraftMv.MvCount,
        "sum_qty" -> GraftMv.MvSum("l_quantity", Some(DecimalType(28, 6))),
        "mn_qty" -> GraftMv.MvMin("l_quantity"),
        "mx_qty" -> GraftMv.MvMax("l_quantity")))
    val mv1 = GraftMv.mvFrame(spark, d).localCheckpoint(true)
    // epoch 2 lands; refresh the MV from the DIFF only (A20 shape)
    li.where(col("l_linenumber") > 2).write.mode("append").parquet(tbl)
    val diff = new graft.sources.GraftCatalog(spark, root).diffTable("lineitem", catOld)
    val merged = GraftMv.mergeRollups(mv1, GraftMv.mvFrameOf(diff, d), d)
    // incremental refresh ≡ full rebuild, value-exact
    val rebuilt = GraftMv.mvFrame(spark, d)
    val key = Seq("l_returnflag", "l_linestatus")
    assert(merged.orderBy(key.map(col): _*).collect().map(_.toString).toSeq ===
      rebuilt.orderBy(key.map(col): _*).collect().map(_.toString).toSeq)
    // and the registered merged MV serves the rewrite exactly
    merged.write.mode("overwrite").parquet(d.mvPath)
    GraftMv.register(spark, d)
    def q = spark.read.parquet(tbl).groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity").cast(DecimalType(28, 6))).cast("double"), 2).as("sq"))
      .orderBy("l_returnflag")
    val rewritten = q
    assert(planOf(rewritten).contains("spec_mv_inc_mv"), planOf(rewritten).take(1000))
    val got = rewritten.collect().map(_.toString).toSeq
    GraftMv.clear()
    assert(got === q.collect().map(_.toString).toSeq)
  }

  test("a COW merge's change feed maintains the rollup exactly (applyFeed ≡ rebuild)") {
    val root = graft.sources.GraftSink.scratchDir + "/spec_mv_feed"
    val rp = new org.apache.hadoop.fs.Path(root)
    rp.getFileSystem(spark.sessionState.newHadoopConf()).delete(rp, true)
    val tbl = s"$root/orders.parquet"
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(tbl)
    val d = GraftMv.MvDef(tbl, s"$root/mv",
      groupCols = Seq("o_orderstatus"),
      measures = Seq(
        "cnt" -> GraftMv.MvCount,
        "sum_price" -> GraftMv.MvSum("o_totalprice", Some(DecimalType(28, 6))),
        "cnt_cust" -> GraftMv.MvCountCol("o_custkey")))
    val mv1 = GraftMv.mvFrame(spark, d).localCheckpoint(true)
    // the A18 mutation: bumps inside 'F', cross-group moves O→F, inserts
    val updates = orders
      .where(col("o_orderstatus") === "F" && col("o_orderkey") % 100 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0))
      .unionByName(orders
        .where(col("o_orderstatus") === "O" && col("o_orderkey") % 100 === 50)
        .withColumn("o_orderstatus", lit("F")))
    val feed = graft.sources.GraftSink.mergeUpsertCdf(
      spark, tbl, updates, Seq("o_orderkey"), "o_orderstatus")
    val maintained = GraftMv.applyFeed(mv1, feed, d).localCheckpoint(true)
    val rebuilt = GraftMv.mvFrame(spark, d)
    assert(maintained.orderBy("o_orderstatus").collect().map(_.toString).toSeq ===
      rebuilt.orderBy("o_orderstatus").collect().map(_.toString).toSeq)
    // a feed that drains a whole group drops its row, like a rebuild
    val drainP = spark.read.parquet(tbl)
      .where(col("o_orderstatus") === "P")
      .withColumn("o_orderstatus", lit("F"))
    val feed2 = graft.sources.GraftSink.mergeUpsertCdf(
      spark, tbl, drainP, Seq("o_orderkey"), "o_orderstatus")
    val maintained2 = GraftMv.applyFeed(maintained, feed2, d)
    assert(maintained2.where(col("o_orderstatus") === "P").count() === 0)
    assert(maintained2.orderBy("o_orderstatus").collect().map(_.toString).toSeq ===
      GraftMv.mvFrame(spark, d).orderBy("o_orderstatus").collect().map(_.toString).toSeq)
    // non-additive measures and missing liveness witness refuse
    intercept[IllegalArgumentException] {
      GraftMv.applyFeed(mv1, feed, d.copy(measures =
        d.measures :+ ("mx" -> GraftMv.MvMax("o_totalprice"))))
    }
    intercept[IllegalArgumentException] {
      GraftMv.applyFeed(mv1, feed, d.copy(measures =
        d.measures.filterNot(_._2 == GraftMv.MvCount)))
    }
  }

  test("two rewrites in one query get fresh exprIds (no conflict)") {
    registerMv()
    def q = {
      val b = spark.read.parquet(base)
      b.groupBy("l_returnflag").agg(count(lit(1)).as("n_flag"))
        .crossJoin(b.groupBy("l_linestatus").agg(count(lit(1)).as("n_status")))
        .orderBy("l_returnflag", "l_linestatus")
    }
    val joined = q
    assert(readsMv(joined), planOf(joined).take(1500))
    val got = joined.collect().map(_.toString).toSeq
    GraftMv.clear()
    assert(got === q.collect().map(_.toString).toSeq)
  }
}
