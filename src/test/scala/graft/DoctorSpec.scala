package graft

import graft.plans.GraftDoctor
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** B73: plan lint — each scale-killer pattern is caught, each
  * legitimate look-alike is excused.
  */
class DoctorSpec extends SparkSpecBase {

  private def rules(df: org.apache.spark.sql.DataFrame): Set[String] =
    GraftDoctor.lint(df).map(_.rule).toSet

  private def orders = spark.read.parquet(s"$sfDir/orders.parquet")
  private def nation = spark.read.parquet(s"$sfDir/nation.parquet")

  test("a keyless pair product is flagged") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val r = rules(orders.crossJoin(spark.read.parquet(s"$sfDir/customer.parquet")))
      assert(r.intersect(Set("cartesian-product", "nested-loop-join")).nonEmpty, r)
    } finally spark.conf.set(key, prev)
  }

  test("the deliberate single-row broadcast crossJoin is excused") {
    val total = orders.agg(count(lit(1)).as("total"))
    val df = orders.crossJoin(broadcast(total))
      .select(col("o_orderkey"), col("total"))
    assert(rules(df).isEmpty, GraftDoctor.lint(df).toString)
  }

  test("an unpartitioned window is flagged; a partitioned one is not") {
    val bad = orders.withColumn("rn",
      row_number().over(Window.orderBy(col("o_totalprice"))))
    assert(rules(bad).contains("single-partition-window"), rules(bad).toString)
    val good = orders.withColumn("rn", row_number().over(
      Window.partitionBy("o_orderstatus").orderBy(col("o_totalprice"))))
    assert(!rules(good).contains("single-partition-window"))
  }

  test("global aggregates and sort-limit plans stay clean") {
    assert(rules(orders.agg(count(lit(1)).as("n"))).isEmpty)
    assert(rules(orders.orderBy(col("o_totalprice").desc).limit(5)).isEmpty)
    val o = orders
    val n = nation
    val star = o
      .join(broadcast(n), o("o_custkey") % 25 === n("n_nationkey"))
      .groupBy("n_name").agg(count(lit(1)).as("n"))
    assert(!rules(star).contains("single-partition-window"))
  }

  test("a ScalaUDF is flagged; the codegen'd equivalent is not") {
    val plusOne = udf((x: Long) => x + 1)
    val bad = orders.select(plusOne(col("o_orderkey")).as("k"))
    assert(rules(bad).contains("interpreted-udf"), rules(bad).toString)
    val good = orders.select((col("o_orderkey") + 1).as("k"))
    assert(rules(good).isEmpty)
  }

  test("the engine's own flagship plans lint clean") {
    assert(rules(graft.operators.Relational.q5LocalSupplierVolume(spark, sfDir)).isEmpty)
    assert(rules(graft.operators.Relational.q1PricingSummary(spark, sfDir)).isEmpty)
  }

  test("a per-row sort over a large literal array is flagged; small literals are not") {
    import org.apache.spark.sql.functions._
    // the pre-fix HNSW shard-assignment shape: sort a shipped literal
    // table per row to take its top entries
    val big = typedlit((0 until 512).map(i => (i.toLong, i * 0.5)))
    val bad = orders.select(
      slice(array_sort(transform(big, c =>
        struct((c.getField("_2") + col("o_totalprice")).as("s"),
          c.getField("_1").as("id")))), 1, 5).as("top"))
    assert(rules(bad).contains("per-row-literal-sort"), rules(bad).toString)
    // a bounded literal (centroid-table scale) is the accepted pattern
    val small = typedlit((0 until 16).map(i => (i.toLong, i * 0.5)))
    val fine = orders.select(
      slice(array_sort(transform(small, c =>
        struct((c.getField("_2") + col("o_totalprice")).as("s"),
          c.getField("_1").as("id")))), 1, 5).as("top"))
    assert(!rules(fine).contains("per-row-literal-sort"), rules(fine).toString)
  }

  test("tokenizing the same source above two file scans is flagged; the cached grain is excused") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // the H5/F7 pre-fix shape: an uncached tokenize grain feeding two
    // consumers — the plan re-reads and re-tokenizes per consumer
    def toks = docs.select(col("doc_id"), col("source"),
      size(split(col("text"), "\\s+")).cast("long").as("tokens"))
    val bad = toks.join(
      broadcast(toks.groupBy("source").agg(sum("tokens").as("t"))), Seq("source"))
    assert(rules(bad).contains("repeated-uncached-subtree"), rules(bad).toString)
    // cache the grain → both consumers read the InMemoryTableScan
    val cached = toks.cache()
    try {
      val good = cached.join(
        broadcast(cached.groupBy("source").agg(sum("tokens").as("t"))), Seq("source"))
      assert(!rules(good).contains("repeated-uncached-subtree"), rules(good).toString)
    } finally cached.unpersist()
    // two scans WITHOUT tokenize-class work above them (a plain
    // self-join of cheap projections) are not this bug class
    val plain = orders.select("o_orderkey", "o_custkey")
      .join(broadcast(orders.groupBy("o_custkey").agg(count(lit(1)).as("n"))),
        Seq("o_custkey"))
    assert(!rules(plain).contains("repeated-uncached-subtree"), rules(plain).toString)
  }

  test("unmasked-mor-scan: a raw read of a mutated MOR table flags; morRead/catalog plans are excused; compaction clears it") {
    import org.apache.spark.sql.functions._
    val path = graft.sources.GraftSink.scratchDir + "/doctor_mor"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    spark.range(100).select(col("id").as("k"), (col("id") % 5).as("v"))
      .write.parquet(path)
    // no sidecars yet: a raw read is clean
    assert(!rules(spark.read.parquet(path)).contains("unmasked-mor-scan"))
    graft.sources.GraftMor.morDelete(spark, path, col("k") % 10 === 3)
    // the residual surface: raw reads of a mutated table flag HIGH
    assert(rules(spark.read.parquet(path)).contains("unmasked-mor-scan"))
    assert(rules(spark.read.parquet(path).where(col("v") === 1L)
      .groupBy("v").count()).contains("unmasked-mor-scan"))
    // the serving paths compose the masks in-plan: excused
    assert(!rules(graft.sources.GraftMor.morRead(spark, path))
      .contains("unmasked-mor-scan"))
    // folding reunifies: the raw read is clean again
    graft.sources.GraftMor.morCompact(spark, path)
    assert(!rules(spark.read.parquet(path)).contains("unmasked-mor-scan"))
  }

  test("unmasked-mor-scan matches sidecars on path-segment boundaries: a sibling table's sidecar scan does not excuse a raw scan") {
    import org.apache.spark.sql.functions._
    val wh = graft.sources.GraftSink.scratchDir + "/doctor_mor_sib"
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(wh), true)
    val t = s"$wh/t"
    val t2 = s"$wh/t2" // shares t's name as a string prefix
    spark.range(50).select(col("id").as("k"), (col("id") % 5).as("v"))
      .write.parquet(t)
    spark.range(50).select(col("id").as("k"), (col("id") % 5).as("v"))
      .write.parquet(t2)
    graft.sources.GraftMor.morDelete(spark, t, col("k") % 10 === 3)
    graft.sources.GraftMor.morDelete(spark, t2, col("k") % 10 === 4)
    // a plan reading t RAW while scanning only t2's sidecar must still
    // flag t (prefix matching would let "/wh/t2/_dv" excuse "/wh/t")
    val mixed = spark.read.parquet(t).join(
      spark.read.parquet(s"$t2/_dv").select(col("dv_pos").as("k")),
      Seq("k"), "left_anti")
    assert(rules(mixed).contains("unmasked-mor-scan"), rules(mixed).toString)
    // and t's OWN sidecar scan still excuses t (the morRead shape)
    assert(!rules(graft.sources.GraftMor.morRead(spark, t))
      .contains("unmasked-mor-scan"))
  }
}
