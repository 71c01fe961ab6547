package graft

import graft.sources.GraftBloomIndex
import org.apache.spark.sql.functions._

/** A31: per-file bloom index — prunes files on point lookups, stays
  * exact under false positives, degrades safely on unindexed files.
  */
class BloomIndexSpec extends SparkSpecBase {

  private def freshTable(name: String, nFiles: Int): String = {
    val path = graft.sources.GraftSink.scratchDir + s"/spec_$name"
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .repartition(nFiles).write.mode("overwrite").parquet(path)
    path
  }

  private def dataFiles(path: String): Seq[String] =
    graft.sources.v2.GraftV2.dataFiles(path, spark.sessionState.newHadoopConf())

  test("lookup prunes files and equals the full-scan filter exactly") {
    val path = freshTable("bloom_long", 8)
    val n = GraftBloomIndex.build(spark, path, "o_orderkey")
    assert(n === 8, s"one sidecar per file expected, got $n")
    val keys = Seq(1L, 64L, 777L)
    val got = GraftBloomIndex.lookup(spark, path, "o_orderkey", keys)
    assert(got.inputFiles.length < dataFiles(path).length,
      s"no pruning: ${got.inputFiles.length} files scanned")
    val exp = spark.read.parquet(path).where(col("o_orderkey").isin(keys: _*))
    assert(got.orderBy("o_orderkey").collect().map(_.toString).toSeq ===
      exp.orderBy("o_orderkey").collect().map(_.toString).toSeq)
    // absent key: zero rows, and typically zero or near-zero files
    assert(GraftBloomIndex.lookup(spark, path, "o_orderkey",
      Seq(987654321L)).count() === 0)
  }

  test("string keys index and prune too") {
    val path = graft.sources.GraftSink.scratchDir + "/spec_bloom_str"
    spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey", "c_name", "c_nationkey")
      .repartition(6).write.mode("overwrite").parquet(path)
    GraftBloomIndex.build(spark, path, "c_name")
    val names = spark.read.parquet(path).select("c_name")
      .orderBy("c_name").limit(2).collect().map(_.getString(0)).toSeq
    val got = GraftBloomIndex.lookup(spark, path, "c_name", names)
    assert(got.count() === 2)
    assert(got.inputFiles.length < 6)
  }

  test("a file appended after the build is scanned conservatively") {
    import spark.implicits._
    val path = freshTable("bloom_stale", 4)
    GraftBloomIndex.build(spark, path, "o_orderkey")
    // a late arrival carrying a brand-new key, no sidecar for it
    Seq((987654321L, 1L, 42.5)).toDF("o_orderkey", "o_custkey", "o_totalprice")
      .coalesce(1).write.mode("append").parquet(path)
    val got = GraftBloomIndex.lookup(spark, path, "o_orderkey", Seq(987654321L))
    assert(got.count() === 1, "unindexed file must be scanned, not skipped")
    // rebuild re-covers it and prunes again
    assert(GraftBloomIndex.build(spark, path, "o_orderkey") === 5)
    val after = GraftBloomIndex.lookup(spark, path, "o_orderkey", Seq(987654321L))
    assert(after.count() === 1)
    assert(after.inputFiles.length < 5)
  }

  test("build writes sidecars from tasks and the probe runs as a Spark job — no bloom bytes cross the driver") {
    val path = freshTable("bloom_dedriver", 6)
    // count Spark jobs + driver-side result sizes around build and probe
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      jobs.set(0)
      val n = GraftBloomIndex.build(spark, path, "o_orderkey")
      assert(n === 6)
      assert(jobs.get() >= 1, "build must run as a Spark job (executor-side writes)")
      // sidecars exist even though the driver only received a COUNT —
      // i.e. the write happened inside the job's tasks
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sessionState.newHadoopConf())
      val idx = new org.apache.hadoop.fs.Path(path, "_bloom_o_orderkey")
      assert(fs.listStatus(idx).count(_.getPath.getName.endsWith(".bloom")) === 6)
      jobs.set(0)
      val surviving = GraftBloomIndex.probeFiles(
        spark, path, "o_orderkey", Seq(1L, 64L))
      assert(jobs.get() >= 1,
        "the sidecar probe must execute as a distributed Spark job, " +
          "not a serial driver loop")
      // only file NAMES come back, and they prune
      assert(surviving.forall(_.endsWith(".parquet")))
      assert(surviving.length < 6, s"probe should prune: $surviving")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("bloom sizing reads footers as a Spark job; a torn sidecar degrades to a conservative scan, never a failure") {
    val path = freshTable("bloom_sizing", 5)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // the sizing pass (per-file footer row counts) is its own Spark
      // job — the r10 residual: a serial driver loop, one round trip
      // per file, minutes at 1e5 files
      jobs.set(0)
      val counts = graft.sources.GraftBloomIndex.footerRowCounts(
        spark, dataFiles(path))
      assert(jobs.get() >= 1,
        "footer sizing must run as a distributed Spark job, not a driver loop")
      assert(counts.size === 5)
      assert(counts.values.sum === spark.read.parquet(path).count(),
        "footer row counts must sum to the table row count")
    } finally spark.sparkContext.removeSparkListener(listener)
    // torn sidecar (crashed writer / partial copy): its file is scanned
    // conservatively and the lookup stays exact
    GraftBloomIndex.build(spark, path, "o_orderkey")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val side = fs.listStatus(new org.apache.hadoop.fs.Path(path, "_bloom_o_orderkey"))
      .map(_.getPath).filter(_.getName.endsWith(".bloom")).sortBy(_.getName).head
    val out = fs.create(side, true)
    try out.write(Array[Byte](42, 13, 7)) finally out.close()
    val tornDataFile = side.getName.stripSuffix(".bloom")
    // an absent key: every healthy sidecar rules its file out; ONLY the
    // torn one forces a scan
    val surviving = GraftBloomIndex.probeFiles(
      spark, path, "o_orderkey", Seq(987654321L))
    assert(surviving.exists(_.endsWith(tornDataFile)),
      s"the torn sidecar's file must be kept for scanning: $surviving")
    // and a real lookup through the damaged index is still exact
    val keys = Seq(1L, 64L)
    val got = GraftBloomIndex.lookup(spark, path, "o_orderkey", keys)
    val exp = spark.read.parquet(path).where(col("o_orderkey").isin(keys: _*))
    assert(got.orderBy("o_orderkey").collect().map(_.toString).toSeq ===
      exp.orderBy("o_orderkey").collect().map(_.toString).toSeq)
  }

  test("the index dir is invisible to every reader path") {
    val path = freshTable("bloomhidden", 3)
    val before = spark.read.parquet(path).count()
    GraftBloomIndex.build(spark, path, "o_orderkey")
    // a plain read and the engine's file listing both skip the
    // underscore-prefixed index dir
    assert(spark.read.parquet(path).count() === before)
    assert(dataFiles(path).forall(!_.contains("_bloom_")))
    assert(dataFiles(path).length === 3)
  }

  test("A51: a bloom point lookup on a MOR-mutated table composes the masks — tombstoned and erased keys never serve") {
    import spark.implicits._
    val path = freshTable("bloom_mor", 4)
    GraftBloomIndex.build(spark, path, "o_orderkey")
    val keys = spark.read.parquet(path).select("o_orderkey", "o_custkey")
      .orderBy("o_orderkey").limit(3).collect()
    val victim = keys(0).getLong(0)        // position-tombstoned
    val erasedCust = keys(1).getLong(1)    // equality-erased (by custkey)
    val live = keys(2).getLong(0)
    assert(GraftBloomIndex.lookup(spark, path, "o_orderkey",
      Seq(victim, live)).count() >= 2, "both keys serve pre-mutation")
    graft.sources.GraftMor.morDelete(spark, path, col("o_orderkey") === victim)
    graft.sources.GraftMor.morErase(spark, path,
      Seq(erasedCust).toDF("o_custkey"), Seq("o_custkey"))
    val post = GraftBloomIndex.lookup(spark, path, "o_orderkey",
      Seq(victim, live)).collect()
    assert(!post.exists(_.getLong(0) == victim),
      "a tombstoned row must not serve through the bloom lookup")
    assert(post.exists(_.getLong(0) == live), "live keys still serve")
    assert(GraftBloomIndex.lookup(spark, path, "o_custkey",
      Seq(erasedCust)).count() === 0,
      "an erased key must not serve through the bloom lookup")
  }
}
