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
}
