package graft

import graft.sources.{GraftCatalog, GraftLease, GraftSink}
import org.apache.spark.sql.functions._

class LeaseSpec extends SparkSpecBase {

  private def mkTable(root: String): Unit = {
    import spark.implicits._
    Seq((1L, "a", "p1"), (2L, "b", "p1"), (3L, "c", "p2"))
      .toDF("k", "v", "p")
      .write.mode("overwrite").partitionBy("p").parquet(s"$root/t.parquet")
  }

  private def updates = {
    import spark.implicits._
    Seq((2L, "B", "p2")).toDF("k", "v", "p")
  }

  test("a concurrent merge against a share-leased snapshot fails fast; REFRESH clears it") {
    val root = java.nio.file.Files.createTempDirectory("graft_lease").toString
    mkTable(root)
    val reader = new GraftCatalog(spark, root)
    assert(reader.table("t").count() === 3)
    reader.acquireLease("t")
    val e = intercept[IllegalStateException] {
      GraftSink.mergeUpsert(spark, s"$root/t.parquet", updates, Seq("k"), "p")
    }
    assert(e.getMessage.contains("reader lease"))
    // the snapshot survived intact (no partial rewrite)
    assert(reader.table("t").count() === 3)
    // REFRESH: the reader gives up its snapshot -> lease released,
    // writer proceeds, reader re-pins the NEW state
    reader.invalidate("t")
    GraftSink.mergeUpsert(spark, s"$root/t.parquet", updates, Seq("k"), "p")
    val after = reader.table("t").orderBy("k").collect()
    assert(after.length === 3)
    assert(after.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("mergeDelete honors the lease; release and TTL expiry both unblock") {
    val root = java.nio.file.Files.createTempDirectory("graft_lease2").toString
    mkTable(root)
    import spark.implicits._
    val dels = Seq(Tuple1(3L)).toDF("k")
    val path = s"$root/t.parquet"
    val id = GraftLease.acquire(spark, path, ttlMs = 600000L)
    intercept[IllegalStateException] {
      GraftSink.mergeDelete(spark, path, dels, Seq("k"), "p")
    }
    GraftLease.release(spark, path, id)
    GraftSink.mergeDelete(spark, path, dels, Seq("k"), "p")
    assert(spark.read.parquet(path).count() === 2)
    // TTL path: a crashed reader's lease dies on its own — and the
    // expired marker is garbage-collected by the next holder listing
    GraftLease.acquire(spark, path, ttlMs = 1L)
    Thread.sleep(20L)
    assert(GraftLease.activeHolders(spark, path).isEmpty)
    GraftSink.mergeDelete(spark, path, dels, Seq("k"), "p") // no-op delete, no raise
  }
}
