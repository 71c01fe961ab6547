package graft

import graft.plans.GraftMv
import graft.sources.{GraftCdc, GraftJdbc}
import org.apache.spark.sql.functions._

/** A39: CDC apply from an external JDBC change log — insert/update/
  * delete segments applied incrementally must equal a rebuild from
  * the log's net state, and the segment read must stride-partition.
  */
class CdcSpec extends SparkSpecBase {

  private val Table = "cdc_log"

  private def withConn[T](f: java.sql.Connection => T): T = {
    val conn = java.sql.DriverManager.getConnection(
      GraftJdbc.url(spark), GraftJdbc.connectionProperties(spark))
    try f(conn) finally conn.close()
  }

  private def resetLog(): Unit = withConn { conn =>
    val st = conn.createStatement()
    try {
      try st.executeUpdate(s"DROP TABLE $Table")
      catch { case _: java.sql.SQLException => () }
      st.executeUpdate(s"CREATE TABLE $Table (seq BIGINT PRIMARY KEY, " +
        "change_type VARCHAR(10), bucket BIGINT, user_id BIGINT, amount BIGINT)")
    } finally st.close()
  }

  private def appendLog(rows: Seq[(Long, String, Long, Long, Long)]): Unit =
    withConn { conn =>
      val ps = conn.prepareStatement(s"INSERT INTO $Table VALUES (?, ?, ?, ?, ?)")
      try rows.foreach { case (seq, ct, b, u, a) =>
        ps.setLong(1, seq); ps.setString(2, ct); ps.setLong(3, b)
        ps.setLong(4, u); ps.setLong(5, a); ps.executeUpdate()
      } finally ps.close()
    }

  private val d = GraftMv.MvDef("<external>", "<none>",
    groupCols = Seq("bucket"),
    measures = Seq("cnt" -> GraftMv.MvCount, "sum_amount" -> GraftMv.MvSum("amount")))

  /** The log's net state (insert images minus delete images). */
  private def netState(upToSeq: Long) = {
    val log = spark.read.jdbc(GraftJdbc.url(spark), Table,
      GraftJdbc.connectionProperties(spark)).where(col("seq") <= upToSeq)
    log.where(col("change_type") === "insert").drop("seq", "change_type")
      .exceptAll(log.where(col("change_type") === "delete").drop("seq", "change_type"))
  }

  private def rollup(df: org.apache.spark.sql.DataFrame) =
    GraftMv.mvFrameOf(df, d).orderBy("bucket").collect().map(_.toString).toSeq

  test("insert/update/delete segments applied incrementally equal the rebuild; reads stride-partition") {
    resetLog()
    // segment 1: 30 inserts
    appendLog((1L to 30L).map(u => (u, "insert", u % 4, u, u * 10)))
    // segment 2: updates for users 1..5 (delete old + insert new,
    // user 1 MOVES bucket), deletes for 6..10, fresh inserts 31..35
    val upd = (1L to 5L).flatMap { u =>
      val newBucket = if (u == 1L) (u + 1) % 4 else u % 4
      Seq((30L + u * 2 - 1, "delete", u % 4, u, u * 10),
          (30L + u * 2, "insert", newBucket, u, u * 100))
    }
    val del = (6L to 10L).map(u => (40L + u - 5, "delete", u % 4, u, u * 10))
    val ins = (31L to 35L).map(u => (45L + u - 30, "insert", u % 4, u, u * 10))
    appendLog(upd ++ del ++ ins)
    assert(GraftCdc.maxSeq(spark, Table) === 50L)

    // the segment read is a 4-way stride over the seq range
    val seg1 = GraftCdc.readFeedSegment(spark, Table, 0L, 30L)
    assert(seg1.rdd.getNumPartitions === 4, "A23 stride discipline")
    assert(seg1.count() === 30L)

    // empty starting rollup with the image schema
    val mv0 = GraftMv.mvFrameOf(seg1.drop("change_type").limit(0), d)
    val mv1 = GraftCdc.applySegment(spark, mv0, d, Table, 0L, 30L)
      .localCheckpoint(true)
    assert(rollup(netState(30L)) === mv1.orderBy("bucket").collect()
      .map(_.toString).toSeq, "segment 1 apply must equal the rebuild")

    val mv2 = GraftCdc.applySegment(spark, mv1, d, Table, 30L, 50L)
      .localCheckpoint(true)
    assert(rollup(netState(50L)) === mv2.orderBy("bucket").collect()
      .map(_.toString).toSeq,
      "updates, cross-bucket moves and deletes must all net out exactly")

    // replaying a segment against its PRE-state is deterministic
    // (crash-recovery: re-read the same half-open range, same result)
    val mv2b = GraftCdc.applySegment(spark, mv1, d, Table, 30L, 50L)
    assert(mv2b.orderBy("bucket").collect().map(_.toString).toSeq ===
      mv2.orderBy("bucket").collect().map(_.toString).toSeq)
    graft.GraftSession.releaseCheckpoint(mv1)
    graft.GraftSession.releaseCheckpoint(mv2)
  }

  test("durable consumer loop: resumes from the stored watermark, replays are no-ops, crash swap self-heals") {
    resetLog()
    val root = graft.sources.GraftSink.scratchDir + "/cdc_consumer"
    val rp = new org.apache.hadoop.fs.Path(root)
    rp.getFileSystem(spark.sessionState.newHadoopConf()).delete(rp, true)
    def served = spark.read.parquet(s"$root/rollup.parquet")
      .orderBy("bucket").collect().map(_.toString).toSeq

    appendLog((1L to 20L).map(u => (u, "insert", u % 4, u, u * 10)))
    assert(GraftCdc.applyNext(spark, d, Table, root) === 20L)
    assert(served === rollup(netState(20L)))
    // nothing new → no-op (watermark unchanged, files unchanged)
    val filesBefore = new java.io.File(s"$root/rollup.parquet").listFiles()
      .map(f => (f.getName, f.lastModified)).toSet
    assert(GraftCdc.applyNext(spark, d, Table, root) === 20L)
    assert(new java.io.File(s"$root/rollup.parquet").listFiles()
      .map(f => (f.getName, f.lastModified)).toSet === filesBefore,
      "a watermark no-op must not rewrite the rollup")
    // more log: deletes + inserts; the consumer catches up
    appendLog((21L to 25L).map(u => (u, "insert", u % 4, u, u * 10)) ++
      Seq((26L, "delete", 1L, 1L, 10L)))
    assert(GraftCdc.applyNext(spark, d, Table, root) === 26L)
    assert(served === rollup(netState(26L)))
    // crash between delete and rename: staging committed, live gone —
    // the next call finishes the swap instead of reapplying
    val fs = rp.getFileSystem(spark.sessionState.newHadoopConf())
    fs.rename(new org.apache.hadoop.fs.Path(s"$root/rollup.parquet"),
      new org.apache.hadoop.fs.Path(s"$root/rollup.staging"))
    assert(GraftCdc.applyNext(spark, d, Table, root) === 26L)
    assert(served === rollup(netState(26L)))
  }

  test("A41 outbound: published change-log segments replay idempotently and drive a downstream rollup to the table's exact state") {
    val scratch = graft.sources.GraftSink.scratchDir + "/cdc_out"
    val rp = new org.apache.hadoop.fs.Path(scratch)
    rp.getFileSystem(spark.sessionState.newHadoopConf()).delete(rp, true)
    val tbl = s"$scratch/orders.parquet"
    val logDir = s"$scratch/changelog"
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(tbl)
    val dd = GraftMv.MvDef("<cdc>", "<none>", groupCols = Seq("o_orderstatus"),
      measures = Seq("cnt" -> GraftMv.MvCount,
        "sum_cust" -> GraftMv.MvSum("o_custkey")))
    // the downstream system's rollup, seeded from the epoch-0 state
    val mv0 = GraftMv.mvFrameOf(spark.read.parquet(tbl), dd).localCheckpoint(true)
    // epoch 1: a COW merge captures its feed at write time, and the
    // feed publishes OUT as a seq-stamped log segment
    val upd1 = orders.where(col("o_orderkey") % 100 === 0)
      .withColumn("o_custkey", col("o_custkey") + 1L)
    val feed1 = graft.sources.GraftSink.mergeUpsertCdf(
      spark, tbl, upd1, Seq("o_orderkey"), "o_orderstatus")
    val (f1, t1) = GraftCdc.publishFeed(feed1, logDir, epoch = 1L)
    assert(f1 === 0L && t1 === feed1.count())
    // REPLAYED publish of the same epoch: same bounds, same stamped
    // content (the per-epoch dynamic overwrite rewrites, never dups)
    val before = spark.read.parquet(logDir).collect().map(_.toString).sorted
    assert(GraftCdc.publishFeed(feed1, logDir, epoch = 1L) === ((f1, t1)))
    assert(spark.read.parquet(logDir).collect().map(_.toString).sorted
      === before, "a replayed publish must leave identical log content")
    // epoch 2 continues the sequence exactly where epoch 1 ended
    val upd2 = orders.where(col("o_orderkey") % 100 === 50)
      .withColumn("o_custkey", col("o_custkey") + 7L)
    val feed2 = graft.sources.GraftSink.mergeUpsertCdf(
      spark, tbl, upd2, Seq("o_orderkey"), "o_orderstatus")
    val (f2, t2) = GraftCdc.publishFeed(feed2, logDir, epoch = 2L)
    assert(f2 === t1, "segment bounds must be contiguous")
    assert(t2 === t1 + feed2.count())
    // the consumer half: applying the PUBLISHED segments in order
    // drives the rollup to the mutated table's exact aggregate
    val mv1 = GraftMv.applyFeed(mv0,
      GraftCdc.readPublishedSegment(spark, logDir, f1, t1), dd)
      .localCheckpoint(true)
    val mv2 = GraftMv.applyFeed(mv1,
      GraftCdc.readPublishedSegment(spark, logDir, f2, t2), dd)
    val expect = GraftMv.mvFrameOf(spark.read.parquet(tbl), dd)
    assert(mv2.orderBy("o_orderstatus").collect().map(_.toString).toSeq ===
      expect.orderBy("o_orderstatus").collect().map(_.toString).toSeq,
      "published log → applyFeed must equal the table's final rollup")
    graft.GraftSession.releaseCheckpoint(mv0)
    graft.GraftSession.releaseCheckpoint(mv1)
  }
}
