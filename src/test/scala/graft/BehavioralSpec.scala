package graft

import graft.operators.{Behavioral, Relational}
import graft.sources.GraftSink
import org.apache.spark.sql.functions._

class BehavioralSpec extends SparkSpecBase {

  test("funnel levels partition all active users and are monotone") {
    val rows = Behavioral.qFunnelConversion(spark, sfDir).collect()
    val byLevel = rows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nUsers = graft.streaming.Events.eventsTable(spark, sfDir)
      .select("user_id").distinct().count()
    assert(byLevel.values.sum == nUsers,
      s"funnel levels must partition the $nUsers active users: $byLevel")
    assert(byLevel.keys.forall(l => l >= 0 && l <= 3))
  }

  test("funnel plan shuffles the event log exactly once") {
    val plan = Behavioral.qFunnelConversion(spark, sfDir)
      .queryExecution.executedPlan.toString
    val userExchanges = "Exchange hashpartitioning\\(user_id".r
      .findAllIn(plan).length
    assert(userExchanges == 1,
      s"expected ONE user_id exchange reused by all 3 windows + the groupBy, got $userExchanges\n" + plan.take(1500))
  }

  test("funnel over a user-bucketed event table plans ZERO exchange") {
    import graft.streaming.Events
    // bucket the event log by user_id once (the A8 layout applied to
    // the behavioral workload) — every per-user pass after it should
    // read pre-partitioned data and never shuffle
    val ev = Events.eventsTable(spark, sfDir)
      .select("user_id", "event_type", "ts")
    GraftSink.writeBucketed(ev, "events_by_user", "user_id")
    val bucketed = spark.table("events_by_user")
    val df = graft.operators.Behavioral.funnelLevels(bucketed)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(user_id"),
      "bucketed funnel must not shuffle the event log:\n" + plan.take(1500))
    // and the result matches the unbucketed run
    val a = df.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val b = graft.operators.Behavioral.qFunnelConversion(spark, sfDir)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(a == b, s"bucketed $a vs scan $b")
  }

  test("funnel level ordering is consistent with its step times") {
    // reconstruct per-user anchors independently with a driver scan
    def micros(t: java.sql.Timestamp): Long =
      (t.getTime / 1000) * 1000000L + t.getNanos / 1000
    val ev = graft.streaming.Events.eventsTable(spark, sfDir)
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), micros(r.getTimestamp(2))))
    val w = 24L * 3600 * 1000000L
    val expected = ev.groupBy(_._1).values.map { es =>
      val t1 = es.filter(_._2 == "view").map(_._3).sorted.headOption
      val t2 = t1.flatMap(a => es.filter(e => e._2 == "click" &&
        e._3 >= a && e._3 <= a + w).map(_._3).sorted.headOption)
      val t3 = t2.flatMap(b => es.filter(e => e._2 == "purchase" &&
        e._3 >= b && e._3 <= t1.get + w).map(_._3).sorted.headOption)
      if (t3.isDefined) 3 else if (t2.isDefined) 2 else if (t1.isDefined) 1 else 0
    }.groupBy(identity).map { case (l, xs) => l -> xs.size.toLong }
    val got = Behavioral.qFunnelConversion(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == expected, s"got $got expected $expected")
  }

  test("scd2 windows share one user_id exchange (lag + lead, one shuffle)") {
    val plan = Behavioral.qScd2UserStatus(spark, sfDir)
      .queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning\\(user_id".r.findAllIn(plan).length
    assert(n == 1,
      s"lag and post-filter lead must reuse ONE user_id exchange, got $n\n" + plan.take(1200))
  }

  test("cohort retention: week-0 cell equals the cohort size") {
    val rows = Behavioral.qCohortRetention(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    // every user is active in their own first week by definition, so
    // offset-0 must be the max cell of each cohort row
    rows.groupBy(_._1).foreach { case (cw, cells) =>
      val zero = cells.find(_._2 == 0)
      assert(zero.isDefined, s"cohort $cw missing offset-0 cell")
      assert(cells.forall(_._3 <= zero.get._3),
        s"cohort $cw: offset-0 must dominate: $cells")
    }
  }

  test("scd2 intervals tile each user's event span without gaps") {
    val rows = Behavioral.qScd2UserStatus(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getString(3)), r.getInt(4)))
    rows.groupBy(_._1).foreach { case (u, ivs) =>
      val sorted = ivs.sortBy(_._3)
      // exactly one open (current) interval per user, and it is last
      assert(sorted.count(_._5 == 1) == 1, s"user $u open intervals != 1")
      assert(sorted.last._5 == 1 && sorted.last._4.isEmpty)
      // each interval's end = next interval's start (half-open tiling)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3), s"user $u gap: ${a._4} -> ${b._3}")
          assert(a._2 != b._2, s"user $u consecutive equal status not collapsed")
        case _ =>
      }
    }
  }

  test("merge delete removes an emptied partition directory entirely") {
    import java.nio.file.{Files, Paths}
    Relational.srcMergeDelete(spark, sfDir).collect()
    val root = Paths.get(GraftSink.scratchDir + "/orders_delete")
    assert(!Files.exists(root.resolve("o_orderstatus=P")),
      "fully-deleted partition dir must be removed (dynamic overwrite can't)")
    assert(Files.exists(root.resolve("o_orderstatus=O")))
    val merged = spark.read.parquet(root.toString)
    assert(merged.where(col("o_orderstatus") === "P").count() == 0)
    assert(merged.where(col("o_orderstatus") === "F" &&
      col("o_orderkey") % 100 === 7).count() == 0)
    // untouched 'O' partition kept every row
    val srcO = new graft.sources.GraftCatalog(spark, sfDir).table("orders")
      .where(col("o_orderstatus") === "O").count()
    assert(merged.where(col("o_orderstatus") === "O").count() == srcO)
  }

  test("incremental agg refresh scans the diff, not the base table") {
    Relational.srcIncrementalAgg(spark, sfDir).collect() // seeds both epochs
    // re-derive the refresh plan shape: the delta side must read only
    // the epoch-2 file set (diffTable), never the whole table
    val root = GraftSink.scratchDir + "/incagg"
    val catOld = new graft.sources.GraftCatalog(spark, root)
    val epoch1Files = catOld.snapshotFiles("orders").map(_._1).toSet
    // no new epoch here, so the diff against the same snapshot is empty
    val diff = new graft.sources.GraftCatalog(spark, root)
      .diffTable("orders", catOld)
    assert(diff.count() == 0, "diff of identical snapshots must be empty")
    assert(epoch1Files.nonEmpty)
  }

  test("merge upsert drops a partition drained by moves (no stale copies)") {
    import java.nio.file.{Files, Paths}
    val root = GraftSink.scratchDir + "/orders_drain"
    val orders = new graft.sources.GraftCatalog(spark, sfDir).table("orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(root)
    // move EVERY 'P' row to 'F': partition P drains to zero survivors
    val moves = orders.where(col("o_orderstatus") === "P")
      .withColumn("o_orderstatus", lit("F"))
    GraftSink.mergeUpsert(spark, root, moves, Seq("o_orderkey"), "o_orderstatus")
    assert(!Files.exists(Paths.get(root, "o_orderstatus=P")),
      "drained partition dir must be dropped")
    val merged = spark.read.parquet(root)
    assert(merged.where(col("o_orderstatus") === "P").count() == 0)
    // every moved key exists exactly once (no stale duplicate)
    val dups = merged.groupBy("o_orderkey").count().where(col("count") > 1).count()
    assert(dups == 0, "moved keys must not be duplicated by stale copies")
    assert(merged.count() == orders.count())
  }

  test("releaseCheckpoint actually frees localCheckpoint storage blocks") {
    // delta-based so leftovers from other suites (shared session)
    // don't pollute the assertion
    val before = spark.sparkContext.getRDDStorageInfo.map(_.id).toSet
    val df = new graft.sources.GraftCatalog(spark, sfDir).table("orders")
      .localCheckpoint(true)
    def newlyCached() = spark.sparkContext.getRDDStorageInfo
      .filter(i => !before(i.id) && i.numCachedPartitions > 0)
    assert(newlyCached().nonEmpty, "checkpoint must appear in storage")
    df.unpersist(true) // documented no-op for checkpoints
    assert(newlyCached().nonEmpty,
      "Dataset.unpersist on a checkpoint is expected to be a no-op " +
        "(if this fails, Spark fixed it and releaseCheckpoint can go)")
    graft.GraftSession.releaseCheckpoint(df)
    assert(newlyCached().isEmpty,
      "releaseCheckpoint must drop the checkpoint's cached partitions")
  }

  test("merge upsert/delete keep survivors in a NULL partition (null-safe filter)") {
    import spark.implicits._
    val root = GraftSink.scratchDir + "/null_part_merge"
    // the null partition holds keys 1 and 2; a merge touching only key 1
    // must NOT lose key 2 (a plain isin(affected) never matches NULL, so
    // the survivor scan would exclude it while dropDrainedPartitions
    // deletes the sentinel directory — silent data loss)
    Seq((1L, "x", null.asInstanceOf[String]), (2L, "y", null.asInstanceOf[String]),
        (3L, "z", "a"))
      .toDF("k", "v", "p")
      .write.mode("overwrite").partitionBy("p").parquet(root)
    GraftSink.mergeUpsert(spark, root,
      Seq((1L, "x2", null.asInstanceOf[String])).toDF("k", "v", "p"), Seq("k"), "p")
    def snapshot() = spark.read.parquet(root).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSet
    assert(snapshot() === Set((1L, "x2", null), (2L, "y", null), (3L, "z", "a")),
      "null-partition survivors must be rewritten, not dropped")
    GraftSink.mergeDelete(spark, root, Seq(Tuple1(1L)).toDF("k"), Seq("k"), "p")
    assert(snapshot() === Set((2L, "y", null), (3L, "z", "a")),
      "deleting one null-partition key must keep the other")
  }

  test("releaseCheckpoint rejects derived plans (protects sibling checkpoints)") {
    val cp = new graft.sources.GraftCatalog(spark, sfDir).table("nation")
      .localCheckpoint(true)
    try {
      intercept[IllegalArgumentException] {
        graft.GraftSession.releaseCheckpoint(cp.select("n_nationkey"))
      }
    } finally graft.GraftSession.releaseCheckpoint(cp)
  }

  test("merge upsert with an empty update batch touches nothing") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val root = GraftSink.scratchDir + "/orders_noop"
    val orders = new graft.sources.GraftCatalog(spark, sfDir).table("orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(root)
    def allFiles() = Files.walk(Paths.get(root)).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet"))
      .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis).toSet
    val before = allFiles()
    GraftSink.mergeUpsert(spark, root, orders.limit(0),
      Seq("o_orderkey"), "o_orderstatus")
    assert(allFiles() == before, "empty merge must leave every file untouched")
  }

  test("merge upsert rewrites only affected partitions (file identity)") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    Relational.srcMergeUpsert(spark, sfDir).collect() // full write+merge
    val root = Paths.get(GraftSink.scratchDir + "/orders_merge")
    def listing(part: String) =
      Files.list(root.resolve(s"o_orderstatus=$part")).iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .map(p => p.getFileName.toString -> Files.getLastModifiedTime(p).toMillis)
        .toSet

    val pBefore = listing("P")
    // re-run ONLY the merge step against the already-merged table with
    // an empty-effect update (no matches, no inserts) → nothing rewritten?
    // Stronger check: capture P's listing, re-run the whole query (which
    // rewrites the base + merges), and assert the merge phase itself
    // left P alone by comparing against a fresh base write.
    val orders = new graft.sources.GraftCatalog(spark, sfDir).table("orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val updates = orders
      .where(col("o_orderstatus") === "F" && col("o_orderkey") % 100 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + lit(1.0))
    GraftSink.mergeUpsert(spark, root.toString, updates,
      Seq("o_orderkey"), "o_orderstatus")
    assert(listing("P") == pBefore,
      "merge touching only 'F' must leave partition P byte-identical")

    // the moved key must exist once, in 'F', and be gone from 'O'
    val merged = spark.read.parquet(root.toString)
    val movedKeys = merged.where(col("o_orderkey") % 100 === 50 &&
      col("o_orderstatus") === "O").count()
    assert(movedKeys == 0, "stale copies left in the source partition of a move")
    val inserted = merged.where(col("o_orderkey") >= 900000000L).count()
    assert(inserted == 3)
  }
}
