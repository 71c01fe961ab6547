package graft

import graft.operators.Relational
import graft.sources.{GraftCatalog, HiveTypeMapping}
import org.apache.spark.sql.types._

class RelationalSpec extends SparkSpecBase {

  test("q1 pricing summary groups all flag/status combos") {
    val rows = Relational.q1PricingSummary(spark, sfDir).collect()
    assert(rows.length === 6)
    val expected = new GraftCatalog(spark, sfDir).table("lineitem")
      .where("l_shipdate <= timestamp'1998-09-02 00:00:00'").count()
    assert(rows.map(_.getLong(9)).sum === expected) // count_order covers the filtered lines
  }

  test("q6 revenue is a single positive scalar") {
    val r = Relational.q6ForecastRevenue(spark, sfDir).collect()
    assert(r.length === 1 && r(0).getDouble(0) > 0)
  }

  test("top-k plan uses TakeOrderedAndProject (no global sort)") {
    val plan = Relational.qTopkRevenueOrders(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }

  test("q5 star join broadcasts the dims") {
    val plan = Relational.q5LocalSupplierVolume(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
  }

  test("predicate pushdown reaches the parquet scan") {
    val plan = Relational.srcPredicatePushdown(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("l_quantity"), plan.take(800))
  }

  test("projection pushdown prunes the read schema") {
    val plan = Relational.srcProjectionPushdown(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int>"), plan.take(800))
  }

  test("compaction collapses the fragmented layout to one file per partition") {
    Relational.srcCompaction(spark, sfDir).collect() // runs both writes
    val base = graft.sources.GraftSink.scratchDir
    def parquetFiles(p: String): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(p)).count(_.getName.endsWith(".parquet"))
    }
    val frag = parquetFiles(s"$base/orders_fragmented")
    val comp = parquetFiles(s"$base/orders_compacted")
    assert(comp < frag, s"compacted=$comp fragmented=$frag")
    val dirs = new java.io.File(s"$base/orders_compacted").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("o_orderstatus="))
    assert(dirs.nonEmpty)
    dirs.foreach { d =>
      val n = d.listFiles().count(_.getName.endsWith(".parquet"))
      assert(n === 1, s"${d.getName} has $n files")
    }
  }

  test("anti join + outer join row accounting agree") {
    import org.apache.spark.sql.functions.col
    val catalog = new GraftCatalog(spark, sfDir)
    val nCustomers = catalog.table("customer").count()
    // independent formulation of "no finalized orders": total customers
    // minus the distinct custkeys appearing on an 'F' order.
    val withF = catalog.table("orders").where(col("o_orderstatus") === "F")
      .select("o_custkey").distinct().count()
    val noF = Relational.qAntiCustomersNoOrders(spark, sfDir)
      .collect().map(_.getLong(1)).sum
    assert(noF === nCustomers - withF)
    assert(noF > 0, "anti join must not be vacuous on the corpus")
    val outer = Relational.qOuterCustomerOrders(spark, sfDir).collect()
    assert(outer.length === nCustomers)
  }

  test("catalog pins the file listing: a file landing mid-snapshot is invisible") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_snap").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$tmp/t.parquet")
    val catalog = new GraftCatalog(spark, tmp)
    assert(catalog.table("t").count() === 2L)
    val filesBefore = catalog.snapshotFiles("t")
    // a writer lands a new file in the directory mid-"transaction"
    Seq((3L, "c")).toDF("id", "v").write.mode("append").parquet(s"$tmp/t.parquet")
    // the pinned catalog still sees the snapshot; a fresh catalog sees 3
    assert(catalog.table("t").count() === 2L, "pinned snapshot leaked a later file")
    assert(catalog.snapshotFiles("t") === filesBefore)
    assert(new GraftCatalog(spark, tmp).table("t").count() === 3L)
  }

  test("catalog pins ALL tables at construction: cross-table snapshot is atomic") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_snap_all").toString
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$tmp/t.parquet")
    Seq((1L, "x"), (2L, "y")).toDF("id", "v").write.parquet(s"$tmp/u.parquet")
    val catalog = new GraftCatalog(spark, tmp)
    // touch only t; a writer then lands in u BEFORE u's first read —
    // the reference's job-spanning transaction makes that invisible
    assert(catalog.table("t").count() === 1L)
    Seq((3L, "z")).toDF("id", "v").write.mode("append").parquet(s"$tmp/u.parquet")
    assert(catalog.table("u").count() === 2L,
      "cross-table snapshot leaked a write landing after catalog construction")
    assert(new GraftCatalog(spark, tmp).table("u").count() === 3L)
  }

  test("catalog snapshot read preserves hive partition columns via basePath") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_snap_part").toString
    Seq((1L, "x", "p1"), (2L, "y", "p2")).toDF("id", "v", "part")
      .write.mode("overwrite").partitionBy("part").parquet(s"$tmp/t.parquet")
    val df = new GraftCatalog(spark, tmp).table("t")
    assert(df.columns.toSet === Set("id", "v", "part"))
    assert(df.where(org.apache.spark.sql.functions.col("part") === "p2").count() === 1L)
  }

  test("catalog partition filter equals typed where-clause") {
    val c = new GraftCatalog(spark, sfDir)
    val viaFilter = c.scan("orders", "o_orderpriority=1-URGENT").count()
    val viaWhere = c.table("orders").where("o_orderpriority = '1-URGENT'").count()
    assert(viaFilter === viaWhere && viaFilter > 0)
  }

  test("catalog rejects bad filters like the reference") {
    val c = new GraftCatalog(spark, sfDir)
    assertThrows[IllegalArgumentException](c.scan("orders", "nope=1").count())
    assertThrows[IllegalArgumentException](c.scan("orders", "no_equals").count())
    // multi-column filters are rejected like the reference
    // (ArgodbMapreduceInputFormat.java:236-238)
    assertThrows[IllegalArgumentException](
      c.scan("orders", "o_orderstatus=O/o_orderpriority=1-URGENT").count())
  }

  test("EMPTYSTR sentinel on a non-string column is a clear error") {
    val schema = StructType(Seq(StructField("p", IntegerType)))
    val e = intercept[IllegalArgumentException] {
      GraftCatalog.compileFilter(s"p=${GraftCatalog.DefaultPartitionEmpty}", schema)
    }
    assert(e.getMessage.contains("[GRAFT]") && e.getMessage.contains("string"), e.getMessage)
  }

  test("hive type mapping round-trips the reference's type surface") {
    val types = Seq("boolean", "tinyint", "smallint", "int", "bigint",
      "float", "double", "decimal(10,2)", "string", "binary", "date", "timestamp")
    types.foreach { t =>
      val dt = HiveTypeMapping.toSparkType(t)
      assert(HiveTypeMapping.toSparkType(HiveTypeMapping.toHiveName(dt)) === dt, t)
    }
    assertThrows[IllegalArgumentException](HiveTypeMapping.toSparkType("map<int,int>"))
  }

  test("default-partition sentinel becomes null") {
    import org.apache.spark.sql.functions.col
    val out = Relational.srcTypedPartitionValues(spark, sfDir)
      .where(col("n_nationkey") % 5 === 0).collect()
    assert(out.nonEmpty && out.forall(_.isNullAt(2)))
  }

  test("snapshot diff reads only the new epoch; old catalog stays pinned; self-diff is empty") {
    import org.apache.spark.sql.functions.col
    val root = graft.sources.GraftSink.scratchDir + "/incdemo_spec"
    val tbl = s"$root/orders.parquet"
    val orders = new GraftCatalog(spark, sfDir).table("orders")
    orders.where(col("o_orderstatus") === "O").write.mode("overwrite").parquet(tbl)
    val catOld = new GraftCatalog(spark, root)
    val nEpoch1 = catOld.table("orders").count()
    orders.where(col("o_orderstatus") === "F").write.mode("append").parquet(tbl)
    val catNew = new GraftCatalog(spark, root)
    // increment = exactly the appended F rows
    val inc = catNew.diffTable("orders", catOld)
    assert(inc.count() === orders.where(col("o_orderstatus") === "F").count())
    assert(inc.where(col("o_orderstatus") =!= "F").count() === 0)
    // the OLD catalog still sees only epoch 1 after the append
    assert(catOld.table("orders").count() === nEpoch1)
    // diff against an identical snapshot is empty (schema intact)
    val selfDiff = catNew.diffTable("orders", catNew)
    assert(selfDiff.count() === 0 && selfDiff.columns.contains("o_orderstatus"))
  }

  test("published snapshot time-travels across an append; second epoch sees both") {
    import org.apache.spark.sql.functions.col
    val root = graft.sources.GraftSink.scratchDir + "/ttdemo_spec"
    val rp = new org.apache.hadoop.fs.Path(root)
    rp.getFileSystem(spark.sessionState.newHadoopConf()).delete(rp, true)
    val tbl = s"$root/orders.parquet"
    val orders = new GraftCatalog(spark, sfDir).table("orders")
    orders.where(col("o_orderstatus") === "O").write.mode("overwrite").parquet(tbl)
    val c1 = new GraftCatalog(spark, root)
    val v1 = c1.publishSnapshot("orders")
    val n1 = c1.table("orders").count()
    orders.where(col("o_orderstatus") === "F").write.mode("append").parquet(tbl)
    val c2 = new GraftCatalog(spark, root)
    val v2 = c2.publishSnapshot("orders")
    // the fresh catalog's own pin sees both epochs...
    assert(c2.table("orders").count() > n1)
    // ...but AS OF v1 the post-pin append is invisible — no leak
    assert(c2.tableAsOf("orders", v1).count() === n1)
    assert(c2.tableAsOf("orders", v1)
      .where(col("o_orderstatus") === "F").count() === 0)
    // the second epoch sees both; ids are ascending and durable
    assert(c2.tableAsOf("orders", v2).count() === c2.table("orders").count())
    assert(c2.snapshotIds("orders") === Seq(v1, v2))
    // the snapshot log never pollutes the data listing
    assert(c2.snapshotFiles("orders").forall(!_._1.contains("_snapshots")))
  }

  test("snapshot log answers from manifests + footers — no table scan in the plan") {
    val df = Relational.srcSnapshotLog(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("FileScan parquet"),
      "the log must never scan the table's data pages:\n" + plan.take(800))
    val rows = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.keySet === Set(1L, 2L))
    assert(rows(2L) > rows(1L), "append-only epochs pin cumulatively more rows")
  }

  test("vacuum deletes only unpublished files; as-of reads survive; expiry bounds the log") {
    import org.apache.spark.sql.functions.col
    val root = graft.sources.GraftSink.scratchDir + "/vacdemo_spec"
    val rp = new org.apache.hadoop.fs.Path(root)
    rp.getFileSystem(spark.sessionState.newHadoopConf()).delete(rp, true)
    val tbl = s"$root/orders.parquet"
    val orders = new GraftCatalog(spark, sfDir).table("orders")
    orders.where(col("o_orderstatus") === "O").write.mode("overwrite").parquet(tbl)
    val v1 = new GraftCatalog(spark, root).publishSnapshot("orders")
    orders.where(col("o_orderstatus") === "F").write.mode("append").parquet(tbl)
    val c2 = new GraftCatalog(spark, root)
    val v2 = c2.publishSnapshot("orders")
    val nPublished = c2.table("orders").count()
    // a crashed writer leaves files no manifest references
    orders.where(col("o_orderstatus") === "P").write.mode("append").parquet(tbl)
    val deleted = c2.vacuum("orders")
    assert(deleted.nonEmpty, "the orphan files must be reclaimed")
    // vacuum on a clean table is a no-op (idempotent)
    assert(new GraftCatalog(spark, root).vacuum("orders").isEmpty)
    // every retained as-of read survives; the live read = published data
    val c3 = new GraftCatalog(spark, root)
    assert(c3.tableAsOf("orders", v1).where(col("o_orderstatus") =!= "O").count() === 0)
    assert(c3.tableAsOf("orders", v2).count() === nPublished)
    assert(c3.table("orders").count() === nPublished)
    assert(c3.table("orders").where(col("o_orderstatus") === "P").count() === 0)
    // retention: keep only the newest epoch; the expired id is gone
    assert(c3.expireSnapshots("orders", keepLast = 1) === Seq(v1))
    assert(c3.snapshotIds("orders") === Seq(v2))
    assertThrows[IllegalArgumentException](c3.tableAsOf("orders", v1))
    // vacuum with no published snapshot at all refuses to run
    val bare = s"$root/bare"
    orders.limit(5).write.mode("overwrite").parquet(s"$bare/t.parquet")
    assertThrows[IllegalArgumentException](new GraftCatalog(spark, bare).vacuum("t"))
  }

  test("restore puts the table back physically; later manifests expire; log re-tips") {
    import org.apache.spark.sql.functions.col
    val root = graft.sources.GraftSink.scratchDir + "/restoredemo_spec"
    val rp = new org.apache.hadoop.fs.Path(root)
    rp.getFileSystem(spark.sessionState.newHadoopConf()).delete(rp, true)
    val tbl = s"$root/orders.parquet"
    val orders = new GraftCatalog(spark, sfDir).table("orders")
    orders.where(col("o_orderstatus") === "O").write.mode("overwrite").parquet(tbl)
    val c1 = new GraftCatalog(spark, root)
    val v1 = c1.publishSnapshot("orders")
    val n1 = c1.table("orders").count()
    orders.where(col("o_orderstatus") === "F").write.mode("append").parquet(tbl)
    val c2 = new GraftCatalog(spark, root)
    val v2 = c2.publishSnapshot("orders")
    val vNew = c2.restoreSnapshot("orders", v1)
    // plain reads through a FRESH catalog see exactly epoch 1 again
    val c3 = new GraftCatalog(spark, root)
    assert(c3.table("orders").count() === n1)
    assert(c3.table("orders").where(col("o_orderstatus") === "F").count() === 0)
    // the dangling v2 manifest expired; the restore re-tipped the log
    assert(vNew > v2)
    assert(c3.snapshotIds("orders") === Seq(v1, vNew))
    assert(c3.tableAsOf("orders", vNew).count() === n1)
    assertThrows[IllegalArgumentException](c3.tableAsOf("orders", v2))
    // restoring to a snapshot whose files are gone fails BEFORE deleting
    val fs = rp.getFileSystem(spark.sessionState.newHadoopConf())
    c3.snapshotFiles("orders") // pin
    val vPre = c3.publishSnapshot("orders")
    val doomedFile = c3.snapshotFilesAsOf("orders", v1).head
    fs.delete(new org.apache.hadoop.fs.Path(doomedFile), false)
    val e = intercept[IllegalArgumentException](
      new GraftCatalog(spark, root).restoreSnapshot("orders", vPre))
    assert(e.getMessage.contains("no longer exist"), e.getMessage)
  }

  test("dynamic overwrite rewrites one partition, siblings byte-identical") {
    import org.apache.spark.sql.functions.col
    val path = graft.sources.GraftSink.scratchDir + "/orders_backfill_spec"
    val orders = new GraftCatalog(spark, sfDir).table("orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    // inputFiles IGNORES pushed filters (SURVEY.md §6) — select the
    // sibling partitions' files by their directory names instead
    def nonF(files: Array[String]) = files.filterNot(_.contains("o_orderstatus=F")).toSet
    val beforeNonF = nonF(spark.read.parquet(path).inputFiles)
    orders.where(col("o_orderstatus") === "F" && col("o_totalprice") > 100)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("o_orderstatus").parquet(path)
    val after = spark.read.parquet(path)
    // sibling partitions: same physical files, not rewritten copies
    assert(nonF(after.inputFiles) === beforeNonF)
    // the F partition carries only the re-derived rows
    assert(after.where(col("o_orderstatus") === "F").count() ===
           orders.where(col("o_orderstatus") === "F" && col("o_totalprice") > 100).count())
    assert(after.count() ===
           orders.where(col("o_orderstatus") =!= "F" || col("o_totalprice") > 100).count())
  }

  test("stats table: footer-only sweep equals the full scan, with no parquet scan in its plan") {
    val dir = "/root/testdata/sf0.01"
    val out = graft.operators.Relational.srcStatsTable(spark, dir)
    // metadata-only: the stats job's input is a Dataset of file paths —
    // a parquet FileScan of the table would mean data pages were read
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Scan parquet"), plan.take(600))
    val got = out.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    import org.apache.spark.sql.functions.{count, lit, min, max}
    val expect = new graft.sources.GraftCatalog(spark, dir).table("orders")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), min("o_totalprice"), max("o_totalprice"))
      .orderBy("o_orderpriority").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq === expect.toSeq)
  }

  // ---- A35: durable multi-table tags --------------------------------

  test("a tag pins consistent epochs across tables; duplicates and bad lookups fail loudly") {
    import org.apache.spark.sql.functions.col
    val root = graft.sources.GraftSink.scratchDir + "/spec_tags"
    val rp = new org.apache.hadoop.fs.Path(root)
    rp.getFileSystem(spark.sessionState.newHadoopConf()).delete(rp, true)
    val orders = new GraftCatalog(spark, sfDir).table("orders")
    val nation = new GraftCatalog(spark, sfDir).table("nation")
    orders.where(col("o_orderstatus") === "O")
      .write.mode("overwrite").parquet(s"$root/orders.parquet")
    nation.write.mode("overwrite").parquet(s"$root/nation.parquet")
    val c1 = new GraftCatalog(spark, root)
    val epochs = c1.publishTag("release-1", Seq("orders", "nation"))
    assert(epochs.keySet === Set("orders", "nation"))
    val n1 = c1.table("orders").count()
    // both tables move after the tag
    orders.where(col("o_orderstatus") === "F")
      .write.mode("append").parquet(s"$root/orders.parquet")
    nation.limit(3).write.mode("append").parquet(s"$root/nation.parquet")
    val c2 = new GraftCatalog(spark, root)
    assert(c2.tableAtTag("release-1", "orders").count() === n1)
    assert(c2.tableAtTag("release-1", "nation").count() === 25)
    assert(c2.table("nation").count() === 28) // untagged read sees the append
    // a second tag captures the moved state; the first stays pinned
    c2.publishTag("release-2", Seq("orders", "nation"))
    assert(c2.tableAtTag("release-2", "nation").count() === 28)
    assert(c2.tableAtTag("release-1", "nation").count() === 25)
    // duplicate tag names collide loudly
    intercept[Exception] { c2.publishTag("release-1", Seq("orders")) }
    // a table the tag does not cover is a clear error
    val e = intercept[IllegalArgumentException] {
      c2.tableAtTag("release-1", "lineitem")
    }
    assert(e.getMessage.contains("does not cover"))
    intercept[IllegalArgumentException] { c2.readTag("no-such-tag") }
  }

  // ---- A30: change data feed ----------------------------------------

  test("append-only CDF: feed is exactly the appended rows, read churn-proportionally") {
    import org.apache.spark.sql.functions.col
    val root = graft.sources.GraftSink.scratchDir + "/cdf_append_spec"
    val rp = new org.apache.hadoop.fs.Path(root)
    rp.getFileSystem(spark.sessionState.newHadoopConf()).delete(rp, true)
    val tbl = s"$root/orders.parquet"
    val orders = new GraftCatalog(spark, sfDir).table("orders")
    orders.where(col("o_orderstatus") === "O").write.mode("overwrite").parquet(tbl)
    val v1 = new GraftCatalog(spark, root).publishSnapshot("orders")
    orders.where(col("o_orderstatus") === "F").write.mode("append").parquet(tbl)
    val c2 = new GraftCatalog(spark, root)
    val v2 = c2.publishSnapshot("orders")
    val feed = c2.changesBetween("orders", v1, v2)
    // inserts only, and exactly the appended 'F' rows
    assert(feed.where(col("change_type") =!= "insert").count() === 0)
    assert(feed.count() === orders.where(col("o_orderstatus") === "F").count())
    // churn-proportional: the feed's plan reads ONLY churned files —
    // epoch-1 files (common to both manifests) are never opened
    val commonFiles = c2.snapshotFilesAsOf("orders", v1).toSet
    assert(feed.inputFiles.forall(f => !commonFiles.contains(f)),
      "feed read a file common to both epochs")
    // identical epochs → empty but typed feed
    val empty = c2.changesBetween("orders", v2, v2)
    assert(empty.count() === 0 && empty.columns.contains("change_type"))
  }

  test("write-time CDF: pre-image + feed reconstructs the post-merge table exactly") {
    import org.apache.spark.sql.functions.{col, lit}
    val root = graft.sources.GraftSink.scratchDir + "/cdf_merge_spec"
    val rp = new org.apache.hadoop.fs.Path(root)
    rp.getFileSystem(spark.sessionState.newHadoopConf()).delete(rp, true)
    val tbl = s"$root/orders.parquet"
    val orders = new GraftCatalog(spark, sfDir).table("orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(tbl)
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val pre = spark.read.parquet(tbl).select(cols.map(col): _*).localCheckpoint(true)
    val updates = orders
      .where(col("o_orderstatus") === "F" && col("o_orderkey") % 100 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0))
      .unionByName(orders
        .where(col("o_orderstatus") === "O" && col("o_orderkey") % 100 === 50)
        .withColumn("o_orderstatus", lit("F")))
    val feed = graft.sources.GraftSink.mergeUpsertCdf(
      spark, tbl, updates, Seq("o_orderkey"), "o_orderstatus")
    val ins = feed.where(col("change_type") === "insert").select(cols.map(col): _*)
    val del = feed.where(col("change_type") === "delete").select(cols.map(col): _*)
    // updates surface as delete+insert pairs: equal counts here (no
    // pure inserts in this batch)
    assert(ins.count() === updates.count())
    assert(del.count() === updates.count())
    // multiset identity: pre ∖ deletes ⊎ inserts = post
    val post = spark.read.parquet(tbl).select(cols.map(col): _*)
    val rebuilt = pre.exceptAll(del).unionAll(ins)
    assert(rebuilt.exceptAll(post).count() === 0)
    assert(post.exceptAll(rebuilt).count() === 0)
    // untouched partition ('P') contributes nothing to the feed
    assert(feed.where(col("o_orderstatus") === "P").count() === 0)
  }

  test("A40: an exported snapshot manifest serves a FOREIGN reader exactly, immutably under later appends") {
    import graft.sources.GraftCatalog
    import org.apache.spark.sql.functions.col
    val root = graft.sources.GraftSink.scratchDir + "/exportdemo"
    val tbl = s"$root/orders.parquet"
    val rp = new org.apache.hadoop.fs.Path(root)
    rp.getFileSystem(spark.sessionState.newHadoopConf()).delete(rp, true)
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    orders.where(col("o_orderstatus") === "O")
      .write.mode("overwrite").parquet(tbl)
    val cat = new GraftCatalog(spark, root)
    val v1 = cat.publishSnapshot("orders")
    val manifest = s"$root/export_v1.json"
    val exported = cat.exportSnapshot("orders", v1, manifest)
    // a later epoch lands AFTER the export
    orders.where(col("o_orderstatus") === "F")
      .write.mode("append").parquet(tbl)
    new GraftCatalog(spark, root).publishSnapshot("orders")
    // FOREIGN-reader consumption: parse the JSON with plain Spark, read
    // exactly the listed parquet files — zero graft code on the path
    val m = spark.read.option("multiLine", true).json(manifest)
    val row = m.head()
    assert(row.getAs[String]("table") === "orders")
    assert(row.getAs[Long]("epoch") === v1)
    assert(row.getAs[String]("schema").contains("o_orderkey"))
    val files = row.getAs[scala.collection.Seq[String]]("files").toList
    assert(files.toSet === exported.toSet)
    val foreign = spark.read.parquet(files: _*)
    val expect = cat.tableAsOf("orders", v1)
    assert(foreign.collect().map(_.toString).sorted ===
      expect.collect().map(_.toString).sorted,
      "the exported file list must serve the pinned epoch exactly")
    // immutability: the post-export append is INVISIBLE to the export
    assert(foreign.where(col("o_orderstatus") === "F").count() === 0)
  }
}
