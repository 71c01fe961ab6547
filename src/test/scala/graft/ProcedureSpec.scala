package graft

import org.apache.spark.sql.functions._

/** SQL maintenance procedures (`CALL graft.system.*`) — the act side
  * of the advisor's act-clears-it signals, SQL-reachable: each ladder
  * step asserts the advisor FLAGS, the CALL ACTS, and the re-advise
  * CLEARS; refusal arms (lease gates) fire by name through SQL too.
  */
class ProcedureSpec extends SparkSpecBase {

  private def advice(root: String): Seq[graft.sources.GraftAdvisor.Advice] =
    graft.sources.GraftAdvisor.advise(spark, root)

  test("CALL ladder: advisor flags, CALL acts, advice clears — compact, vacuum, snapshots, restore, mor_compact; lease refusal by name") {
    val wh = graft.sources.GraftSink.scratchDir + "/proc_wh"
    val db = s"$wh/db"
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(wh), true)
    fs.mkdirs(new org.apache.hadoop.fs.Path(db))
    graft.sources.v2.GraftTableCatalog.register(spark, wh, "graftproc")
    val tPath = s"$db/t.parquet"
    // a deliberately fragmented table: 12 tiny files
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .repartition(12).write.parquet(tPath)
    // ── compact (flag read through SQL too: CALL advise) ──
    assert(advice(db).exists(_.rule == "compact"), "advisor must flag compact")
    def sqlAdvice(): Set[String] = spark.sql(
      "CALL graftproc.system.advise(namespace => 'db')")
      .collect().map(_.getString(1)).toSet
    assert(sqlAdvice().contains("compact"),
      "the advisor's flags must be SQL-readable")
    val res = spark.sql("CALL graftproc.system.compact(table => 'db.t')").head()
    assert(res.getLong(1) === 12L && res.getLong(2) < 12L,
      s"compact must shrink the file count: $res")
    assert(!advice(db).exists(_.rule == "compact"), "compact advice must clear")
    assert(!sqlAdvice().contains("compact"), "the SQL flag must clear too")
    // the procedure surface is discoverable
    val procs = spark.sql("SHOW PROCEDURES IN graftproc.system")
      .collect().map(_.mkString(",")).mkString(";")
    assert(procs.contains("compact") && procs.contains("advise"), procs)
    // values intact through the catalog (pins dropped by the CALL)
    assert(spark.sql("SELECT count(*) FROM graftproc.db.t").head().getLong(0) ===
      spark.read.parquet(s"$sfDir/orders.parquet").count())
    // ── publish + vacuum ──
    val sid = spark.sql(
      "CALL graftproc.system.publish_snapshot(table => 'db.t')").head().getLong(1)
    assert(sid >= 1L)
    // ── A69 publish-stats flag: a many-file table with no
    // stats-bearing manifest plans every scan from footers — the CALL
    // publish records the stats and the flag clears ──
    spark.read.parquet(s"$sfDir/customer.parquet")
      .repartition(9).write.parquet(s"$db/t3.parquet")
    assert(advice(db).exists(a => a.rule == "publish-stats" && a.table == "t3"),
      "advisor must flag footer-planned tables")
    spark.sql("CALL graftproc.system.publish_snapshot(table => 'db.t3')")
    assert(!advice(db).exists(a => a.rule == "publish-stats" && a.table == "t3"),
      "publish-stats advice must clear once a manifest records stats")
    // an unpublished straggler file → vacuum advice → CALL clears it
    spark.range(5).selectExpr("id AS o_orderkey", "id AS o_custkey",
      "cast(id as double) AS o_totalprice")
      .coalesce(1).write.mode("append").parquet(tPath)
    assert(advice(db).exists(_.rule == "vacuum"), "advisor must flag vacuum")
    val vres = spark.sql("CALL graftproc.system.vacuum(table => 'db.t')").head()
    assert(vres.getLong(1) >= 1L, s"vacuum must delete the straggler: $vres")
    assert(!advice(db).exists(_.rule == "vacuum"), "vacuum advice must clear")
    // ── snapshot-log growth + expire ──
    (1 to 11).foreach { _ =>
      spark.sql("CALL graftproc.system.publish_snapshot(table => 'db.t')") }
    assert(advice(db).exists(_.rule == "expire-snapshots"),
      "advisor must flag snapshot-log growth")
    val eres = spark.sql(
      "CALL graftproc.system.expire_snapshots(table => 'db.t', keep_last => 1)")
      .head()
    assert(eres.getLong(1) >= 11L, s"expire must drop old epochs: $eres")
    assert(!advice(db).exists(_.rule == "expire-snapshots"),
      "expire advice must clear")
    // ── restore: junk lands after the tip, restore removes it ──
    val tip = new graft.sources.GraftCatalog(spark, db).snapshotIds("t").last
    val nBefore = spark.sql("SELECT count(*) FROM graftproc.db.t").head().getLong(0)
    spark.range(7).selectExpr("id AS o_orderkey", "id AS o_custkey",
      "cast(id as double) AS o_totalprice")
      .coalesce(1).write.mode("append").parquet(tPath)
    val rres = spark.sql(
      s"CALL graftproc.system.restore(table => 'db.t', version => $tip)").head()
    assert(rres.getLong(2) > tip, s"restore must publish a new tip: $rres")
    assert(spark.sql("SELECT count(*) FROM graftproc.db.t").head().getLong(0)
      === nBefore, "restore must drop the post-tip junk rows")
    // ── mor ladder: erase → mor-unserved flag → mor_compact clears ──
    graft.sources.GraftMor.morErase(spark, tPath,
      spark.range(1).selectExpr("0 AS o_orderkey"), Seq("o_orderkey"))
    assert(advice(db).exists(_.rule == "mor-unserved"),
      "advisor must flag the live equality sidecar")
    val mres = spark.sql(
      "CALL graftproc.system.mor_compact(table => 'db.t')").head()
    assert(mres.getString(1) === "folded")
    assert(!advice(db).exists(_.rule == "mor-unserved"),
      "mor advice must clear after the fold")
    assert(spark.sql(
      "SELECT count(*) FROM graftproc.db.t WHERE o_orderkey = 0").head()
      .getLong(0) === 0L, "the erased key must be physically gone")
    // ── refusal arms through SQL ──
    val lease = graft.sources.GraftLease.acquire(spark, tPath)
    try {
      val e = intercept[Exception](spark.sql(
        "CALL graftproc.system.compact(table => 'db.t')"))
      assert(chainMsg(e).contains("lease"), chainMsg(e))
    } finally graft.sources.GraftLease.release(spark, tPath, lease)
    val e2 = intercept[Exception](spark.sql(
      "CALL graftproc.system.nope(table => 'db.t')"))
    assert(chainMsg(e2).contains("no such procedure") ||
      chainMsg(e2).toLowerCase.contains("procedure"), chainMsg(e2))
    val e3 = intercept[Exception](spark.sql(
      "CALL graftproc.system.compact(table => 'db.missing')"))
    assert(chainMsg(e3).toLowerCase.contains("table"), chainMsg(e3))
    // rebucket refuses on a table with no declared layout
    val e4 = intercept[Exception](spark.sql(
      "CALL graftproc.system.rebucket(table => 'db.t')"))
    assert(chainMsg(e4).contains("layout"), chainMsg(e4))
  }

  test("CALL graft.system.analyze: persisted NDV serves CBO on string keys; DESCRIBE EXTENDED shows stats") {
    val wh = graft.sources.GraftSink.scratchDir + "/analyze_wh"
    val db = s"$wh/db"
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(wh), true)
    fs.mkdirs(new org.apache.hadoop.fs.Path(db))
    graft.sources.v2.GraftTableCatalog.register(spark, wh, "graftan")
    val cPath = s"$db/cust.parquet"
    spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
      .coalesce(2).write.parquet(cPath)
    val total = spark.read.parquet(cPath).count()
    // before analyze, with CBO on: the string column has NO stats
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      def attrStats = spark.sql("SELECT * FROM graftan.db.cust")
        .queryExecution.optimizedPlan.collectFirst {
          case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
            r.stats
        }.get.attributeStats
      assert(!attrStats.exists(_._1.name == "c_mktsegment"),
        "string columns must claim nothing before ANALYZE")
      val ares = spark.sql(
        "CALL graftan.system.analyze(table => 'db.cust')").head()
      assert(ares.getLong(1) === total, s"analyze row count: $ares")
      spark.sql("REFRESH TABLE graftan.db.cust")
      val seg = attrStats.find(_._1.name == "c_mktsegment").map(_._2)
      assert(seg.isDefined, "ANALYZE must give the string key column stats")
      val ndv = seg.get.distinctCount.get.toLong
      assert(ndv >= 4 && ndv <= 7, s"c_mktsegment NDV ≈ 5, got $ndv")
      // CBO now estimates string-key equality selectivity from 1/ndv
      val est = spark.sql(
        "SELECT * FROM graftan.db.cust WHERE c_mktsegment = 'BUILDING'")
        .queryExecution.optimizedPlan.stats.rowCount
      assert(est.isDefined && est.get > 0 && est.get < BigInt(total),
        s"string-key selectivity must be estimated, got $est of $total")
      // DESCRIBE EXTENDED surfaces the persisted stats
      val props = spark.sql("SHOW TBLPROPERTIES graftan.db.cust")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props.get("stats.rows").contains(total.toString), props.toString)
      assert(props.contains("stats.analyzedAt"), props.toString)
    } finally spark.conf.unset("spark.sql.cbo.enabled")
  }

  private def chainMsg(t: Throwable): String = {
    var m = ""
    var cur = t
    while (cur != null) { m += " " + String.valueOf(cur.getMessage); cur = cur.getCause }
    m
  }
}
