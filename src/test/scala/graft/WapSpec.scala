package graft

import graft.sources.GraftCatalog
import graft.sources.GraftCatalog.AuditRule
import org.apache.spark.sql.functions._

/** A38: write-audit-publish — the staged-commit gate. A dirty batch
  * must be blocked with its fired rules named, leave the published
  * log untouched, and be reclaimable by vacuum; a clean batch lands;
  * the time-travel log stays linear throughout.
  */
class WapSpec extends SparkSpecBase {

  private val rules = Seq(
    AuditRule("nonpositive_price", col("o_totalprice") <= 0.0),
    AuditRule("null_custkey", col("o_custkey").isNull))

  private def freshRoot(name: String): (String, String) = {
    val root = graft.sources.GraftSink.scratchDir + s"/wap_$name"
    val rp = new org.apache.hadoop.fs.Path(root)
    rp.getFileSystem(spark.sessionState.newHadoopConf()).delete(rp, true)
    (root, s"$root/orders.parquet")
  }

  private def orders = new GraftCatalog(spark, sfDir).table("orders")

  test("dirty batch: blocked with named rules, tip unchanged, files reclaimed by vacuum") {
    val (root, tbl) = freshRoot("dirty")
    orders.where(col("o_orderstatus") === "O")
      .write.mode("overwrite").parquet(tbl)
    val v1 = new GraftCatalog(spark, root).publishAudited("orders", rules)
      .getOrElse(fail("base batch must publish"))
    // stage a batch violating BOTH rules on different rows
    orders.where(col("o_orderstatus") === "P")
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 2 === 0, -abs(col("o_totalprice")))
          .otherwise(col("o_totalprice")))
      .withColumn("o_custkey",
        when(col("o_orderkey") % 2 =!= 0, lit(null: java.lang.Long))
          .otherwise(col("o_custkey")))
      .write.mode("append").parquet(tbl)
    val c = new GraftCatalog(spark, root)
    val quarantine = c.publishAudited("orders", rules)
      .swap.getOrElse(fail("dirty batch must be rejected"))
    // every violating row is in the manifest with its fired rules
    val reasons = quarantine.select("reasons").distinct()
      .collect().map(_.getString(0)).toSet
    assert(reasons === Set("nonpositive_price", "null_custkey"), reasons)
    assert(quarantine.count() === orders.where(col("o_orderstatus") === "P").count())
    // the published log never moved
    assert(c.snapshotIds("orders") === Seq(v1), "tip must be unchanged")
    // published readers see only the base
    assert(c.tableAsOf("orders", v1)
      .where(col("o_orderstatus") === "P").count() === 0)
    // vacuum reclaims exactly the rejected files; a plain read then
    // equals the published tip again
    val reclaimed = c.vacuum("orders")
    assert(reclaimed.nonEmpty, "vacuum must reclaim the rejected batch")
    val back = new GraftCatalog(spark, root).table("orders")
    assert(back.where(col("o_orderstatus") === "P").count() === 0)
    assert(back.count() === c.tableAsOf("orders", v1).count())
  }

  test("clean batches land and the log stays linear; re-running with nothing staged is a no-op") {
    val (root, tbl) = freshRoot("clean")
    orders.where(col("o_orderstatus") === "O")
      .write.mode("overwrite").parquet(tbl)
    val v1 = new GraftCatalog(spark, root).publishAudited("orders", rules)
      .getOrElse(fail("base must publish"))
    orders.where(col("o_orderstatus") === "F")
      .write.mode("append").parquet(tbl)
    val c = new GraftCatalog(spark, root)
    val v2 = c.publishAudited("orders", rules)
      .getOrElse(fail("clean batch must publish"))
    assert(Seq(v1, v2) === Seq(1L, 2L), "log must be linear with no gaps")
    assert(c.snapshotIds("orders") === Seq(1L, 2L))
    // the new tip includes the batch; the old epoch still reads clean
    assert(c.tableAsOf("orders", v2).where(col("o_orderstatus") === "F").count() ===
      orders.where(col("o_orderstatus") === "F").count())
    assert(c.tableAsOf("orders", v1).where(col("o_orderstatus") === "F").count() === 0)
    // nothing staged → the existing tip comes back, no duplicate epoch
    val again = new GraftCatalog(spark, root).publishAudited("orders", rules)
    assert(again === Right(v2))
    assert(new GraftCatalog(spark, root).snapshotIds("orders") === Seq(1L, 2L))
  }

  test("schema gate: a breaking staged drift is refused by name; an additive column passes") {
    import spark.implicits._
    val (root, tbl) = freshRoot("schema")
    orders.where(col("o_orderstatus") === "O")
      .write.mode("overwrite").parquet(tbl)
    new GraftCatalog(spark, root).publishAudited("orders", rules)
      .getOrElse(fail("base must publish"))
    // staged batch RETYPES a column → loud refusal naming the change,
    // log untouched
    orders.where(col("o_orderstatus") === "F")
      .withColumn("o_totalprice", col("o_totalprice").cast("string"))
      .write.mode("append").parquet(tbl)
    val e = intercept[IllegalStateException] {
      new GraftCatalog(spark, root).publishAudited("orders", rules)
    }
    assert(e.getMessage.contains("o_totalprice"), e.getMessage)
    assert(new GraftCatalog(spark, root).snapshotIds("orders") === Seq(1L))
    new GraftCatalog(spark, root).vacuum("orders")
    // additive nullable column is compatible: audits and publishes
    orders.where(col("o_orderstatus") === "F")
      .withColumn("o_note", lit("late").cast("string"))
      .write.mode("append").parquet(tbl)
    val v2 = new GraftCatalog(spark, root).publishAudited("orders", rules)
    assert(v2.isRight, s"additive column must pass: $v2")
    assert(new GraftCatalog(spark, root).snapshotIds("orders") === Seq(1L, 2L))
  }

  test("a rejected batch left on disk keeps blocking later publishes until reclaimed") {
    val (root, tbl) = freshRoot("sticky")
    orders.where(col("o_orderstatus") === "O")
      .write.mode("overwrite").parquet(tbl)
    new GraftCatalog(spark, root).publishAudited("orders", rules)
      .getOrElse(fail("base must publish"))
    orders.where(col("o_orderstatus") === "P")
      .withColumn("o_totalprice", -abs(col("o_totalprice")))
      .write.mode("append").parquet(tbl)
    assert(new GraftCatalog(spark, root).publishAudited("orders", rules).isLeft)
    // a clean batch arrives while the dirty one still sits unpublished:
    // the gate must keep refusing — otherwise the dirty rows would ride
    // in on the clean batch's manifest
    orders.where(col("o_orderstatus") === "F")
      .write.mode("append").parquet(tbl)
    val c = new GraftCatalog(spark, root)
    val still = c.publishAudited("orders", rules)
    assert(still.isLeft, "unpublished dirty rows must keep blocking the gate")
    c.vacuum("orders") // reclaims dirty AND clean (neither published)
    orders.where(col("o_orderstatus") === "F")
      .write.mode("append").parquet(tbl)
    assert(new GraftCatalog(spark, root).publishAudited("orders", rules).isRight)
  }
}
