package graft

import graft.operators.SemDedup
import org.apache.spark.sql.functions._

class SemDedupSpec extends SparkSpecBase {

  test("baked sf0.01 centroids match what training produces (oracle drift guard)") {
    val trained = SemDedup.trainCentroids(spark, "/root/testdata/sf0.01")
    assert(trained.toSeq === SemDedup.Sf001Centroids,
      "SemDedup.Sf001Centroids is stale — regenerate via " +
        "printSf001Centroids (the baked DuckDB oracle follows automatically)")
  }

  test("semantic dedup: every duplicate names a smaller-id cluster-mate above tau") {
    val dir = "/root/testdata/sf0.01"
    val out = SemDedup.semanticDedup(spark, dir).cache()
    val n = out.count()
    assert(n === 500)
    val dups = out.where(col("is_dup") === 1)
    assert(dups.count() > 0, "tau should remove something at sf0.01")
    assert(out.where(col("is_dup") === 0 && col("dup_of").isNotNull).count() === 0)
    // dup_of is a smaller id in the SAME cluster, and itself could be
    // a dup of something even smaller (pair rule, not transitive rep)
    val byId = out.select(col("vec_id"), col("cluster")).withColumnRenamed("cluster", "rep_cluster")
    val joined = dups.join(byId.withColumnRenamed("vec_id", "dup_of"), Seq("dup_of"))
    assert(joined.where(col("dup_of") >= col("vec_id")).count() === 0)
    assert(joined.where(col("cluster") =!= col("rep_cluster")).count() === 0)
    out.unpersist()
  }

  test("assignment is map-side: no shuffle before the pair join") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val asg = SemDedup.assigned(spark, sfDir, SemDedup.Sf001Centroids)
    val plan = asg.queryExecution.executedPlan
    assert(plan.collect { case x: ShuffleExchangeExec => x }.isEmpty,
      plan.toString.take(600))
  }

  test("quantization and integer distances are partition-layout invariant") {
    // same trained centroids from a different partitioning of the input
    val dir = "/root/testdata/sf0.01"
    val a = SemDedup.trainCentroids(spark, dir)
    val b = SemDedup.trainCentroids(spark, dir) // idempotent re-run
    assert(a.toSeq === b.toSeq)
  }
}
