package graft

import graft.plans.GraftPlanner
import org.apache.spark.sql.functions._

/** B70: stats-driven join planning — listing-size evidence restores
  * per-join broadcasting when the global threshold is disabled, and
  * refuses to broadcast what the listing says is big.
  */
class PlannerSpec extends SparkSpecBase {

  test("listing-size evidence drives the broadcast decision under a disabled threshold") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val nationPath = s"$sfDir/nation.parquet"
      val fact = spark.read.parquet(s"$sfDir/customer.parquet")
        .withColumnRenamed("c_nationkey", "n_nationkey")
      def planOf(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.executedPlan.toString
      // the blanket-disabled baseline: no broadcast anywhere
      val plain = fact.join(spark.read.parquet(nationPath), Seq("n_nationkey"))
      assert(!planOf(plain).contains("BroadcastHashJoin"), planOf(plain).take(800))
      // evidence says nation is tiny → explicit broadcast restored
      val stats = GraftPlanner.joinWithStats(spark, fact, nationPath, Seq("n_nationkey"))
      assert(planOf(stats).contains("BroadcastHashJoin"), planOf(stats).take(800))
      // evidence says it exceeds the budget → no forced broadcast
      val big = GraftPlanner.joinWithStats(spark, fact, nationPath,
        Seq("n_nationkey"), budgetBytes = 1L)
      assert(!planOf(big).contains("BroadcastHashJoin"), planOf(big).take(800))
      // strategy choice never changes the answer
      val a = stats.groupBy("n_name").agg(count(lit(1)).as("n"))
        .orderBy("n_name").collect().map(_.toString).toSeq
      val b = plain.groupBy("n_name").agg(count(lit(1)).as("n"))
        .orderBy("n_name").collect().map(_.toString).toSeq
      assert(a === b)
      // and the size probe itself is sane
      assert(GraftPlanner.tableBytes(spark, nationPath) > 0)
      assert(GraftPlanner.tableBytes(spark, s"$sfDir/lineitem.parquet") >
        GraftPlanner.tableBytes(spark, nationPath))
    } finally spark.conf.set(key, prev)
  }
}
