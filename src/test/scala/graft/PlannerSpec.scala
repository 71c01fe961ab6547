package graft

import graft.plans.GraftPlanner
import org.apache.spark.sql.functions._

/** B71: stats-driven join planning — listing-size evidence restores
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

  test("B72: the skew profile decides salting; salted and plain joins agree") {
    import spark.implicits._
    // planted skew: one key holds half the fact
    val hot = (0L until 5000L).map(i => (1L, i))
    val cold = (0L until 5000L).map(i => (2L + (i % 500), i))
    val fact = (hot ++ cold).toDF("k", "v").repartition(8)
    val build = (1L to 501L).map(i => (i, s"dim_$i")).toDF("bk", "name")
    val salt = GraftPlanner.suggestedSalt(fact, "k")
    assert(salt > 1, s"hot key must salt, got $salt")
    // a uniform fact must NOT pay the explode tax
    val uniform = (0L until 5000L).map(i => (i % 500, i)).toDF("k", "v")
    assert(GraftPlanner.suggestedSalt(uniform, "k") === 1)
    // the cap bounds build-side amplification
    assert(GraftPlanner.suggestedSalt(fact, "k", cap = 4) === 4)
    // identity: salted result == plain join result
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .orderBy("name").collect().map(_.toString).toSeq
    val salted = GraftPlanner.saltedJoinAuto(fact, build, "k", "bk")
    assert(salted.columns.toSeq === Seq("k", "v", "bk", "name"),
      "salt plumbing must not leak into the output")
    assert(agg(salted) === agg(fact.join(build, col("k") === col("bk"))))
  }
}
