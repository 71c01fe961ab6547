package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (getOrCreate → one JVM-wide
  * session; suites run sequentially under sbt).
  */
trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  val sfDir = "/root/testdata/sf0.001"

  /** Collect every node of a physical plan, descending through the
    * AQE wrappers (`AdaptiveSparkPlanExec`, `QueryStageExec`) that a
    * plain `plan.collect` treats as leaves — but NOT into
    * `InMemoryTableScanExec`'s cached plan, so "zero FileSourceScan
    * nodes" asserts that all reads go through the cache.
    */
  def allPlanNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val kids = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(s.plan)
      case o => o.children
    }
    p +: kids.flatMap(allPlanNodes)
  }
}
