package graft

import graft.operators.{Analytic, Relational}
import graft.sources.GraftCatalog
import org.apache.spark.sql.functions._

/** Error-bound evidence for the two rows-only sketch queries: the
  * sketches have no cross-engine oracle (HLL registers and t-digest
  * internals are engine-specific), so their correctness claim is an
  * accuracy band against the EXACT computation on the same corpus.
  */
class SketchSpec extends SparkSpecBase {

  test("approx count-distinct lands within 5% of exact") {
    val apx = Relational.qApproxCountdParts(spark, sfDir).collect()(0).getLong(0)
    val exact = new GraftCatalog(spark, sfDir).table("lineitem")
      .agg(count_distinct(col("l_partkey")).as("n"))
      .collect()(0).getLong(0)
    val rel = math.abs(apx - exact).toDouble / exact
    assert(rel < 0.05, s"approx=$apx exact=$exact rel=$rel")
  }

  test("unioned HLL sketches land within 5% of exact and agree with the direct sketch") {
    val row = Analytic.qHllUnion(spark, sfDir).collect()(0)
    val apx = row.getLong(0)
    val orders = new GraftCatalog(spark, sfDir).table("orders")
    val exact = orders.agg(count_distinct(col("o_custkey"))).collect()(0).getLong(0)
    val rel = math.abs(apx - exact).toDouble / exact
    assert(rel < 0.05, s"union-of-sketches=$apx exact=$exact rel=$rel")
    // mergeability: union of per-group sketches = one direct sketch
    // over the same rows (identical default lgK), estimate-equal
    val direct = orders
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))))
      .collect()(0).getLong(0)
    assert(apx === direct, s"union=$apx direct=$direct")
    assert(row.getLong(2) > 1, "more than one sketch merged")
  }

  test("theta set-op estimates match the exact INTERSECT/EXCEPT/UNION cardinalities") {
    val row = Analytic.qThetaOverlap(spark, sfDir).collect()(0)
    val orders = new GraftCatalog(spark, sfDir).table("orders")
    def cohort(st: String) = orders.where(col("o_orderstatus") === st)
      .select("o_custkey").distinct()
    val f = cohort("F").collect().map(_.getLong(0)).toSet
    val o = cohort("O").collect().map(_.getLong(0)).toSet
    // below the sketch's nominal entries the estimates are exact
    def band(apx: Long, exact: Int, what: String): Unit =
      assert(math.abs(apx - exact).toDouble / math.max(exact, 1) < 0.05,
        s"$what: $apx vs $exact")
    band(row.getLong(0), (f & o).size, "both")
    band(row.getLong(1), (f | o).size, "either")
    band(row.getLong(2), (f -- o).size, "f_only")
  }

  test("approx percentiles land within 2% of exact per group") {
    val apx = Analytic.qApproxPercentile(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = new GraftCatalog(spark, sfDir).table("lineitem")
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.5, 0.95))").as("p"))
      .collect().map(r => r.getString(0) ->
        (r.getSeq[Double](1).head, r.getSeq[Double](1)(1))).toMap
    exact.foreach { case (k, (p50, p95)) =>
      assert(math.abs(apx(k)._1 - p50) / p50 < 0.02, s"$k p50: ${apx(k)._1} vs $p50")
      assert(math.abs(apx(k)._2 - p95) / p95 < 0.02, s"$k p95: ${apx(k)._2} vs $p95")
    }
  }
}
