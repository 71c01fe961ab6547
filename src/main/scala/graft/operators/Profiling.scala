package graft.operators

import graft.GraftSession.GrainOps
import graft.sources.GraftCatalog
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.B pipeline utilities: table profiling and stratified sampling —
  * the data-quality sweep a 100 TB ingest runs before anything else.
  */
object Profiling {

  private def orders(s: SparkSession, dir: String): DataFrame =
    new GraftCatalog(s, dir).table("orders")

  /** B38: column profile of the orders table — per column: row count,
    * null count, exact distinct count, min/max rendered to strings
    * with type-aware, engine-portable formatting (doubles via
    * DECIMAL(18,2), timestamps via date_format — raw double→string
    * diverges between engines).
    *
    * Plan shape: one NARROW aggregate per column, union'd. The
    * tempting one-pass alternative (all count_distincts in a single
    * agg) makes Spark plan an Expand that replicates every row once
    * per distinct-column before the shuffle — at 100 TB that shuffles
    * 7× the table. The union form shuffles only each column's
    * distinct values (the partial aggregate collapses the rest
    * map-side) and each branch's scan prunes to a single column;
    * the branches run as independent stages of one job.
    */
  def profileOrders(s: SparkSession, dir: String): DataFrame = {
    def profile(name: String, mn: Column, mx: Column): DataFrame =
      orders(s, dir).select(col(name))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col(name).isNull, 1L).otherwise(0L)).as("n_nulls"),
          count_distinct(col(name)).as("n_distinct"),
          mn.as("min_s"), mx.as("max_s"))
        .select(lit(name).as("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_s"), col("max_s"))
    def plain(name: String): DataFrame =
      profile(name, min(col(name)).cast("string"), max(col(name)).cast("string"))
    val parts = Seq(
      plain("o_orderkey"),
      plain("o_custkey"),
      plain("o_orderstatus"),
      profile("o_totalprice",
        min(col("o_totalprice")).cast("decimal(18,2)").cast("string"),
        max(col("o_totalprice")).cast("decimal(18,2)").cast("string")),
      profile("o_orderdate",
        date_format(min(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss"),
        date_format(max(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss")),
      plain("o_orderpriority"))
    parts.reduce(_.unionAll(_)).orderBy("col_name")
  }

  /** B37: stratified deterministic sampling — a different sampling
    * rate per stratum (order status F→5%, O→10%, P→20%), selected by
    * the same multiplicative-hash predicate as B29 so the sample is
    * reproducible in any engine, needs no RNG state, and is stable
    * under repartitioning. Emitted as per-stratum accounting (totals,
    * sampled counts, achieved micro-rate, sampled revenue through the
    * exact-decimal sum) rather than the sampled rows themselves.
    */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val rate = when(col("o_orderstatus") === "F", 50L)
      .when(col("o_orderstatus") === "O", 100L)
      .otherwise(200L)
    val sampled = pmod(col("o_orderkey") * 2654435761L, lit(1000)) < rate
    orders(s, dir)
      .groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(sampled, 1L).otherwise(0L)).as("n_sampled"),
        floor(sum(when(sampled, 1L).otherwise(0L)) * 1000000.0 / count(lit(1)))
          .cast("long").as("rate_micro"),
        round(sum(when(sampled, col("o_totalprice")).otherwise(lit(0.0))
          .cast("decimal(28,6)")).cast("double"), 2).as("sampled_revenue"))
      .orderBy("o_orderstatus")
  }

  /** B59: data-quality constraint report — the dbt-test/Deequ-style
    * gate a 100 TB ingest runs before publishing a table: uniqueness,
    * referential integrity, domain membership, and a range rule, each
    * as one narrow aggregate (never a row-level materialization of
    * violations — the report is O(constraints), not O(rows)).
    * Uniqueness collapses map-side via partial distinct; the FK check
    * is a broadcast anti-join that only counts. A violating row is
    * counted once per constraint it breaks.
    */
  def constraintReport(s: SparkSession, dir: String): DataFrame = {
    val c = new graft.sources.GraftCatalog(s, dir)
    val o = c.table("orders")
    def row(name: String, agg: DataFrame) =
      agg.select(lit(name).as("rule"), col("violations"))
    val uniq = row("orderkey_unique", o.agg(
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("violations")))
    val fk = row("custkey_in_customer", o
      .join(broadcast(c.table("customer").select("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("violations")))
    val domain = row("status_in_domain", o.agg(
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
        .as("violations")))
    val range = row("totalprice_positive", o.agg(
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("violations")))
    uniq.unionByName(fk).unionByName(domain).unionByName(range)
      .withColumn("pass", (col("violations") === 0).cast("int"))
      .orderBy("rule")
  }

  /** B68: join-key SKEW profile — the pre-join health check that
    * decides between a plain shuffle join, AQE skew splitting, and
    * B27's explicit salting: the per-key count distribution of a
    * prospective join key (lineitem.l_suppkey) collapsed to ONE
    * diagnostic row — hottest key and its corpus share, mean key
    * load, the hot key's multiple of the mean, and the salt factor
    * that would level it (⌈top_cnt / mean⌉ — exactly B27's sub-key
    * count rule).
    *
    * Shape: one map-combinable key aggregate (|keys| rows — the only
    * pass over data), then ONE single-row aggregate over the counts;
    * the argmax rides max(struct(cnt, -key)) so ties break to the
    * smallest key. All metrics are exact integer arithmetic
    * (micro-ratios via DECIMAL div) — no percentile interpolation, no
    * FP — so the row is value-exact in any engine.
    */
  def skewProfile(s: SparkSession, dir: String): DataFrame = {
    val counts = new graft.sources.GraftCatalog(s, dir).table("lineitem")
      .groupBy("l_suppkey").agg(count(lit(1)).as("cnt"))
    counts
      .agg(
        count(lit(1)).as("n_keys"),
        sum("cnt").as("n_rows"),
        max(struct(col("cnt"), (-col("l_suppkey")).cast("long").as("nk"))).as("top"))
      .selectExpr(
        "n_keys", "n_rows",
        "-top.nk AS top_key",
        "top.cnt AS top_cnt",
        "(top.cnt * 1000000L) div n_rows AS top_share_micro",
        "(n_rows * 1000000L) div n_keys AS mean_cnt_micro",
        "(top.cnt * 1000000L) div (n_rows div n_keys) AS skew_ratio_micro",
        "greatest(1L, (top.cnt * n_keys + n_rows - 1L) div n_rows) AS suggested_salt")
  }

  /** B67: pairwise Pearson correlation of lineitem's numeric columns —
    * the column-dependency screen (redundant features, derived-column
    * detection) a profiling sweep adds on top of B38's per-column
    * stats. One scan, one single-row aggregate; everything after is
    * driver-scale.
    *
    * Exactness: the five moment sums are computed over exact
    * cents-integers (the DECIMAL(28,2)·100 trick) in DECIMAL(38,0) —
    * partial aggregation is exact integer addition, so the sums are
    * partition-layout invariant and 128-bit-safe at 100 TB row counts
    * (n·Σx² ≈ 1e36 fits in 38 digits). The final correlation needs a
    * square root, so it leaves integer space — but UNLIKE ln (E8's
    * documented ULP caveat), every op after the exact sums
    * (int→double cast, sqrt, multiply, divide) is IEEE-754
    * CORRECTLY ROUNDED: identical inputs give bit-identical doubles
    * in every conforming engine, so the micro-floored correlation is
    * value-exact cross-engine with no boundary assumption. The
    * oracle mirrors the expression shape operation for operation.
    *
    * Plan: ONE aggregate over a 3-column scan produces every moment
    * (map-side partials, a single-row exchange); the three output
    * pairs are projections of that row. No per-pair rescan, no
    * VectorAssembler-style row materialization.
    */
  def profileCorrelation(s: SparkSession, dir: String): DataFrame = {
    def cents(c: String) =
      expr(s"CAST(CAST($c AS DECIMAL(28,2)) * 100 AS BIGINT)")
    val li = new graft.sources.GraftCatalog(s, dir).table("lineitem")
      .select(cents("l_quantity").as("x1"),
        cents("l_extendedprice").as("x2"),
        cents("l_discount").as("x3"))
    // widen ONE operand BEFORE the product: x_i·x_j in BIGINT would
    // silently wrap (non-ANSI) once cents magnitudes pass ~3e9 — the
    // 128-bit safety must cover the per-row products, not just the sums
    def dsum(e: String) = sum(expr(s"CAST($e AS DECIMAL(38,0))"))
    def dprod(a: String, b: String) =
      sum(expr(s"CAST($a AS DECIMAL(38,0)) * $b"))
    val m = li.agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      dsum("x1").as("s1"), dsum("x2").as("s2"), dsum("x3").as("s3"),
      dprod("x1", "x1").as("s11"), dprod("x2", "x2").as("s22"),
      dprod("x3", "x3").as("s33"), dprod("x1", "x2").as("s12"),
      dprod("x1", "x3").as("s13"), dprod("x2", "x3").as("s23"))
    // nullif guards a zero-variance column: sqrt(0)·sqrt(·) = 0 would
    // make the division ±Infinity/NaN, where Spark's non-ANSI BIGINT
    // cast yields null but DuckDB ERRORS — emit NULL identically in
    // both engines instead of diverging on degenerate input
    def corr(si: String, sj: String, sij: String, sii: String, sjj: String) =
      s"""CAST(floor(CAST(n * $sij - $si * $sj AS DOUBLE) * 1e6 /
         nullif(sqrt(CAST(n * $sii - $si * $si AS DOUBLE)) *
                sqrt(CAST(n * $sjj - $sj * $sj AS DOUBLE)), 0.0D)) AS BIGINT)"""
    // ONE projection over the single aggregate row (stack, not a
    // union of three selects — a union would embed the aggregate
    // subtree once per pair)
    m.selectExpr(
      s"""stack(3,
        'l_discount', 'l_extendedprice', ${corr("s3", "s2", "s23", "s33", "s22")},
        'l_quantity', 'l_discount', ${corr("s1", "s3", "s13", "s11", "s33")},
        'l_quantity', 'l_extendedprice', ${corr("s1", "s2", "s12", "s11", "s22")}
      ) AS (col_x, col_y, corr_micro)""")
      .orderBy("col_x", "col_y")
  }

  /** B77: contingency matrix + chi-square contributions — the
    * categorical-association screen (is `source` independent of
    * `lang`? which cells drive the dependence?) that completes B67's
    * numeric-correlation profile on the categorical side. The full
    * source×lang GRID is materialized (zero cells matter to the
    * statistic — a missing combination IS signal), each cell carrying
    * observed count, expected count and its chi-square contribution.
    *
    * Exactness: expected = rs·cs/N and contribution =
    * (o·N − rs·cs)²/(rs·cs·N) are RATIONAL — both are emitted
    * micro-floored per cell via DECIMAL(38,0) integer division
    * (numerators up to (oN)² ≈ 10¹⁹ overflow BIGINT, so the widening
    * happens BEFORE the square — the B67 lesson), identical in any
    * engine; the total statistic is the exact integer sum of the
    * per-cell micro contributions. Shapes: one count aggregate at
    * cell grain (map-combinable — the only pass over data), then
    * everything runs on broadcast |sources|×|langs| slivers.
    */
  def contingency(s: SparkSession, dir: String): DataFrame = {
    val d = new graft.sources.GraftCatalog(s, dir).table("documents")
      .select(col("source"), col("lang"))
    // the cell grid is the ONE data pass; every marginal is an exact
    // sum over the cached |sources|×|langs| sliver, never a re-scan
    val cells = d.groupBy("source", "lang").agg(count(lit(1)).as("o")).grainCache()
    val rs = cells.groupBy("source").agg(sum("o").as("rs"))
    val cs = cells.groupBy("lang").agg(sum("o").as("cs"))
    val n = cells.agg(sum("o").as("n"))
    rs.crossJoin(broadcast(cs)).crossJoin(broadcast(n)) // the full grid
      .join(broadcast(cells), Seq("source", "lang"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      // one operand widened BEFORE every product (o·N and diff² pass
      // 2^63 long before the counts do), `div` floors exactly
      .withColumn("diff",
        expr("CAST(o AS DECIMAL(38,0)) * n - CAST(rs AS DECIMAL(38,0)) * cs"))
      .select(col("source"), col("lang"), col("o"),
        expr("CAST((CAST(rs AS DECIMAL(38,0)) * cs * 1000000) div n AS BIGINT)")
          .as("expected_micro"),
        // diff²·10⁶ must stay inside DECIMAL(38,0): |diff| < 10¹⁶
        // guarantees it (always true while N ≤ 10⁸ rows, since
        // |diff| ≤ N²). Beyond that the numerator would overflow and
        // non-ANSI mode returns silent NULLs — refuse loudly instead;
        // the exact-decimal comparison guard is free per cell.
        expr("""CAST(CASE WHEN assert_true(abs(diff) < 10000000000000000,
                 'chi2 numerator would overflow DECIMAL(38,0): |o*N - rs*cs| >= 1e16') IS NULL
            THEN (diff * diff * 1000000) div (CAST(rs AS DECIMAL(38,0)) * cs * n) END AS BIGINT)""")
          .as("chi2_contrib_micro"))
      .orderBy("source", "lang")
  }

  /** B76: validate-and-QUARANTINE — B59's constraint report made
    * row-level: every row is checked against the rule set and the
    * violators come back as a quarantine manifest (key, the csv of
    * fired rules, rule count) — the reviewable artifact a data
    * contract produces, where B59 only counts. Shapes: rules are one
    * projection over the scan (map-side; the referential rule rides a
    * broadcast LEFT join's null probe); only violators survive the
    * filter, so the manifest is O(violations), and the downstream
    * "clean" table is the anti-set by key. `concat_ws` skips NULLs
    * identically in both engines, so the fired-rule csv is
    * value-exact with no list machinery.
    */
  def quarantine(s: SparkSession, dir: String): DataFrame = {
    val c = new graft.sources.GraftCatalog(s, dir)
    val custKeys = c.table("customer").select(col("c_custkey"))
    val o = orders(s, dir)
      .join(broadcast(custKeys), col("o_custkey") === col("c_custkey"), "left")
    val rHigh = when(col("o_totalprice") > 400000.0, lit("high_value"))
    val rPend = when(col("o_orderstatus") === "P" && col("o_totalprice") > 300000.0,
      lit("large_pending"))
    val rOrph = when(col("c_custkey").isNull, lit("orphan_customer"))
    o.select(col("o_orderkey"),
        concat_ws(",", rHigh, rPend, rOrph).as("reasons"),
        (when(rHigh.isNotNull, 1).otherwise(0) +
         when(rPend.isNotNull, 1).otherwise(0) +
         when(rOrph.isNotNull, 1).otherwise(0)).cast("long").as("n_reasons"))
      .where(col("n_reasons") > 0L)
      .orderBy("o_orderkey")
  }

  /** B70: robust outlier profile — per group: median, MAD (median
    * absolute deviation) and the count of rows beyond the classic
    * 3·1.4826·MAD fence. The robust fence is the profiling answer to
    * heavy-tailed money columns, where mean/stddev fences are dragged
    * by the very outliers they should catch.
    *
    * Exactness: everything stays in INTEGER space. Money → exact
    * cents (the DECIMAL cast trick), doubled so the even-count median
    * interpolation (a+b)/2 lands on an integer; deviations doubled
    * again for the MAD's own interpolation; the fence comparison
    * dev > 3·1.4826·mad becomes dev_c2·2·10000 > 44478·mad_c4 —
    * pure BIGINT, no float ever compared, so the oracle matches
    * bit-for-bit with no rounding-boundary assumption (the
    * round()-on-interpolated-doubles trap the verify notes warn
    * about never arises).
    *
    * Scale: exact `percentile` holds one value-count map per group in
    * the aggregator — fine at dashboard group counts (5 here); a
    * high-cardinality grouping should switch to the B58b
    * bucket-percentile form. The deviation frame is cached: one
    * orders scan for the medians, one materialization for both the
    * MAD pass and the fence count.
    */
  def robustOutliers(s: SparkSession, dir: String): DataFrame = {
    val o = orders(s, dir).select(col("o_orderpriority").as("p"),
      expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 2").as("c2"))
    val med = o.groupBy("p")
      .agg(expr("CAST(percentile(c2, 0.5D) AS BIGINT)").as("med_c2"))
    val dev = o.join(broadcast(med), "p")
      .withColumn("dev_c2", abs(col("c2") - col("med_c2")))
      .grainCache()
    val mad = dev.groupBy("p")
      .agg(expr("CAST(percentile(dev_c2 * 2, 0.5D) AS BIGINT)").as("mad_c4"))
    dev.join(broadcast(mad), "p")
      .groupBy("p")
      .agg(count(lit(1)).as("n"),
        sum(when(col("dev_c2") * 20000L > col("mad_c4") * 44478L, 1L)
          .otherwise(0L)).as("n_outliers"),
        max(col("med_c2")).as("med_c2"),
        max(col("mad_c4")).as("mad_c4"))
      .select(col("p").as("o_orderpriority"), col("n"), col("n_outliers"),
        col("med_c2"), col("mad_c4"))
      .orderBy("o_orderpriority")
  }
}
