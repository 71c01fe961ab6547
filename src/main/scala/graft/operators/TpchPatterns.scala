package graft.operators

import graft.sources.GraftCatalog
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** §2.B completion: the six TPC-H join/subquery topologies not yet in
  * Relational/Analytic — Q2 (correlated min), Q11 (HAVING vs global
  * scalar), Q12 (conditional counts over a join), Q16 (distinct-count
  * + NOT IN), Q20 (nested IN with HAVING threshold), Q21 (multi
  * EXISTS/NOT-EXISTS self-join). With these, every one of the 22
  * TPC-H query shapes has a graft form, so a reference consumer's
  * full relational workload is expressible.
  *
  * The corpus (TESTDATA.md) has no `partsupp` table and no
  * commit/receipt dates, so — consistent with the existing "Q5-ish /
  * Q9-style" adaptations — the supply relation is derived from
  * lineitem ((partkey, suppkey) aggregates) and "late" means shipped
  * more than 60 days after the order date. The JOIN TOPOLOGY and
  * subquery nesting of each original query is preserved exactly;
  * that is what the patterns exercise.
  *
  * Oracle-parity rules (SURVEY.md §6) apply throughout: decimal-cast
  * sums, floor-micro instead of round for derived ratios, identical
  * aliases and ORDER BY on both sides.
  */
object TpchPatterns {

  private def cat(s: SparkSession, dir: String) = new GraftCatalog(s, dir)

  private def ts(v: String) = to_timestamp(lit(v))

  private def revenueExpr = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  private def dsum(c: Column): Column = sum(c.cast(DecimalType(28, 6))).cast("double")

  private def dsumr(c: Column, scale: Int = 2): Column = round(dsum(c), scale)

  /** Derived supply relation: per (partkey, suppkey), the observed
    * unit cost in integer micros — floor(sum(price)*1e6 / sum(qty)).
    * Integer micros make the Q2 min-equality join exact across
    * engines (a raw double division could differ in the last bit and
    * drop a row from the min set).
    *
    * One shuffle on the composite key; at 100 TB this is a plain
    * partial-agg + exchange over the fact table, nothing resident.
    */
  private def supplyCosts(lineitem: DataFrame): DataFrame =
    lineitem.groupBy(
        col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
      .agg(floor(dsum(col("l_extendedprice")) * 1000000.0 /
                 dsum(col("l_quantity"))).cast("long").as("supply_cost_micro"))

  /** B46 (TPC-H Q2): min-cost supplier per part — the correlated min
    * subquery. Decorrelated Spark-first: compute each part's min
    * supply cost with a window over the candidate set (one shuffle on
    * p_partkey) instead of re-aggregating and joining back. The
    * supplier→nation→region chain is a broadcast (dims are tiny at
    * every scale; suppliers are 1e-4 of lineitem in TPC-H ratios).
    */
  def q2MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    val c = cat(s, dir)
    val europeSupp = c.table("supplier")
      .join(c.table("nation"), col("n_nationkey") === col("s_nationkey"))
      .join(c.table("region").where(col("r_name") === "EUROPE"),
        col("r_regionkey") === col("n_regionkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val parts = c.table("part")
      .where(col("p_type") === "STANDARD" && col("p_size") <= 10)
      .select("p_partkey", "p_name")
    // Prune lineitem to the qualifying parts BEFORE the per-pair
    // aggregation (q17's trick): each surviving pair's supply cost is
    // unchanged, but the aggregate's input shrinks by the part
    // filter's selectivity (~1/30 here) — Catalyst can't push the
    // predicate through the aggregate on its own.
    val prunedLi = c.table("lineitem")
      .join(broadcast(parts.select("p_partkey")),
        col("l_partkey") === col("p_partkey"), "left_semi")
    val cand = parts
      .join(supplyCosts(prunedLi), col("ps_partkey") === col("p_partkey"))
      .join(broadcast(europeSupp), col("s_suppkey") === col("ps_suppkey"))
    val minCost = min(col("supply_cost_micro")).over(Window.partitionBy("p_partkey"))
    cand.withColumn("min_cost", minCost)
      .where(col("supply_cost_micro") === col("min_cost"))
      .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supply_cost_micro")
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  /** B47 (TPC-H Q11): important parts — per-part value for one
    * supplier region compared against a fraction of the GLOBAL total
    * (scalar subquery). The scalar re-aggregates the already-grouped
    * view (tiny) and is broadcast back; the fact table is read once.
    * The threshold sum goes through decimal so both engines compute
    * the identical double and the > cut is stable.
    */
  def q11ImportantParts(s: SparkSession, dir: String): DataFrame = {
    val c = cat(s, dir)
    val supp = c.table("supplier")
      .join(broadcast(c.table("nation")
          .where(col("n_name").isin("NATION_7", "NATION_12"))),
        col("n_nationkey") === col("s_nationkey"))
      .select("s_suppkey")
    // integer cents, not round(x, 2): this corpus hits an exact
    // half-cent sum (139350.675) where Spark's and DuckDB's double
    // rounding disagree — floor(x*100+0.5) is bit-identical on both
    val value = c.table("lineitem")
      .join(broadcast(supp), col("s_suppkey") === col("l_suppkey"))
      .groupBy("l_partkey")
      .agg(floor(dsum(revenueExpr) * 100.0 + 0.5).cast("long").as("value_cents"))
    // TPC-H's Q11 threshold fraction is 0.0001/SF — fixed fractions go
    // VACUOUS as the corpus grows (observed: 0 rows at sf0.1). Scale it
    // off the supplier count (∝ SF): 0.05/|supplier| = 0.0005 at
    // sf0.01, keeping the sf0.01 gate identical while staying
    // non-degenerate at any scale. The count rides INSIDE the plan as a
    // 1-row aggregate crossJoined into the threshold (an eager .count()
    // here would run a Spark job at query-CONSTRUCTION time — the one
    // place the codebase broke the "a query is one lazy plan" rule).
    // Same double expression shape as the oracle: sum * (0.05 / n).
    val nSupp = c.table("supplier").agg(count(lit(1)).as("n_supp"))
    val thresh = value.agg(sum(col("value_cents")).cast("double").as("total_cents"))
      .crossJoin(broadcast(nSupp))
      .select((col("total_cents") * (lit(0.05) / col("n_supp"))).as("thresh"))
    value.crossJoin(broadcast(thresh))
      .where(col("value_cents") > col("thresh"))
      .select("l_partkey", "value_cents")
      .orderBy(col("value_cents").desc, col("l_partkey"))
  }

  /** B48 (TPC-H Q12): conditional priority counts over the
    * orders⋈lineitem join, grouped by a lineitem attribute (the
    * corpus has no l_shipmode; l_returnflag plays its role). The
    * year filter is pushed to the lineitem scan; the join is a plain
    * shuffled hash join on orderkey — at 100 TB both sides are facts
    * and neither broadcasts, which is the point of this pattern.
    */
  def q12PriorityByFlag(s: SparkSession, dir: String): DataFrame = {
    val c = cat(s, dir)
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    c.table("lineitem")
      .where(col("l_shipdate") >= ts("1997-01-01 00:00:00") &&
             col("l_shipdate") <  ts("1998-01-01 00:00:00"))
      .join(c.table("orders"), col("o_orderkey") === col("l_orderkey"))
      .groupBy("l_returnflag")
      .agg(
        sum(when(high, 1).otherwise(0)).cast("long").as("high_line_count"),
        sum(when(high, 0).otherwise(1)).cast("long").as("low_line_count"))
      .orderBy("l_returnflag")
  }

  /** B49 (TPC-H Q16): supplier count per part attribute combo,
    * excluding a NOT-IN supplier set (negative balance stands in for
    * the complaint-comment filter). The exclusion list is tiny →
    * broadcast left-anti; supplier-part pairs dedupe inside the
    * countDistinct (partial agg first, no separate distinct pass).
    */
  def q16SupplierCnt(s: SparkSession, dir: String): DataFrame = {
    val c = cat(s, dir)
    val excluded = c.table("supplier")
      .where(col("s_acctbal") < 0).select("s_suppkey")
    c.table("lineitem")
      .join(broadcast(c.table("part").where(
          col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 14, 23, 45, 9, 19, 36, 49))),
        col("p_partkey") === col("l_partkey"))
      .join(broadcast(excluded), col("s_suppkey") === col("l_suppkey"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** B50 (TPC-H Q20): suppliers with excess shipped volume of
    * name-matched parts — the doubly-nested IN. Inner: (suppkey,
    * partkey) year totals of 'small%' parts, kept where the total
    * exceeds half the average pair total (scalar). Outer: region
    * suppliers semi-joined to the surviving suppkeys. All reductions
    * happen before any join with the supplier dim: the fact table is
    * scanned once, aggregated once, and only (suppkey) survivors — a
    * set bounded by supplier cardinality — flow up.
    */
  def q20ExcessSuppliers(s: SparkSession, dir: String): DataFrame = {
    val c = cat(s, dir)
    val smallParts = c.table("part")
      .where(col("p_name").like("small%")).select("p_partkey")
    val pairQty = c.table("lineitem")
      .where(col("l_shipdate") >= ts("1997-01-01 00:00:00") &&
             col("l_shipdate") <  ts("1998-01-01 00:00:00"))
      .join(broadcast(smallParts), col("p_partkey") === col("l_partkey"))
      .groupBy("l_suppkey", "l_partkey")
      .agg(dsum(col("l_quantity")).as("pair_qty"))
    // scalar: half the mean pair quantity, re-aggregated from the
    // grouped view (exact decimal mean → identical double cut in
    // both engines)
    val thresh = pairQty.agg(
      (dsum(col("pair_qty")) * 0.5 / count(lit(1))).as("thresh"))
    val qualified = pairQty.crossJoin(broadcast(thresh))
      .where(col("pair_qty") > col("thresh"))
      .select("l_suppkey").distinct()
    c.table("supplier")
      .join(c.table("nation"), col("n_nationkey") === col("s_nationkey"))
      .join(c.table("region").where(col("r_name") === "ASIA"),
        col("r_regionkey") === col("n_regionkey"))
      .join(broadcast(qualified), col("l_suppkey") === col("s_suppkey"), "left_semi")
      // s_acctbal passes through raw: round() on arbitrary doubles
      // diverges between engines (SURVEY.md §6)
      .select(col("s_name"), col("s_acctbal"))
      .orderBy("s_name")
  }

  /** B51 (TPC-H Q21): suppliers who kept waiting — late lineitems of
    * finalized orders where another supplier participated (EXISTS)
    * but no OTHER supplier was late (NOT EXISTS). Spark-first BOTH
    * correlated self-joins collapse into ONE per-order aggregate over
    * one pass of the fact table:
    *   n_supp       = countDistinct(suppkey)            (the EXISTS)
    *   n_late_supp  = countDistinct(suppkey | late)     (the NOT EXISTS)
    *   late_supp    = max(suppkey | late)   — on kept orders
    *                  (n_late_supp = 1) this IS the lone late supplier
    *   n_late_rows  = sum(late)             — l1's row count for it
    * Keep n_supp ≥ 2 ∧ n_late_supp = 1, attribute n_late_rows to
    * late_supp. ONE lineitem scan (the first draft joined the late
    * rows back to two separate aggregates: THREE fact scans + a
    * sort-merge join), and the distinct counts run as a two-level
    * aggregate — (orderkey, suppkey) first, then orderkey — because
    * two countDistinct() in one agg triggers an Expand that triples
    * the joined fact through the shuffle (measured at sf0.1: 1.31s
    * Expand form, 0.99s two-level). Both levels keep map-side partial
    * aggregation; the literal EXISTS/NOT-EXISTS form is
    * equality-checked in the spec.
    */
  def q21WaitingSuppliers(s: SparkSession, dir: String): DataFrame = {
    val c = cat(s, dir)
    val isLate = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS")
    // no broadcast hint: orders is a fact table — AQE broadcasts the
    // filtered side when it happens to be small, shuffles otherwise
    val perPair = c.table("lineitem")
      .join(c.table("orders").where(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(sum(when(isLate, 1L).otherwise(0L)).as("pair_late_rows"))
    val perOrder = perPair
      .groupBy("l_orderkey")
      .agg(
        count(lit(1)).as("n_supp"),
        sum(when(col("pair_late_rows") > 0, 1L).otherwise(0L)).as("n_late_supp"),
        max(when(col("pair_late_rows") > 0, col("l_suppkey"))).as("late_supp"),
        sum(col("pair_late_rows")).as("n_late_rows"))
      .where(col("n_supp") >= 2 && col("n_late_supp") === 1)
    val euSupp = c.table("supplier")
      .join(c.table("nation"), col("n_nationkey") === col("s_nationkey"))
      .join(c.table("region").where(col("r_name") === "EUROPE"),
        col("r_regionkey") === col("n_regionkey"))
      .select("s_suppkey", "s_name")
    perOrder
      .join(broadcast(euSupp), col("s_suppkey") === col("late_supp"))
      .groupBy("s_name")
      .agg(sum(col("n_late_rows")).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }
}
