package graft.operators

import graft.sources.GraftCatalog
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.B pipeline utilities: table profiling and stratified sampling —
  * the data-quality sweep a 100 TB ingest runs before anything else.
  */
object Profiling {

  private def orders(s: SparkSession, dir: String): DataFrame =
    new GraftCatalog(s, dir).table("orders")

  /** B38: one-pass column profile of the orders table — per column:
    * row count, null count, exact distinct count, min/max rendered to
    * strings with type-aware, engine-portable formatting (doubles via
    * DECIMAL(18,2), timestamps via date_format — raw double→string
    * diverges between engines). All statistics come from a SINGLE
    * aggregate (Spark plans the multi-distinct via one Expand +
    * shuffle), then the 1-row result is unpivoted with inline() —
    * never one job per column. At 100 TB swap the exact distinct
    * counts for approx_count_distinct and the plan loses the Expand.
    */
  def profileOrders(s: SparkSession, dir: String): DataFrame = {
    def minMaxS(c: Column): (Column, Column) = (min(c).cast("string"), max(c).cast("string"))
    val cols: Seq[(String, Column, (Column, Column))] = Seq(
      ("o_orderkey", col("o_orderkey"), minMaxS(col("o_orderkey"))),
      ("o_custkey", col("o_custkey"), minMaxS(col("o_custkey"))),
      ("o_orderstatus", col("o_orderstatus"), minMaxS(col("o_orderstatus"))),
      ("o_totalprice", col("o_totalprice"),
        minMaxS(col("o_totalprice").cast("decimal(18,2)"))),
      ("o_orderdate", col("o_orderdate"),
        (date_format(min(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss"),
         date_format(max(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss"))),
      ("o_orderpriority", col("o_orderpriority"), minMaxS(col("o_orderpriority"))))
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { case (n, c, (mn, mx)) =>
      Seq(sum(when(c.isNull, 1L).otherwise(0L)).as(s"${n}__nulls"),
        count_distinct(c).as(s"${n}__distinct"),
        mn.as(s"${n}__min"), mx.as(s"${n}__max"))
    }
    val one = orders(s, dir).agg(aggs.head, aggs.tail: _*)
    val rows = array(cols.map { case (n, _, _) =>
      struct(lit(n).as("col_name"), col("n_rows"),
        col(s"${n}__nulls").as("n_nulls"),
        col(s"${n}__distinct").as("n_distinct"),
        col(s"${n}__min").as("min_s"), col(s"${n}__max").as("max_s"))
    }: _*)
    one.select(inline(rows)).orderBy("col_name")
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
}
