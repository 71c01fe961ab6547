package graft

import graft.operators.Bm25
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpecBase {

  private def write(tmp: String, rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    rows.map { case (id, text) => (id, text, s"src${id % 2}") }
      .toDF("doc_id", "text", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
  }

  test("bm25 ranks both-term docs first and length-normalizes equal tf") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bm25").toString
    val filler = Seq.fill(40)("filler").mkString(" ")
    write(tmp, Seq(
      1L -> "hash join hash join hash join",      // both terms, dense
      2L -> s"hash join $filler",                 // both terms, diluted
      3L -> "hash hash hash hash hash hash",      // one term only
      4L -> s"hash $filler",                      // one term, longer doc
      5L -> filler))                              // no terms
    val out = Bm25.retrieve(spark, tmp).where(col("query_id") === 0)
      .collect().map(r => r.getLong(2) -> ((r.getLong(1), r.getLong(3), r.getLong(4))))
      .toMap
    assert(!out.contains(5L), "doc with no query terms is not a candidate")
    assert(out(1L)._1 === 1L, s"dense both-term doc ranks first: $out")
    assert(out(1L)._3 === 2L && out(3L)._3 === 1L)
    assert(out(2L)._2 > out(3L)._2,
      s"two diluted terms still beat one dense term (idf sum): $out")
    assert(out(3L)._2 > out(4L)._2,
      "equal tf, longer doc scores lower (length normalization)")
  }

  test("two-level top-k equals the single-window global rank on the corpus") {
    val full = Bm25.retrieve(spark, sfDir)
    // reconstruct the single-window form: rank ALL candidates per
    // query directly (no salt stage) and keep the top K
    val words = expr("filter(split(trim(lower(text)), '\\\\s+'), w -> length(w) > 0)")
    import spark.implicits._
    val pair = new graft.sources.GraftCatalog(spark, sfDir).table("documents")
      .select(col("doc_id"), explode(words).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val dls = pair.groupBy("doc_id").agg(sum("tf").as("dl"))
    val stats = new graft.sources.GraftCatalog(spark, sfDir).table("documents")
      .agg(count(lit(1)).as("n_docs"))
      .crossJoin(pair.agg(sum("tf").as("l_tokens")))
    val qterms = Bm25.Queries.toDF("query_id", "term")
    val matched = pair.join(qterms.select(col("term").as("word")).distinct(), Seq("word"))
    val dfs = matched.groupBy("word").agg(count(lit(1)).as("df"))
    val single = matched.join(dls, Seq("doc_id")).join(dfs, Seq("word"))
      .crossJoin(stats)
      .select(col("word"), col("doc_id"),
        floor(log((col("n_docs") * 2L + 2L).cast("double") /
                  (col("df") * 2L + 1L).cast("double")) * 1000000.0)
          .cast("long").as("idf_micro"),
        expr("""CAST(44 AS DECIMAL(38,0)) * tf * l_tokens * 1000000 div
                (CAST(20 AS DECIMAL(38,0)) * tf * l_tokens
                 + CAST(6 AS DECIMAL(38,0)) * l_tokens
                 + CAST(18 AS DECIMAL(38,0)) * dl * n_docs)""").as("tfn_micro"))
      .select(col("word"), col("doc_id"),
        expr("(idf_micro * tfn_micro) div 1000000").as("term_score"))
      .join(qterms, col("word") === col("term"))
      .groupBy("query_id", "doc_id")
      .agg(sum("term_score").as("score_micro"), count(lit(1)).as("n_terms"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("score_micro").desc, col("doc_id"))).cast("long"))
      .where(col("rank") <= Bm25.K)
      .select("query_id", "rank", "doc_id", "score_micro", "n_terms")
    val a = full.collect().map(_.toSeq).toSet
    val b = single.collect().map(_.toSeq).toSet
    assert(a === b, "salted two-level top-k must equal the global rank")
  }

  test("index-served BM25 equals scan-time BM25; serving is bucket-pruned and never reads documents") {
    val served = Bm25.indexServedBm25(spark, sfDir)
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount"),
      s"query-term filter must prune postings buckets:\n$plan")
    assert(!plan.contains("documents.parquet"),
      "serving must read only the index artifacts, never the corpus")
    val a = served.collect().map(_.toSeq).toSet
    val b = Bm25.retrieve(spark, sfDir).collect().map(_.toSeq).toSet
    assert(a === b, "index-served result must equal the scan-time form")
    // the incrementally-absorbed postings table equals a from-scratch
    // tokenization of the full corpus
    import org.apache.spark.sql.functions.{col, count, explode, lit}
    val words = expr("filter(split(trim(lower(text)), '\\\\s+'), w -> length(w) > 0)")
    val fresh = new graft.sources.GraftCatalog(spark, sfDir).table("documents")
      .select(col("doc_id"), explode(words).as("word"))
      .groupBy("word", "doc_id").agg(count(lit(1)).as("tf"))
      .collect().map(_.toSeq).toSet
    val idx = spark.table("graft_postings").collect().map(_.toSeq).toSet
    assert(idx === fresh, "append-maintained index == from-scratch build")
  }

  test("per-term idf matches driver Math.log (ULP diagnosability) and plan broadcasts the term filter") {
    val plan = Bm25.retrieve(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"query-term filter and stats joins must broadcast:\n$plan")
    // idf diagnosability: recompute each matched term's df on the
    // driver and check the engine's micro-floored ln boundary
    val docs = new graft.sources.GraftCatalog(spark, sfDir).table("documents")
    val words = expr("filter(split(trim(lower(text)), '\\\\s+'), w -> length(w) > 0)")
    val n = docs.count()
    val terms = Bm25.Queries.map(_._2).distinct
    val dfs = docs.select(col("doc_id"), explode(words).as("word"))
      .where(col("word").isin(terms: _*)).groupBy("word")
      .agg(countDistinct("doc_id").as("df")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    dfs.foreach { case (w, df) =>
      val engine = docs.sparkSession.range(1).select(
        floor(log(lit((2 * n + 2).toDouble) / lit((2 * df + 1).toDouble)) * 1000000.0)
          .cast("long")).collect()(0).getLong(0)
      val driver = math.floor(math.log((2 * n + 2).toDouble / (2 * df + 1).toDouble) * 1e6).toLong
      assert(engine === driver, s"idf micro boundary drift for '$w' (df=$df)")
    }
  }
}
