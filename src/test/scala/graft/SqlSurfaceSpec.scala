package graft

/** SQL reachability of the pipeline families (r10 VERDICT gap #3):
  * near-dup dedup and BM25 retrieval — and every registered flagship —
  * must run end-to-end through `spark.sql` strings alone, no Scala
  * operator imports on the query path.
  */
class SqlSurfaceSpec extends SparkSpecBase {

  test("near-dup dedup runs end-to-end through spark.sql only and composes as a relation") {
    GraftPipelines.registerAll(spark, sfDir)
    val viaSql = spark.sql("SELECT * FROM graft_dedup_minhash_lsh")
      .collect().map(_.toString).sorted.toSeq
    val viaApi = SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    assert(viaSql === viaApi, "the SQL view must serve the operator's exact result")
    // composable like any table: joins/filters in plain SQL over views
    val n = spark.sql(
      """SELECT count(*) AS n
         FROM graft_dedup_minhash_lsh p
         JOIN graft_text_quality q ON p.doc_a = q.doc_id
         WHERE p.doc_a < p.doc_b""").head().getLong(0)
    assert(n > 0, "SQL composition over the dedup view must answer")
  }

  test("BM25 retrieval runs end-to-end through spark.sql only") {
    GraftPipelines.registerAll(spark, sfDir)
    val viaSql = spark.sql("SELECT * FROM graft_text_bm25_retrieval")
      .collect().map(_.toString).sorted.toSeq
    val viaApi = SparkEntry.queries("text_bm25_retrieval")(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    assert(viaSql === viaApi)
  }

  test("every registered flagship view answers from SQL with rows") {
    GraftPipelines.registerAll(spark, sfDir)
    val empty = GraftPipelines.ViewQueries.filter { name =>
      spark.sql(s"SELECT count(*) AS n FROM graft_$name").head().getLong(0) == 0L
    }
    assert(empty.isEmpty, s"views answered zero rows: $empty")
  }
}
