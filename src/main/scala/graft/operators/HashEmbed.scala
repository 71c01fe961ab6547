package graft.operators

import graft.GraftSession.GrainOps
import graft.sources.GraftCatalog
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.E12/D9 — train-free document embeddings via the hashing trick
  * (Weinberger et al., ICML 2009: feature hashing) + kNN retrieval
  * over them. Each word's rolling polynomial hash picks a dimension
  * (h mod D) and a sign (next hash bit), and the document's vector is
  * the signed sum of its word counts — the classic no-model baseline
  * for semantic retrieval over corpora with no embedding service in
  * reach, and the exact representation DSIR's hashed variant uses.
  *
  * Scale shape: embedding is ONE tokenize pass + one (doc, dim)
  * aggregate — map-side combinable, output D ints per doc. Retrieval
  * broadcasts the (tiny) query rows against the embedding table:
  * per-candidate scoring is map-side, then a per-query top-k heap
  * (window row_number over k·|queries| rows) — the D1 shape.
  *
  * Exactness: hashes are exact BIGINT folds ((h·257 + c) mod P —
  * products ≤ 2.6e11, no overflow), vector entries are exact signed
  * integer sums, and cosines are the repo's floor-micro convention
  * over exact-int dots/norms — every value replays bit-for-bit in
  * DuckDB (`list_reduce` over the same char sequence).
  */
object HashEmbed {

  val Dim = 64
  val P = 1000000007L
  val KnnK = 5
  val NQueries = 3

  private def docs(s: SparkSession, dir: String): DataFrame =
    new GraftCatalog(s, dir).table("documents")

  /** Rolling polynomial hash of a word column — exact BIGINT. */
  private[operators] def wordHash(w: Column): Column =
    aggregate(
      transform(regexp_extract_all(w, lit("."), lit(0)), c => ascii(c).cast("long")),
      lit(0L), (h, c) => (h * 257L + c) % P)

  /** Per-doc dense D-dim signed-count vector + norm. Exposed for the
    * knn query and the spec.
    */
  private[graft] def embeddings(s: SparkSession, dir: String): DataFrame = {
    val words = expr("filter(split(trim(lower(text)), '\\\\s+'), w -> length(w) > 0)")
    val contrib = docs(s, dir)
      .select(col("doc_id"), explode(words).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("n"))
      .select(col("doc_id"), col("n"), wordHash(col("word")).as("h"))
      // `div` (integer division) — `/` would widen to double
      .select(col("doc_id"), pmod(col("h"), lit(Dim.toLong)).as("dim"),
        when(expr(s"(h div $Dim) % 2") === 0L, col("n"))
          .otherwise(-col("n")).as("c"))
      .groupBy("doc_id", "dim").agg(sum("c").as("v"))
    val vecs = contrib.groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("dim"), col("v")))).as("m"))
      .select(col("doc_id"),
        transform(sequence(lit(0L), lit(Dim - 1L)),
          d => coalesce(element_at(col("m"), d), lit(0L))).as("emb"))
    docs(s, dir).select("doc_id")
      .join(vecs, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("emb"),
          array_repeat(lit(0L), Dim)).as("emb"))
      .withColumn("norm2", SemDedup.dotL(col("emb"), col("emb")))
  }

  /** E12 query: the embedding table, arrays rendered as CSV so the
    * parquet/DuckDB compare sees a flat string column.
    */
  def hashEmbed(s: SparkSession, dir: String): DataFrame =
    embeddings(s, dir)
      .select(col("doc_id"),
        size(filter(col("emb"), v => v =!= 0L)).cast("long").as("nnz"),
        col("norm2"),
        array_join(transform(col("emb"), _.cast("string")), ",").as("emb_csv"))
      .orderBy("doc_id")

  /** D9 query: top-k nearest docs per query doc by micro-int cosine
    * over the hash embeddings — train-free semantic retrieval.
    */
  def hashEmbedKnn(s: SparkSession, dir: String): DataFrame = {
    val e = embeddings(s, dir).where(col("norm2") > 0)
      .withColumn("nrm", sqrt(col("norm2").cast("double")))
      .grainCache() // scored side + broadcast query side
    val q = e.where(col("doc_id") < NQueries)
      .select(col("doc_id").as("query_id"), col("emb").as("qem"), col("nrm").as("qnrm"))
    val scored = broadcast(q).join(e, col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id").as("neighbor_id"),
        floor(SemDedup.dotL(col("qem"), col("emb")).cast("double")
          / (col("qnrm") * col("nrm")) * 1e6).as("cos_micro"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos_micro").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= KnnK)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_micro"))
      .orderBy("query_id", "rank")
  }

  /** Shared oracle CTE chain producing vec(doc_id, emb, norm2) —
    * reused by the semantic-decontamination oracle (C13).
    */
  private[operators] def vecSql: String = s"""
      WITH w AS (
        SELECT doc_id, unnest(list_filter(
          string_split_regex(trim(lower(text)), '\\s+'), x -> length(x) > 0)) AS word
        FROM documents
      ), pdw AS (
        SELECT doc_id, word, count(*) AS n FROM w GROUP BY doc_id, word
      ), h AS (
        SELECT doc_id, n,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(regexp_extract_all(word, '.'),
                                c -> CAST(ord(c) AS BIGINT))),
                 (h, c) -> (h * 257 + c) % $P) AS hash
        FROM pdw
      ), contrib AS (
        SELECT doc_id, hash % $Dim AS dim,
               sum(CASE WHEN (hash // $Dim) % 2 = 0 THEN n ELSE -n END) AS v
        FROM h GROUP BY doc_id, hash % $Dim
      ), dims AS (
        SELECT d.doc_id, r.range AS dim
        FROM (SELECT DISTINCT doc_id FROM documents) d CROSS JOIN range($Dim) r
      ), vec AS (
        SELECT dims.doc_id,
               list(CAST(coalesce(c.v, 0) AS BIGINT) ORDER BY dims.dim) AS emb
        FROM dims LEFT JOIN contrib c
          ON c.doc_id = dims.doc_id AND c.dim = dims.dim
        GROUP BY dims.doc_id
      ), vecn AS (
        SELECT doc_id, emb,
               CAST(list_dot_product(emb::DOUBLE[], emb::DOUBLE[]) AS BIGINT) AS norm2
        FROM vec
      )"""

  def oracleEmbedSql: String = s"""$vecSql
      SELECT doc_id,
             CAST(len(list_filter(emb, v -> v <> 0)) AS BIGINT) AS nnz,
             norm2,
             array_to_string(emb, ',') AS emb_csv
      FROM vecn ORDER BY doc_id"""

  def oracleKnnSql: String = s"""$vecSql,
      e AS (SELECT doc_id, emb::DOUBLE[] AS emb, sqrt(CAST(norm2 AS DOUBLE)) AS nrm
            FROM vecn WHERE norm2 > 0),
      q AS (SELECT doc_id AS query_id, emb AS qem, nrm AS qnrm
            FROM e WHERE doc_id < $NQueries),
      scored AS (
        SELECT q.query_id, e.doc_id AS neighbor_id,
               CAST(floor(list_dot_product(q.qem, e.emb) / (q.qnrm * e.nrm)
                          * 1000000.0) AS BIGINT) AS cos_micro
        FROM q JOIN e ON e.doc_id <> q.query_id)
      SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cos_micro FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_micro DESC, neighbor_id) AS rank
        FROM scored) WHERE rank <= $KnnK
      ORDER BY query_id, rank"""
}
