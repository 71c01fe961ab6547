package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.D10: hybrid lexical+vector retrieval with Reciprocal Rank
  * Fusion (Cormack, Clarke & Buettcher, SIGIR 2009) — the standard
  * production shape for corpus search: BM25 (E13) and embedding kNN
  * (E12's train-free hash embeddings) each retrieve a top-k list for
  * the SAME keyword queries, and RRF fuses them by rank alone:
  * rrf(d) = Σ_systems 1/(60 + rank_sys(d)). Rank fusion needs no
  * score calibration between systems — which is also what makes it
  * exactness-friendly: the fused score is the exact integer
  * 1000000 div (60 + rank) summed over systems, no floats anywhere.
  *
  * The vector side embeds each query's term multiset through the
  * SAME feature-hash construction as the documents (E12), so "hash
  * join" retrieves docs about hash joins even when neither word is
  * frequent enough to win BM25 — and the fusion demotes docs only
  * one system believes in.
  *
  * Scale shape: both sides are already scale-shaped (E13's broadcast
  * postings filter + salted top-k; E12's map-combinable embedding
  * aggregate with a broadcast query side). Fusion itself touches only
  * 2·k·|queries| rows — a full outer join on (query_id, doc_id) of
  * two tiny ranked lists, then one constant-size window.
  */
object Hybrid {

  val K = Bm25.K        // fused output depth, same as each system's list
  val RrfC = 60L        // the SIGIR-2009 constant

  /** Vector-side retrieval: query term-multisets → hash-embedding
    * vectors (tiny, broadcast), docs scored map-side by micro-floored
    * cosine, per-query top-k — D9's shape with text queries.
    */
  private[operators] def vectorSide(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qvecs = Bm25.Queries.toDF("query_id", "term")
      .select(col("query_id"), HashEmbed.wordHash(col("term")).as("h"))
      .select(col("query_id"), pmod(col("h"), lit(HashEmbed.Dim.toLong)).as("dim"),
        when(expr(s"(h div ${HashEmbed.Dim}) % 2") === 0L, lit(1L))
          .otherwise(lit(-1L)).as("c"))
      .groupBy("query_id", "dim").agg(sum("c").as("v"))
      .groupBy("query_id")
      .agg(map_from_entries(collect_list(struct(col("dim"), col("v")))).as("m"))
      .select(col("query_id"),
        transform(sequence(lit(0L), lit(HashEmbed.Dim - 1L)),
          d => coalesce(element_at(col("m"), d), lit(0L))).as("qem"))
      .withColumn("qn2", SemDedup.dotL(col("qem"), col("qem")))
      .where(col("qn2") > 0)
      .withColumn("qnrm", sqrt(col("qn2").cast("double")))
    val e = HashEmbed.embeddings(s, dir).where(col("norm2") > 0)
      .withColumn("nrm", sqrt(col("norm2").cast("double")))
    val scored = broadcast(qvecs).crossJoin(e)
      .select(col("query_id"), col("doc_id"),
        floor(SemDedup.dotL(col("qem"), col("emb")).cast("double")
          / (col("qnrm") * col("nrm")) * 1e6).cast("long").as("cos_micro"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_micro").desc, col("doc_id"))
    scored.withColumn("vrank", row_number().over(w).cast("long"))
      .where(col("vrank") <= K)
      .select("query_id", "doc_id", "vrank")
  }

  /** D10 query: RRF-fused top-k with each system's rank carried
    * through (0 = not in that system's list).
    */
  def retrieve(s: SparkSession, dir: String): DataFrame = {
    val lex = Bm25.retrieve(s, dir)
      .select(col("query_id"), col("doc_id"), col("rank").as("lrank"))
    val vec = vectorSide(s, dir)
    val fused = lex.join(vec, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        coalesce(col("lrank"), lit(0L)).as("lex_rank"),
        coalesce(col("vrank"), lit(0L)).as("vec_rank"))
      .withColumn("rrf_micro",
        when(col("lex_rank") > 0L, expr(s"1000000 div ($RrfC + lex_rank)")).otherwise(0L)
          + when(col("vec_rank") > 0L, expr(s"1000000 div ($RrfC + vec_rank)")).otherwise(0L))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_micro").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= K)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("rrf_micro"), col("lex_rank"), col("vec_rank"))
      .orderBy("query_id", "rank")
  }

  /** DuckDB oracle: Bm25.lexSql's ranked CTE + HashEmbed's vector
    * chain + a query-side embedding of the same VALUES list, fused
    * with the same exact integer RRF arithmetic.
    */
  def oracleSql: String = s"""${Bm25.lexSql},
      dvw AS (
        SELECT doc_id, unnest(list_filter(
          string_split_regex(trim(lower(text)), '\\s+'), x -> length(x) > 0)) AS word
        FROM documents
      ), dpdw AS (
        SELECT doc_id, word, count(*) AS n FROM dvw GROUP BY doc_id, word
      ), dh AS (
        SELECT doc_id, n,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(regexp_extract_all(word, '.'),
                                c -> CAST(ord(c) AS BIGINT))),
                 (h, c) -> (h * 257 + c) % ${HashEmbed.P}) AS hash
        FROM dpdw
      ), dcontrib AS (
        SELECT doc_id, hash % ${HashEmbed.Dim} AS dim,
               sum(CASE WHEN (hash // ${HashEmbed.Dim}) % 2 = 0 THEN n ELSE -n END) AS v
        FROM dh GROUP BY doc_id, hash % ${HashEmbed.Dim}
      ), ddims AS (
        SELECT d.doc_id, r.range AS dim
        FROM (SELECT DISTINCT doc_id FROM documents) d
        CROSS JOIN range(${HashEmbed.Dim}) r
      ), dvec AS (
        SELECT ddims.doc_id,
               list(CAST(coalesce(c.v, 0) AS BIGINT) ORDER BY ddims.dim) AS emb
        FROM ddims LEFT JOIN dcontrib c
          ON c.doc_id = ddims.doc_id AND c.dim = ddims.dim
        GROUP BY ddims.doc_id
      ), e AS (
        SELECT doc_id, emb::DOUBLE[] AS emb,
               sqrt(list_dot_product(emb::DOUBLE[], emb::DOUBLE[])) AS nrm
        FROM dvec
        WHERE CAST(list_dot_product(emb::DOUBLE[], emb::DOUBLE[]) AS BIGINT) > 0
      ), qh AS (
        SELECT query_id,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(regexp_extract_all(term, '.'),
                                c -> CAST(ord(c) AS BIGINT))),
                 (h, c) -> (h * 257 + c) % ${HashEmbed.P}) AS hash
        FROM q
      ), qcontrib AS (
        SELECT query_id, hash % ${HashEmbed.Dim} AS dim,
               sum(CASE WHEN (hash // ${HashEmbed.Dim}) % 2 = 0 THEN 1 ELSE -1 END) AS v
        FROM qh GROUP BY query_id, hash % ${HashEmbed.Dim}
      ), qdims AS (
        SELECT qq.query_id, r.range AS dim
        FROM (SELECT DISTINCT query_id FROM q) qq
        CROSS JOIN range(${HashEmbed.Dim}) r
      ), qvec AS (
        SELECT qdims.query_id,
               list(CAST(coalesce(c.v, 0) AS BIGINT) ORDER BY qdims.dim) AS qem
        FROM qdims LEFT JOIN qcontrib c
          ON c.query_id = qdims.query_id AND c.dim = qdims.dim
        GROUP BY qdims.query_id
      ), qe AS (
        SELECT query_id, qem::DOUBLE[] AS qem,
               sqrt(list_dot_product(qem::DOUBLE[], qem::DOUBLE[])) AS qnrm
        FROM qvec
        WHERE CAST(list_dot_product(qem::DOUBLE[], qem::DOUBLE[]) AS BIGINT) > 0
      ), vscored AS (
        SELECT qe.query_id, e.doc_id,
               CAST(floor(list_dot_product(qe.qem, e.emb) / (qe.qnrm * e.nrm)
                          * 1000000.0) AS BIGINT) AS cos_micro
        FROM qe CROSS JOIN e
      ), vecr AS (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos_micro DESC, doc_id) AS vrank
        FROM vscored
      ), lexk AS (SELECT query_id, doc_id, rank AS lrank FROM lexr WHERE rank <= $K),
      veck AS (SELECT query_id, doc_id, vrank FROM vecr WHERE vrank <= $K),
      fused AS (
        SELECT coalesce(l.query_id, v.query_id) AS query_id,
               coalesce(l.doc_id, v.doc_id) AS doc_id,
               coalesce(l.lrank, 0) AS lex_rank,
               coalesce(v.vrank, 0) AS vec_rank
        FROM lexk l FULL OUTER JOIN veck v
          ON l.query_id = v.query_id AND l.doc_id = v.doc_id
      ), rrf AS (
        SELECT query_id, doc_id, lex_rank, vec_rank,
               (CASE WHEN lex_rank > 0 THEN 1000000 // ($RrfC + lex_rank) ELSE 0 END)
             + (CASE WHEN vec_rank > 0 THEN 1000000 // ($RrfC + vec_rank) ELSE 0 END)
               AS rrf_micro
        FROM fused
      ), ranked AS (
        SELECT query_id, doc_id, rrf_micro, lex_rank, vec_rank,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY rrf_micro DESC, doc_id) AS rank
        FROM rrf)
      SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
             doc_id, CAST(rrf_micro AS BIGINT) AS rrf_micro,
             CAST(lex_rank AS BIGINT) AS lex_rank,
             CAST(vec_rank AS BIGINT) AS vec_rank
      FROM ranked WHERE rank <= $K ORDER BY query_id, rank"""
}
