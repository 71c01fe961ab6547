package graft.operators

import graft.GraftSession.GrainOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One shortlist candidate / one shortlist pair-similarity row (typed
  * rows for the per-query greedy `cogroup`).
  */
private[operators] case class MmrCand(query_id: Long, cand: Long, simqc: Long)
private[operators] case class MmrPair(query_id: Long, a: Long, b: Long, s: Long)
private[operators] case class MmrPick(query_id: Long, rank: Long, vec_id: Long, mmr_score: Long)

/** §2.D8 — MMR diversified top-k retrieval (Maximal Marginal
  * Relevance, Carbonell & Goldstein, SIGIR 1998): re-rank a per-query
  * relevance shortlist so each successive pick trades relevance
  * against redundancy with what's already picked:
  *   pick_i = argmax_c  λ·sim(q,c) − (1−λ)·max_{s∈S} sim(c,s)
  * (first pick = pure relevance; ties → smaller vec_id). The standard
  * answer to "my nearest neighbors are 10 copies of the same thing" —
  * retrieval-augmented pipelines run exactly this over ANN shortlists.
  *
  * Scale shape: the expensive part — scoring the corpus and keeping
  * the top-M shortlist per query — is the D1 distributed scan; the
  * greedy re-rank is per-query-LOCAL over M=20 candidates, done in
  * one `cogroup` on query_id (shortlist rows with shortlist-pair
  * similarities), so the sequential loop never touches the driver and
  * adds one shuffle of M rows + M² pair rows per query. k and M are
  * constants — the re-rank cost is independent of corpus size.
  *
  * Exactness: similarities are the micro-int floor-cosines over
  * fixed-point quantized embeddings (SemDedup's arithmetic), and
  * λ=0.7 is applied as integer 7·rel − 3·red (×10 both terms), so
  * every score is exact BIGINT and the DuckDB oracle replays the
  * greedy as k−1 unrolled CTE steps (`oracleSql` generates them).
  */
object Mmr {

  val ShortlistM = 20
  val SelectK = 5
  val NQueries = 3

  /** Shortlist + pair-sim inputs: micro-int cosines over the
    * quantized corpus (exact in any engine).
    */
  private def base(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val n = SemDedup.quantized(s, dir)
      .withColumn("nrm", sqrt(SemDedup.dotL(col("em"), col("em")).cast("double")))
      .grainCache() // tiny at test SF; at scale the shortlist join replaces this
    def cos(emA: String, nrmA: String, emB: String, nrmB: String) =
      floor(SemDedup.dotL(col(emA), col(emB)).cast("double")
        / (col(nrmA) * col(nrmB)) * 1e6).cast("long")
    val q = n.where(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("em").as("qem"), col("nrm").as("qnrm"))
    val scored = broadcast(q).join(n, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("cand"),
        cos("qem", "qnrm", "em", "nrm").as("simqc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("simqc").desc, col("cand"))
    val short = scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= ShortlistM).drop("rn")
    val s1 = short.select(col("query_id"), col("cand").as("a"))
      .join(n.select(col("vec_id").as("a"), col("em").as("em_a"), col("nrm").as("nrm_a")), Seq("a"))
    val s2 = short.select(col("query_id"), col("cand").as("b"))
      .join(n.select(col("vec_id").as("b"), col("em").as("em_b"), col("nrm").as("nrm_b")), Seq("b"))
    val pairs = s1.join(s2, Seq("query_id"))
      .where(col("a") =!= col("b"))
      .select(col("query_id"), col("a"), col("b"),
        cos("em_a", "nrm_a", "em_b", "nrm_b").as("s"))
    (short, pairs)
  }

  /** D8 query: (query_id, rank, vec_id, mmr_score) — k diversified
    * picks per query.
    */
  def mmrTopk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (short, pairs) = base(s, dir)
    val picks = short.as[MmrCand].groupByKey(_.query_id)
      .cogroup(pairs.as[MmrPair].groupByKey(_.query_id)) { (qid, cs, ps) =>
        val cands = cs.toArray.sortBy(c => (-c.simqc, c.cand))
        val sim = ps.map(p => (p.a, p.b) -> p.s).toMap
        var selected = List.empty[Long]
        val out = Seq.newBuilder[MmrPick]
        for (rank <- 1 to SelectK) {
          val scoredLeft = cands.iterator
            .filterNot(c => selected.contains(c.cand))
            .map { c =>
              val red = if (selected.isEmpty) 0L
                        else selected.map(sid => sim((c.cand, sid))).max
              (7L * c.simqc - 3L * red, c.cand)
            }.toArray
          val (score, pick) = scoredLeft.minBy { case (sc, id) => (-sc, id) }
          out += MmrPick(qid, rank.toLong, pick, score)
          selected ::= pick
        }
        out.result().iterator
      }
    picks.toDF().orderBy("query_id", "rank")
  }

  /** DuckDB replay: shortlist + pair sims with identical integer
    * arithmetic, then the greedy unrolled as SelectK−1 CTE steps.
    */
  def oracleSql(m: Int = ShortlistM, k: Int = SelectK, nq: Int = NQueries): String = {
    val steps = (2 to k).map { i =>
      val prev = s"selu${i - 1}"
      s"""sc$i AS (
        SELECT s.query_id, s.cand, s.simqc,
               7 * s.simqc - 3 * max(p.s) AS score
        FROM short s
        JOIN ps p ON p.query_id = s.query_id AND p.a = s.cand
        JOIN $prev u ON u.query_id = p.query_id AND u.cand = p.b
        WHERE NOT EXISTS (SELECT 1 FROM $prev x
                          WHERE x.query_id = s.query_id AND x.cand = s.cand)
        GROUP BY s.query_id, s.cand, s.simqc),
      sel$i AS (
        SELECT query_id, cand, score FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY score DESC, cand) AS rn
          FROM sc$i) WHERE rn = 1),
      selu$i AS (
        SELECT * FROM selu${i - 1}
        UNION ALL SELECT query_id, cand, $i AS rank, score FROM sel$i)"""
    }.mkString(",\n      ")
    s"""
      WITH e AS (
        SELECT vec_id,
               list_transform(embedding::DOUBLE[],
                              x -> floor(x * 1000000.0 + 0.5)) AS em
        FROM embeddings),
      n AS (SELECT vec_id, em, sqrt(list_dot_product(em, em)) AS nrm FROM e),
      q AS (SELECT vec_id AS query_id, em AS qem, nrm AS qnrm
            FROM n WHERE vec_id < $nq),
      sc AS (SELECT query_id, vec_id AS cand,
               CAST(floor(list_dot_product(qem, em) / (qnrm * nrm)
                          * 1000000.0) AS BIGINT) AS simqc
             FROM q JOIN n ON vec_id <> query_id),
      short AS (SELECT query_id, cand, simqc FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY simqc DESC, cand) AS rn
          FROM sc) WHERE rn <= $m),
      ps AS (SELECT s1.query_id, s1.cand AS a, s2.cand AS b,
               CAST(floor(list_dot_product(e1.em, e2.em) / (e1.nrm * e2.nrm)
                          * 1000000.0) AS BIGINT) AS s
             FROM short s1
             JOIN short s2 ON s1.query_id = s2.query_id AND s1.cand <> s2.cand
             JOIN n e1 ON e1.vec_id = s1.cand
             JOIN n e2 ON e2.vec_id = s2.cand),
      sel1 AS (SELECT query_id, cand, 7 * simqc AS score FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY simqc DESC, cand) AS rn
          FROM short) WHERE rn = 1),
      selu1 AS (SELECT query_id, cand, 1 AS rank, score FROM sel1),
      $steps
      SELECT query_id, CAST(rank AS BIGINT) AS rank, cand AS vec_id,
             CAST(score AS BIGINT) AS mmr_score
      FROM selu$k ORDER BY query_id, rank"""
  }
}
