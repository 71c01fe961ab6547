package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract itself: every `queries` entry is either
  * oracle-checked or on the EXPLICIT rows-only list below. A new
  * operator missing its oracle would otherwise silently downgrade to
  * the weaker rows-only check — this spec turns that into a build
  * failure instead.
  */
class ContractSpec extends AnyFunSuite {

  /** Intentionally rows-only: engine-specific hashes (xxhash minhash/
    * simhash/LSH lanes), sketches (HLL/theta/KLL), and ANN variants —
    * each paired with an oracle-exact twin or an error-band spec.
    */
  private val rowsOnlyByDesign = Set(
    "dedup_clusters", "dedup_embedding_cosine_lsh", "dedup_minhash_lsh",
    "dedup_ngram_jaccard_lsh", "dedup_simhash",
    "q_approx_countd_parts", "q_approx_percentile",
    "q_hll_union", "q_theta_overlap",
    "sim_hnsw_persisted", "sim_hnsw_topk", "sim_ivf_incremental",
    "sim_ivf_persisted", "sim_ivf_topk", "sim_lsh_topk", "sim_pq_topk",
    "sim_sql_topk", // SQL TVF over the IVF index — spec'd ≡ ivfPersistedTopk
    "sim_sql_pq_topk", // SQL TVF over the persisted PQ index — spec'd ≡ pqPersistedTopk
    "text_decontaminate_semantic_lsh", "text_fingerprint")

  test("every query has an oracle unless explicitly rows-only; no orphan oracles") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val missing = q -- o -- rowsOnlyByDesign
    assert(missing.isEmpty,
      s"queries without an oracle and not declared rows-only: $missing")
    val stale = rowsOnlyByDesign -- q
    assert(stale.isEmpty, s"rows-only list names unknown queries: $stale")
    val overlap = rowsOnlyByDesign & o
    assert(overlap.isEmpty,
      s"declared rows-only but an oracle exists (drop one): $overlap")
    val orphans = o -- q
    assert(orphans.isEmpty, s"oracles without a query: $orphans")
  }

  test("oracle SQL is non-empty") {
    // (no single-statement lint: ';' appears legitimately inside
    // regex character classes in the quality-metrics oracle)
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, name)
    }
  }
}
