package graft

import graft.operators.Hybrid
import org.apache.spark.sql.functions._

class HybridSpec extends SparkSpecBase {

  test("rrf fuses exactly and ranks are contiguous per query") {
    val out = Hybrid.retrieve(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (lex, vec, rrf) = (r.getLong(4), r.getLong(5), r.getLong(3))
      val expect = (if (lex > 0) 1000000L / (60L + lex) else 0L) +
                   (if (vec > 0) 1000000L / (60L + vec) else 0L)
      assert(rrf === expect, s"rrf arithmetic drift: $r")
      assert(lex > 0 || vec > 0, "every fused doc came from some system")
    }
    out.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      val ranks = rows.map(_.getLong(1)).sorted
      assert(ranks === (1L to ranks.length).toArray.toSeq, s"query $q ranks: $ranks")
      assert(ranks.length <= Hybrid.K)
    }
  }

  test("a doc that wins both systems fuses above docs one system believes in") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_rrf").toString
    val filler = (1 to 30).map(i => s"w$i").mkString(" ")
    val rows = Seq(
      1L -> "hash join hash join",               // dense in both query-0 terms
      2L -> s"hash hash hash hash $filler",      // lexical-only candidate
      3L -> "hash join") ++                      // the query verbatim
      (10L until 40L).map(i => i -> s"$filler doc$i")
    rows.map { case (id, t) => (id, t, "src0") }.toDF("doc_id", "text", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val q0 = Hybrid.retrieve(spark, tmp).where(col("query_id") === 0).collect()
      .map(r => r.getLong(2) -> ((r.getLong(1), r.getLong(4), r.getLong(5)))).toMap
    // docs 1 and 3 are scalar multiples of the query vector: cosine
    // exactly 1e6 for both, tie broken by doc_id → vector ranks {1,2};
    // both carry both terms so they beat the diluted doc 2 after fusion
    assert(Set(q0(1L)._3, q0(3L)._3) === Set(1L, 2L),
      s"query-direction docs take the top vector ranks: $q0")
    assert(q0.contains(1L) && q0.contains(2L))
    assert(Seq(q0(1L), q0(3L)).forall(v => v._2 > 0 && v._3 > 0),
      s"both-term docs appear in both systems: $q0")
    assert(q0(1L)._1 < q0(2L)._1 && q0(3L)._1 < q0(2L)._1,
      s"two-system docs outrank the lexical-only doc: $q0")
  }
}
