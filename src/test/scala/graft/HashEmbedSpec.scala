package graft

import graft.operators.HashEmbed
import org.apache.spark.sql.functions._

class HashEmbedSpec extends SparkSpecBase {

  test("hash embedding matches a driver-side fold on a crafted doc") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_he").toString
    Seq((1L, "alpha beta alpha", "a"), (2L, "", "a"))
      .toDF("doc_id", "text", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    def wh(w: String): Long = w.foldLeft(0L)((h, c) => (h * 257L + c.toLong) % HashEmbed.P)
    val expect = Array.fill(HashEmbed.Dim)(0L)
    Seq(("alpha", 2L), ("beta", 1L)).foreach { case (w, n) =>
      val h = wh(w)
      val sign = if ((h / HashEmbed.Dim) % 2 == 0) 1L else -1L
      expect((h % HashEmbed.Dim).toInt) += sign * n
    }
    val rows = HashEmbed.hashEmbed(spark, tmp).collect()
    val r1 = rows.find(_.getLong(0) == 1L).get
    assert(r1.getString(3) === expect.mkString(","))
    assert(r1.getLong(2) === expect.map(v => v * v).sum)
    // the empty doc embeds as the zero vector, not a dropped row
    val r2 = rows.find(_.getLong(0) == 2L).get
    assert(r2.getLong(1) === 0L && r2.getLong(2) === 0L)
  }

  test("near-identical docs retrieve each other first") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_knn").toString
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (0L, base, "a"),
      (1L, base + " tonight", "a"), // near-dup of 0
      (2L, "completely different words about spark shuffles and parquet", "a"),
      (3L, "unrelated content mentioning embeddings and retrieval quality", "a"),
      (4L, "more filler text so the corpus is not degenerate at all", "a"))
    docs.toDF("doc_id", "text", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val knn = HashEmbed.hashEmbedKnn(spark, tmp).collect()
    val top0 = knn.filter(r => r.getLong(0) == 0L && r.getLong(1) == 1L).head
    assert(top0.getLong(2) === 1L, s"doc 0's nearest must be its near-dup: ${knn.mkString(";")}")
    val top1 = knn.filter(r => r.getLong(0) == 1L && r.getLong(1) == 1L).head
    assert(top1.getLong(2) === 0L)
    // ranks are dense, per-query, and never self-referential
    knn.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq === (1L to rs.length).toSeq)
      assert(!rs.map(_.getLong(2)).contains(q))
    }
  }
}
