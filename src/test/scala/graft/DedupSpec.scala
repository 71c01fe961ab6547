package graft

import graft.functions.TextFns
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpecBase {

  test("exact dedup keeps min doc_id per distinct text") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "unique text here"), (7L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val out = df.groupBy("text")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "n_copies")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 3L, 3L -> 1L))
  }

  test("minhash LSH surfaces planted near-duplicates first") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far away into the green forest tonight"
    val nearDup = base.replace("tonight", "today") // ~1 token of ~17 changed
    val docs = Seq((100L, base), (200L, nearDup)) ++
      (0L until 50L).map(i => (i, s"totally different content number $i with random words like item$i thing$i widget$i gadget$i gizmo$i"))
    val df = docs.toDF("doc_id", "text")
    val sh = TextFns.wordShingles(TextFns.tokensLower(col("text")), 3)
    val sigs = df.select(col("doc_id"), sh.as("shingles"))
      .withColumn("sig", TextFns.minhashSignature(TextFns.shingleHashes(col("shingles")), 64))
      .withColumn("bands", TextFns.bandHashes(col("sig"), 16, 4))
    val exploded = sigs.select(col("doc_id"), posexplode(col("bands")).as(Seq("bi", "bh")))
    val pairs = exploded.as("a").join(exploded.as("b"),
        col("a.bi") === col("b.bi") && col("a.bh") === col("b.bh") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((100L, 200L)), s"expected planted pair in ${pairs.toSeq}")
  }

  test("estimated jaccard tracks exact jaccard on near-dups") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"word$i").mkString(" ")
    val near = (1 to 40).map(i => if (i == 40) "changed" else s"word$i").mkString(" ")
    val df = Seq((1L, base), (2L, near)).toDF("doc_id", "text")
    val sh = TextFns.wordShingles(TextFns.tokensLower(col("text")), 3)
    val sigs = df.select(col("doc_id"), sh.as("shingles"))
      .withColumn("sig", TextFns.minhashSignature(TextFns.shingleHashes(col("shingles")), 64))
    val a = sigs.where(col("doc_id") === 1).select(col("sig").as("sa"), col("shingles").as("ha"))
    val b = sigs.where(col("doc_id") === 2).select(col("sig").as("sb"), col("shingles").as("hb"))
    val r = a.crossJoin(b).select(
      TextFns.estJaccard(col("sa"), col("sb")).as("est"),
      TextFns.exactJaccard(col("ha"), col("hb")).as("exact")).collect()(0)
    val (est, exact) = (r.getDouble(0), r.getDouble(1))
    assert(exact > 0.8, s"exact=$exact")
    assert(math.abs(est - exact) < 0.25, s"est=$est exact=$exact")
  }

  test("simhash hamming distance is small for near-dup, large for unrelated") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = (1 to 60).map(i => if (i % 30 == 0) "swapped" else s"tok$i").mkString(" ")
    val other = (100 to 160).map(i => s"zzz$i").mkString(" ")
    val df = Seq((1L, base), (2L, near), (3L, other)).toDF("doc_id", "text")
    val sigs = df.select(col("doc_id"),
      TextFns.simhash64(TextFns.shingleHashes(TextFns.tokensLower(col("text")))).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(2L)) < ham(sigs(1L), sigs(3L)),
      s"near=${ham(sigs(1L), sigs(2L))} far=${ham(sigs(1L), sigs(3L))}")
  }

  test("dedup operators run end-to-end on the sf0.001 tables") {
    assert(Dedup.exactDedup(spark, sfDir).count() > 0)
    assert(Dedup.minhashLsh(spark, sfDir).count() > 0)
    assert(Dedup.simhash(spark, sfDir).count() > 0)
    assert(Dedup.ngramJaccard(spark, sfDir).count() > 0)
    assert(Dedup.embeddingCosine(spark, sfDir).count() > 0)
  }

  test("label propagation groups a planted 3-chain into one cluster") {
    import spark.implicits._
    // a->b and b->c near-dups (a,c differ more) => one component {a,b,c}
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val mid = (1 to 30).map(i => if (i == 30) "x" else s"w$i").mkString(" ")
    val far = (1 to 30).map(i => if (i >= 29) s"y$i" else s"w$i").mkString(" ")
    val docs = Seq((1L, base), (2L, mid), (3L, far)) ++
      (10L until 40L).map(i => (i, (1 to 30).map(j => s"other${i}_$j").mkString(" ")))
    // run the full operator against a temp parquet dir
    val tmp = java.nio.file.Files.createTempDirectory("graft_clu").toString
    docs.toDF("doc_id", "text").withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = graft.operators.Dedup.nearDupClusters(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === 1L && out(2L) === 1L && out(3L) === 1L,
      s"expected chain collapse, got ${out.view.filterKeys(_ <= 3).toMap}")
    assert(out(10L) === 10L)
  }
}
