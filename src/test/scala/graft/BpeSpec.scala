package graft

import graft.functions.BpeCodec
import graft.operators.{Assembly, BpeTokenizer}
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpecBase {

  test("encode applies merges greedily left-to-right, like the SQL replace replay") {
    val codec = BpeCodec(Seq(("a", "a")))
    // greedy non-overlapping: aaa -> aa|a, aaaa -> aa|aa
    assert(codec.encode("aaa") === Seq("aa", "a"))
    assert(codec.encode("aaaa") === Seq("aa", "aa"))
    assert(codec.countWord("aaaa") === 2)
    // a merge never fires across symbol boundaries: with symbols
    // (xa, b) the pattern " a b" must not match inside " xa b"
    val codec2 = BpeCodec(Seq(("x", "a"), ("a", "b")))
    assert(codec2.encode("xab") === Seq("xa", "b"))
    // adjacent repeats all merge in ONE pass (prefix repr keeps the
    // next occurrence's leading marker intact): abab -> ab|ab
    val codec3 = BpeCodec(Seq(("a", "b")))
    assert(codec3.encode("abab") === Seq("ab", "ab"))
    assert(codec.encode("") === Seq.empty)
  }

  test("training learns the classic merge order on a toy corpus") {
    // freq-weighted pair counting: "lolo" x3 + "lox" x2 ->
    // (l,o) count 8 wins round 1; then (lo,lo) count 3 beats (lo,x) 2
    val merges = BpeTokenizer.trainDriver(
      Array(("lolo", 3L), ("lox", 2L)), nMerges = 8)
    assert(merges.take(2) === Seq(("l", "o"), ("lo", "lo")))
    // min-count guard: nothing repeats -> no merges
    assert(BpeTokenizer.trainDriver(Array(("ab", 1L)), 8) === Seq.empty)
  }

  test("driver and distributed trainers learn identical merges") {
    val wf = BpeTokenizer.wordFreq(spark, sfDir)
    import spark.implicits._
    val driver = BpeTokenizer.trainDriver(
      wf.as[(String, Long)].collect(), BpeTokenizer.DefaultMerges)
    val dist = BpeTokenizer.trainDistributed(wf, BpeTokenizer.DefaultMerges)
    assert(dist === driver)
    assert(driver.nonEmpty)
  }

  test("baked sf0.01 merge table matches what training produces (oracle drift guard)") {
    val codec = BpeTokenizer.trainCodec(spark, "/root/testdata/sf0.01")
    assert(codec.merges === BpeTokenizer.Sf001Merges,
      "BpeTokenizer.Sf001Merges is stale — regenerate it (and the baked " +
        "DuckDB oracle in SparkEntry follows automatically)")
  }

  test("bpe token counts: native expression equals per-word encode sums; subwords never exceed chars") {
    val out = BpeTokenizer.bpeTokens(spark, sfDir).collect()
    assert(out.length > 0)
    val codec = BpeTokenizer.trainCodec(spark, sfDir)
    val docs = new graft.sources.GraftCatalog(spark, sfDir).table("documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val re = BpeTokenizer.TokenRegex.r
    out.foreach { r =>
      val words = re.findAllIn(docs(r.getLong(0))).toSeq
      assert(r.getLong(1) === words.length.toLong)
      val expect = words.map(codec.countWord(_).toLong).sum
      assert(r.getLong(2) === expect, s"doc ${r.getLong(0)}")
      // BPE refines the pre-tokens: n_words <= bpe_tokens <= n_chars
      assert(r.getLong(2) >= r.getLong(1))
    }
  }

  test("E22: the persisted codec round-trips rank-exactly and artifact-served encoding equals scan-time") {
    import graft.operators.BpeTokenizer
    val model = graft.sources.GraftSink.scratchDir + "/bpe_model"
    val p = new org.apache.hadoop.fs.Path(model)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    BpeTokenizer.bpeModelTrain(spark, sfDir, model)
    // the merge LIST survives byte- and ORDER-exactly (order IS the codec)
    assert(BpeTokenizer.bpeModelLoad(spark, model).merges ===
      BpeTokenizer.trainCodec(spark, sfDir).merges)
    val scanTime = BpeTokenizer.bpeTokens(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val served = BpeTokenizer.bpeModelServe(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(served === scanTime,
      "artifact-served encode must equal the scan-time computation")
  }

  test("bpe-packed sequences conserve the corpus BPE token count") {
    val packed = Assembly.packSequencesBpe(spark, sfDir).collect()
    assert(packed.nonEmpty)
    val total = BpeTokenizer.bpeTokens(spark, sfDir)
      .agg(sum("bpe_tokens")).head().getLong(0)
    assert(packed.map(_.getLong(4)).sum === total)
    // contiguous seq numbering per (source, bucket), same as H1
    packed.groupBy(r => (r.getString(0), r.getLong(1))).foreach { case (k, rs) =>
      val ns = rs.map(_.getLong(2)).sorted
      assert(ns.head === 0L && ns === (0L until ns.length).toArray.toSeq,
        s"non-contiguous sequence numbers in $k")
    }
  }
}
