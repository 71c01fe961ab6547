package graft

import graft.operators.Assembly
import org.apache.spark.sql.functions._

class AssemblySpec extends SparkSpecBase {

  test("sequence packing conserves every token and fills windows in order") {
    val seqs = Assembly.packSequences(spark, sfDir)
    val rows = seqs.collect()
    assert(rows.nonEmpty)
    // token conservation: packed totals equal the corpus token count
    val packed = rows.map(_.getLong(4)).sum
    val corpus = new graft.sources.GraftCatalog(spark, sfDir).table("documents")
      .select(size(regexp_extract_all(col("text"),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long").as("t"))
      .agg(sum("t")).head().getLong(0)
    assert(packed === corpus, s"packed $packed of $corpus tokens")
    // within each (source, bucket), sequences number 0..max contiguously
    rows.groupBy(r => (r.getString(0), r.getLong(1))).foreach { case (k, rs) =>
      val ns = rs.map(_.getLong(2)).sorted
      assert(ns.head === 0L && ns === (0L until ns.length).toArray.toSeq.sorted,
        s"non-contiguous sequence numbers in $k: ${ns.toSeq}")
    }
    // contiguous fill: every sequence but the bucket-last holds at
    // least a full window's START (its docs' running count crosses the
    // boundary), so only the last can be under-full by construction —
    // checkable as: per group, all but the final seq have
    // seq_tokens >= SeqLen - (max doc tokens); weak bound, main value
    // is the oracle hash match.
  }

  test("chunking covers every word, overlaps by size-stride, and clips the tail") {
    val out = Assembly.chunkDocuments(spark, sfDir).collect()
    assert(out.nonEmpty)
    val byDoc = out.groupBy(_.getLong(0))
    byDoc.foreach { case (doc, chunks) =>
      val sorted = chunks.sortBy(_.getLong(1))
      // contiguous chunk numbering from 0
      assert(sorted.map(_.getLong(1)).toSeq === (0L until sorted.length).toSeq)
      // geometry: starts advance by stride; every chunk is full-size
      // except possibly the last, which clips at the doc end
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(2) === i * Assembly.ChunkStride)
        if (i < sorted.length - 1) assert(r.getLong(3) === Assembly.ChunkSize)
        assert(r.getLong(3) >= 1L)
      }
      // coverage: last chunk reaches exactly the word count
      val last = sorted.last
      val nw = last.getLong(2) + last.getLong(3)
      // a doc with more than one chunk must need its last chunk
      if (sorted.length > 1)
        assert(nw > (sorted.length - 1) * Assembly.ChunkStride,
          s"doc $doc final chunk redundant")
    }
  }

  test("chunk geometry on crafted word counts: 1 chunk at 64 words, 2 at 100, 3 at 150") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_chunk").toString
    // letter-only words — the pre-token regex would split "w12" into
    // the letter run and the digit run
    def wd(i: Int) = "w" + i.toString.map(c => ('a' + (c - '0')).toChar)
    def doc(n: Int) = (1 to n).map(wd).mkString(" ")
    Seq((64L, doc(64)), (100L, doc(100)), (150L, doc(150)), (1L, "solo"))
      .toDF("doc_id", "text")
      .withColumn("source", lit("srcA"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Assembly.chunkDocuments(spark, tmp).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1))).toMap
    assert(out(64L).length === 1 && out(64L).head.getLong(3) === 64L)
    assert(out(100L).length === 2)
    assert(out(100L)(1).getLong(2) === 56L && out(100L)(1).getLong(3) === 44L)
    assert(out(150L).length === 3)
    assert(out(150L)(2).getLong(2) === 112L && out(150L)(2).getLong(3) === 38L)
    assert(out(1L).length === 1 && out(1L).head.getString(4) === "solo"
      && out(1L).head.getString(5) === "solo")
    // boundary words line up with the crafted vocabulary
    assert(out(150L)(1).getString(4) === wd(57) && out(150L)(1).getString(5) === wd(120))
  }

  test("packing splits a bucket into multiple windows when tokens exceed SeqLen") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_pack").toString
    // 30 docs x 100 single-letter tokens = 3000 tokens > 2048 -> 2 seqs
    val txt = Seq.fill(100)("a").mkString(" ")
    (0L until 30L).map(i => (i, txt, "srcX"))
      .toDF("doc_id", "text", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Assembly.packSequences(spark, tmp).collect()
      .map(r => r.getLong(2) -> (r.getLong(3), r.getLong(4))).toMap
    assert(out.keySet === Set(0L, 1L), s"got $out")
    // window 0 holds the docs whose cumulative start is < 2048:
    // docs 0..20 start at 0,100,...,2000 -> 21 docs, 2100 tokens
    assert(out(0L) === ((21L, 2100L)), s"got $out")
    assert(out(1L) === ((9L, 900L)), s"got $out")
  }

  test("packing plans ONE exchange: window and aggregate share the bucket partitioning") {
    val plan = Assembly.packSequences(spark, sfDir).queryExecution.executedPlan.toString
    // hash-partitioning by (source, bucket) for the window already
    // clusters (source, bucket, seq_no), so the groupBy must NOT add a
    // second hash exchange; the only other exchange is the output sort
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges === 1,
      s"expected 1 hash exchange (shared by window+agg), got $hashExchanges:\n${plan.take(1200)}")
  }

  test("BPE packing keeps the ONE-exchange plan; chunking plans no exchange before the sort") {
    val bpePlan = Assembly.packSequencesBpe(spark, sfDir)
      .queryExecution.executedPlan.toString
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(bpePlan).size
    assert(hashExchanges === 1,
      s"BPE packing must share the (source, bucket) exchange, got $hashExchanges")
    // chunking is map-only: explode + arithmetic; the ONLY exchange is
    // the output ordering's range partitioning
    val chunkPlan = Assembly.chunkDocuments(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!chunkPlan.contains("Exchange hashpartitioning"),
      s"chunking must not shuffle:\n${chunkPlan.take(1200)}")
  }

  test("split packing fills every non-final window to exactly SeqLen and conserves tokens") {
    val rows = Assembly.packSequencesSplit(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // token conservation (split packing loses nothing to boundaries)
    val packed = rows.map(_.getLong(4)).sum
    val corpus = new graft.sources.GraftCatalog(spark, sfDir).table("documents")
      .select(size(regexp_extract_all(col("text"),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long").as("t"))
      .agg(sum("t")).head().getLong(0)
    assert(packed === corpus, s"packed $packed of $corpus tokens")
    rows.groupBy(r => (r.getString(0), r.getLong(1))).foreach { case (k, rs) =>
      val sorted = rs.sortBy(_.getLong(2))
      // windows number 0..max contiguously
      assert(sorted.map(_.getLong(2)).toSeq === (0L until sorted.length).toSeq,
        s"non-contiguous windows in $k")
      // THE split-packing property: every window but the last is full
      sorted.init.foreach(r =>
        assert(r.getLong(4) === Assembly.SeqLen, s"$k window ${r.getLong(2)} underfull"))
      assert(sorted.last.getLong(4) <= Assembly.SeqLen)
    }
  }

  test("token-budget sampling keeps the smallest source whole and rates others down") {
    val rows = Assembly.tokenBudgetSample(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val budget = rows.head.getLong(4)
    assert(rows.forall(_.getLong(4) === budget), "one shared budget")
    assert(budget === rows.map(_.getLong(3)).min, "budget = smallest source's tokens")
    rows.foreach { r =>
      val (nDocs, nKept, total, rate, kept) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5), r.getLong(6))
      assert(rate === budget * 1000000L / total)
      assert(rate <= 1000000L && nKept <= nDocs && kept <= total)
      // the budget-defining source has rate 1e6 -> keeps every doc
      if (total === budget) assert(nKept === nDocs && kept === total)
    }
  }

  test("assembled corpus is a packed subset of the curated corpus") {
    val assembled = Assembly.assembleCorpus(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(assembled.nonEmpty)
    val curated = graft.operators.Dedup.curateCorpus(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap // n_kept, kept_tokens
    assembled.foreach { case (src, (nDocs, nSeqs, totalToks)) =>
      val (nKept, keptToks) = curated(src)
      assert(nDocs <= nKept, s"$src: sampled $nDocs of $nKept")
      assert(totalToks <= keptToks, s"$src: packed $totalToks of $keptToks tokens")
      assert(nSeqs >= 1 && nSeqs <= nDocs, s"$src: $nSeqs seqs for $nDocs docs")
    }
  }

  test("mixture sampling is deterministic and tracks the target weights") {
    val a = Assembly.mixtureSample(spark, sfDir).collect()
    val b = Assembly.mixtureSample(spark, sfDir).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq, "must be deterministic")
    a.foreach { r =>
      val (n, kept, w) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(kept <= n)
      assert(Set(100000L, 300000L, 500000L, 700000L, 900000L).contains(w))
    }
    // high-weight sources must keep more (in aggregate) than low-weight
    val byW = a.groupBy(_.getLong(3)).view
      .mapValues(rs => rs.map(_.getLong(2)).sum.toDouble / rs.map(_.getLong(1)).sum)
    assert(byW(900000L) > byW(100000L),
      s"0.9-weight sources must keep a larger fraction: $byW")
  }

  test("curriculum stages: per-source quartiles, easy before hard, no global window") {
    val dir = "/root/testdata/sf0.01"
    val out = graft.operators.Assembly.curriculumStages(spark, dir)
    val rows = out.collect()
    assert(rows.length === 500)
    // every source spans all 4 stages, near-even (ntile property)
    rows.groupBy(_.getString(1)).foreach { case (src, rs) =>
      val sizes = rs.groupBy(_.getLong(4)).view.mapValues(_.length)
      assert(sizes.keySet === Set(1L, 2L, 3L, 4L), s"$src missing a stage")
      assert(sizes.values.max - sizes.values.min <= 1, s"$src uneven: $sizes")
      // within a source, stage 1 docs are uniformly no harder than stage 4
      val minEasy = rs.filter(_.getLong(4) === 1L).map(_.getLong(3)).min
      val maxHard = rs.filter(_.getLong(4) === 4L).map(_.getLong(3)).max
      assert(minEasy >= maxHard, s"$src: stage1 min $minEasy < stage4 max $maxHard")
    }
    // the staging window is per-source — never an unpartitioned
    // (whole-corpus) window. (The E8 subtree's 1-row scalar `total`
    // aggregate legitimately collapses; a window would not. String
    // check because AQE wraps stages in leaf nodes `collect` skips.)
    val plan = out.queryExecution.executedPlan.toString
    assert("Window \\[ntile\\(4\\)[^\\n]*\\], \\[source#".r
      .findFirstIn(plan).isDefined, plan.take(900))
  }

  test("train/val/test split: exhaustive, disjoint by construction, ~90/5/5, rule-recoverable") {
    val dir = "/root/testdata/sf0.01"
    val out = graft.operators.Assembly.trainValTestSplit(spark, dir).collect()
    val total = out.map(_.getLong(2)).sum
    assert(total === 500L, "every doc lands in exactly one split")
    val bySplit = out.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(bySplit("train") >= 400L && bySplit("train") <= 490L, bySplit.toMap.toString)
    assert(bySplit.getOrElse("val", 0L) + bySplit.getOrElse("test", 0L) === 500L - bySplit("train"))
    // the rule IS the assignment: re-deriving per doc reproduces the
    // aggregate exactly
    val docs = new graft.sources.GraftCatalog(spark, dir).table("documents")
      .select("doc_id", "source").collect()
    val expect = docs.groupBy { r =>
      val b = (r.getLong(0) * 1048573L + 11L) % 100L
      (r.getString(1), if (b < 90) "train" else if (b < 95) "val" else "test")
    }.view.mapValues(_.length.toLong).toMap
    val got = out.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === expect)
  }

  test("contrastive pairs: planted near-dups pair up, negatives are the hardest below threshold") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_cp").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val rows = Seq(
      1L -> s"$base lambda",          // near-dup of 2
      2L -> s"$base mu",              // near-dup of 1
      3L -> "alpha beta gamma other words here mixed bag of tokens",
      4L -> "totally different vocabulary nothing shared at all here now") ++
      (10L until 30L).map(i => i -> s"doc$i unique text number $i with words w${i}a w${i}b")
    rows.map { case (id, t) => (id, t, "src0") }.toDF("doc_id", "text", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = operators.Assembly.contrastivePairs(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(out.contains(1L) && out(1L)._1 === 2L, s"doc 1's positive is its near-dup: $out")
    assert(out.contains(2L) && out(2L)._1 === 1L)
    assert(!out.contains(4L), "a doc with no near-dup yields no triplet")
    out.values.foreach { case (_, pc, _, nc, margin) =>
      assert(pc >= operators.Assembly.PosThetaMicro)
      assert(nc < operators.Assembly.NegThetaMicro)
      assert(margin === pc - nc)
    }
    // corpus: thresholds hold on every triplet, and the negative is
    // verifiably the HARDEST sub-threshold candidate for one anchor
    val corpus = operators.Assembly.contrastivePairs(spark, sfDir)
    val first = corpus.limit(1).collect()(0)
    val (anchor, negId, negCos) = (first.getLong(0), first.getLong(3), first.getLong(4))
    val e = operators.HashEmbed.embeddings(spark, sfDir).where(col("norm2") > 0)
      .withColumn("nrm", sqrt(col("norm2").cast("double")))
    val aRow = e.where(col("doc_id") === anchor).collect()(0)
    val hardest = e.where(col("doc_id") =!= anchor).collect()
      .map { r =>
        val dot = r.getSeq[Long](1).zip(aRow.getSeq[Long](1)).map { case (x, y) => x * y }.sum
        (r.getLong(0), math.floor(dot.toDouble / (r.getDouble(3) * aRow.getDouble(3)) * 1e6).toLong)
      }
      .filter(_._2 < operators.Assembly.NegThetaMicro)
      .sortBy { case (id, c) => (-c, id) }.head
    assert((negId, negCos) === hardest, "driver replay of the hardest negative")
  }

  test("H12: weighted sample replays exactly on the driver, biases toward heavy docs, and plans TakeOrdered") {
    import org.apache.spark.sql.functions._
    val df = operators.Assembly.weightedSample(spark, sfDir, k = 50)
    // top-k must tree-reduce, never globally sort the corpus
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(600))
    val out = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length === 50)
    // full driver replay of the A-ES keys and the selected set
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        greatest(size(array_distinct(graft.functions.TextFns.tokensLower(col("text"))))
          .cast("long"), lit(1L)).as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val replay = corpus.map { case (id, w) =>
      val u = (math.floorMod(id * 1048573L + 11L, 1000000L) + 1L).toDouble / 1000000.0
      (id, w, math.floor(math.log(u) / w * 1000000.0).toLong)
    }.sortBy { case (id, _, key) => (-key, id) }.take(50)
    assert(out.toSeq === replay.toSeq, "engine sample must equal the driver A-ES replay")
    // weighting works: the sampled docs are heavier than the corpus mean
    val meanAll = corpus.map(_._2).sum.toDouble / corpus.length
    val meanSampled = out.map(_._2).sum.toDouble / out.length
    assert(meanSampled > meanAll,
      s"weighted sample must bias heavy: $meanSampled vs corpus $meanAll")
    // deterministic across runs
    assert(operators.Assembly.weightedSample(spark, sfDir, k = 50)
      .collect().map(_.toString).toSeq === df.collect().map(_.toString).toSeq)
  }

  test("H11: cluster-keyed split co-locates every near-dup cluster and closes real doc-level leakage") {
    import org.apache.spark.sql.functions._
    val agg = operators.Assembly.clusterSafeSplit(spark, sfDir).collect()
    assert(agg.map(_.getString(0)).toSet === Set("train", "val", "test"))
    // the split covers every doc exactly once
    val total = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(agg.map(_.getLong(1)).sum === total)
    // invariant: no cluster spans two splits (replay at doc grain)
    val clusters = operators.Dedup.nearDupClustersExact(spark, sfDir)
    val bucket = pmod(col("cluster") * 1048573L + 11L, lit(100L))
    val split = when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    val spans = clusters.select(col("cluster"), split.as("split"))
      .groupBy("cluster").agg(count_distinct(col("split")).as("ns"))
      .where(col("ns") > 1).count()
    assert(spans === 0L, "a cluster must never straddle splits")
    // the operator is non-vacuous on this corpus: a doc-level split
    // WOULD have separated some near-dup pair across splits
    assert(agg.map(_.getLong(4)).sum > 0L,
      "expected at least one doc a doc-level split would have leaked")
  }

  test("H13: packing efficiency — driver replay exact, lower bound holds, waste is the bucket-boundary cost") {
    import org.apache.spark.sql.functions._
    val rows = operators.Assembly.packEfficiency(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("source"), expr("doc_id div 1000").as("bucket"),
        size(regexp_extract_all(col("text"),
          lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long").as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val seqLen = operators.Assembly.SeqLen
    rows.foreach { r =>
      val src = r.getString(0)
      val mine = toks.filter(_._1 == src)
      val byBucket = mine.groupBy(_._2).view.mapValues(_.map(_._3).sum)
      val actual = byBucket.values.map(t => (t + seqLen - 1) / seqLen).sum
      val total = mine.map(_._3).sum
      val lb = (total + seqLen - 1) / seqLen
      assert(r.getLong(3) === total, s"$src total tokens")
      assert(r.getLong(4) === actual, s"$src actual windows (per-bucket ceilings)")
      assert(r.getLong(5) === lb, s"$src single-stream lower bound")
      assert(lb <= actual, "contiguous fill can never beat the single-stream bound")
      assert(r.getLong(6) === actual - lb)
      assert(r.getLong(7) > 0L && r.getLong(7) <= 1000000L,
        s"$src efficiency out of range: ${r.getLong(7)}")
    }
  }

  test("H5 plan: ONE tokenize — totals and the keep-rate join both read the cached token grain") {
    val df = operators.Assembly.tokenBudgetSample(spark, sfDir)
    val nodes = allPlanNodes(df.queryExecution.executedPlan)
    assert(nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }.isEmpty,
      "no direct file scan in the final plan: the corpus must be " +
        "regex-tokenized once into the cached (doc, source, tokens) grain")
    assert(nodes.collect {
      case i: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => i }
      .nonEmpty, "expected InMemoryTableScan of the cached token grain")
    assert(!graft.plans.GraftDoctor.lint(df)
      .exists(_.rule == "repeated-uncached-subtree"),
      "the repeated-uncached-subtree lint must stay silent on the fixed plan")
  }

  test("H14: seeded shuffle is deterministic, seed-sensitive; keyed resume equals offset and prunes a materialized epoch") {
    import org.apache.spark.sql.functions._
    val docs = new graft.sources.GraftCatalog(spark, sfDir)
      .table("documents").select("doc_id")
    def order(seed: String): Seq[(Long, String)] =
      graft.operators.Assembly.seededShuffle(docs, seed)
        .orderBy("shuffle_key").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
    val ep1 = order("ep1")
    assert(order("ep1") === ep1, "the same seed reproduces the same order")
    assert(order("ep2").map(_._1) !== ep1.map(_._1),
      "a new seed is a fresh permutation")
    // keyed resume ≡ offset semantics, replayed on the driver
    val watermark = ep1(19)._2
    val resumed = graft.operators.Assembly.resumeAfter(
        graft.operators.Assembly.seededShuffle(docs, "ep1"), watermark)
      .orderBy("shuffle_key").limit(20)
      .collect().map(_.getLong(0)).toSeq
    assert(resumed === ep1.slice(20, 40).map(_._1))
    // materialized epoch: the watermark predicate reaches the parquet
    // scan (min/max stats then prune consumed row groups)
    val path = graft.sources.GraftSink.scratchDir + "/shuffle_epoch"
    graft.operators.Assembly.seededShuffle(docs, "ep1")
      .repartitionByRange(4, col("shuffle_key"))
      .sortWithinPartitions("shuffle_key")
      .write.mode("overwrite").parquet(path)
    val fromDisk = graft.operators.Assembly.resumeAfter(
      spark.read.parquet(path), watermark)
    val scans = allPlanNodes(fromDisk.queryExecution.executedPlan).collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc }
    assert(scans.nonEmpty &&
      scans.head.metadata("PushedFilters").contains("GreaterThan(shuffle_key"),
      s"resume must push into the scan: ${scans.headOption.map(_.metadata)}")
    assert(fromDisk.orderBy("shuffle_key").limit(20)
      .collect().map(_.getLong(0)).toSeq === resumed)
  }
}
