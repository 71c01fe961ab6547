package graft

import graft.functions.TextFns
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpecBase {

  test("unigram logprob scores common-word docs above rare-word docs") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_lp").toString
    val common = Seq.fill(10)("common").mkString(" ")
    val rare = (1 to 10).map(i => s"rareword$i").mkString(" ")
    (Seq((1L, common, "a"), (2L, rare, "a")) ++
      (10L until 20L).map(i => (i, common, "a")))
      .toDF("doc_id", "text", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = graft.operators.TextAnalysis.unigramLogprob(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out.values.forall(_ < 0L), "log-probs are negative micro values")
    assert(out(1L) > out(2L),
      s"the all-common doc must outscore the all-rare doc: $out")
    // corpus-level sanity on the real tables
    val corpus = graft.operators.TextAnalysis.unigramLogprob(spark, sfDir).collect()
    assert(corpus.length === 500 || corpus.nonEmpty)
    assert(corpus.forall(r => r.getLong(1) === 0L || r.getLong(3) < 0L))
  }

  test("unigram per-word lp matches driver Math.log and the pre-aggregated form matches the instance form") {
    import spark.implicits._
    val documents = new graft.sources.GraftCatalog(spark, sfDir).table("documents")
    val words = expr("filter(split(trim(lower(text)), '\\\\s+'), w -> length(w) > 0)")
    val toks = documents.select(col("doc_id"), explode(words).as("word"))
    // ULP diagnosability: every distinct count's engine-side
    // floor(log(cnt/total)*1e6) must equal the driver's Math.log — if
    // a cross-engine hash ever breaks, re-run this to localize which
    // word count sits on a flipped micro boundary
    val total = toks.count().toDouble
    val pairs = toks.groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(col("cnt"),
        floor(log(col("cnt").cast("double") / lit(total)) * 1000000.0)
          .cast("long").as("lp"))
      .distinct().collect()
    pairs.foreach { r =>
      val expect = math.floor(math.log(r.getLong(0).toDouble / total) * 1e6).toLong
      assert(r.getLong(1) === expect, s"cnt=${r.getLong(0)} lp boundary drift")
    }
    // the (doc, word) pre-aggregated operator equals the naive
    // token-instance formulation row for row
    val naive = {
      val counts = toks.groupBy("word").agg(count(lit(1)).as("cnt"))
      val scored = toks.join(counts, Seq("word"))
        .select(col("doc_id"),
          floor(log(col("cnt").cast("double") / lit(total)) * 1000000.0)
            .cast("long").as("lp"))
      scored.groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"), sum("lp").as("sum_lp_micro"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    }
    graft.operators.TextAnalysis.unigramLogprob(spark, sfDir).collect().foreach { r =>
      val (nw, lp) = naive.getOrElse(r.getLong(0), (0L, 0L))
      assert(r.getLong(1) === nw && r.getLong(2) === lp, s"doc ${r.getLong(0)}")
    }
  }

  test("vocab coverage curve is monotone, exact, and TakeOrdered-planned") {
    val df = graft.operators.TextAnalysis.vocabCoverage(spark, sfDir)
    // top-k must plan as tree-reduced TakeOrdered, never a global sort
    // of the vocabulary through one partition
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k not TakeOrdered:\n$plan")
    val rows = df.collect()
    // the synthetic corpus has a tiny vocabulary — top-50 clips to it
    val vocab = new graft.sources.GraftCatalog(spark, sfDir).table("documents")
      .select(explode(expr(
        "filter(split(trim(lower(text)), '\\\\s+'), w -> length(w) > 0)")).as("w"))
      .distinct().count()
    assert(rows.length === math.min(50L, vocab).toInt)
    assert(rows.map(_.getLong(0)).toSeq === (1L to rows.length))
    // counts non-increasing, cumulative strictly increasing
    val cnts = rows.map(_.getLong(2))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
    val cums = rows.map(_.getLong(3))
    assert(cums.toSeq === cnts.scanLeft(0L)(_ + _).tail.toSeq)
    // exact integer coverage against a driver-side recount
    val total = new graft.sources.GraftCatalog(spark, sfDir).table("documents")
      .select(explode(expr(
        "filter(split(trim(lower(text)), '\\\\s+'), w -> length(w) > 0)")).as("w"))
      .count()
    rows.foreach(r => assert(r.getLong(4) === r.getLong(3) * 1000000L / total))
    assert(rows.last.getLong(4) > 0L && rows.last.getLong(4) <= 1000000L)
  }

  test("quality metrics exact on a crafted document") {
    import spark.implicits._
    val df = Seq((1L, "The cat, the dog; and 42 birds!")).toDF("doc_id", "text")
    val toks = TextFns.tokens(col("text"))
    val out = df.select(
      size(toks).as("n_tokens"),
      size(regexp_extract_all(col("text"), lit("[.,!?;:]"), lit(0))).as("n_punct"),
      size(regexp_extract_all(col("text"), lit("[0-9]"), lit(0))).as("n_digits"),
      size(filter(TextFns.tokensLower(col("text")),
        t => t.isin("the", "a", "of", "and", "in", "to", "is"))).as("n_stop"))
      .collect()(0)
    assert(out.getInt(0) === 7)   // The cat, the dog; and 42 birds!
    assert(out.getInt(1) === 3)   // , ; !
    assert(out.getInt(2) === 2)   // 4 2
    assert(out.getInt(3) === 3)   // the, the, and
  }

  test("langid picks the language whose stopwords dominate") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat of the house and the dog"),
      (2L, "der hund und die katze mit der maus"),
      (3L, "la casa de la playa y los perros"))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      TextFns.langIdScores(TextFns.tokensLower(col("text"))).getField("lang").as("pred"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "en")
    assert(out(2L) === "de")
    assert(out(3L) === "es")
  }

  test("winnowing fingerprints overlap heavily for shared substrings") {
    import spark.implicits._
    val shared = "common shared substring that is long enough to fingerprint reliably"
    val df = Seq(
      (1L, s"$shared with suffix one"),
      (2L, s"$shared with suffix two"),
      (3L, "completely different text that shares nothing at all with others"))
      .toDF("doc_id", "text")
    val fp = df.select(col("doc_id"),
      TextFns.winnowingFingerprints(col("text"), 8, 4).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val sim12 = (fp(1L) intersect fp(2L)).size.toDouble / (fp(1L) union fp(2L)).size
    val sim13 = (fp(1L) intersect fp(3L)).size.toDouble / (fp(1L) union fp(3L)).size
    assert(sim12 > 0.5, s"sim12=$sim12")
    assert(sim13 < 0.2, s"sim13=$sim13")
  }

  test("native gram-hash expression matches the per-position SQL formulations") {
    import spark.implicits._
    val texts = Seq("abcdefghijklm", "tiny", "exactly8", "sev7", "",
      "café résumé naïve déjà vu", "spaces  and\ttabs here").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("doc_id", "text")
    // xxh64 mode (k=8) vs xxhash64(substring) with the clipped fallback
    val viaExpr = df.select(col("doc_id"),
      explode(sequence(lit(0), greatest(length(col("text")) - 8, lit(0)))).as("pos"),
      col("text"))
      .select(col("doc_id"), col("pos"),
        xxhash64(col("text").substr(col("pos") + 1, lit(8))).as("gram"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val viaNative = df.select(col("doc_id"),
      posexplode(TextFns.gramHashes(col("text"), 8)).as(Seq("pos", "gram")))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(viaNative === viaExpr)
    // poly mode (k=5) vs the widened ascii(substring) polynomial
    val polyExpr = df.where(length(col("text")) >= 5)
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("text")) - 4)).as("p"), col("text"))
      .select(col("doc_id"), col("p"), expr(
        """cast(ascii(substring(text, p, 1)) as bigint) * 4362470401 +
           cast(ascii(substring(text, p + 1, 1)) as bigint) * 16974593 +
           cast(ascii(substring(text, p + 2, 1)) as bigint) * 66049 +
           cast(ascii(substring(text, p + 3, 1)) as bigint) * 257 +
           cast(ascii(substring(text, p + 4, 1)) as bigint)""").as("h"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val polyNative = df.select(col("doc_id"),
      posexplode(TextFns.polyGramHashes(col("text"), 5)).as(Seq("p0", "h")))
      .select(col("doc_id"), (col("p0") + 1).as("p"), col("h"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(polyNative === polyExpr)
  }

  test("portable fingerprint matches a plain-Scala winnowing reference") {
    import spark.implicits._
    def poly(s: String): Long =
      s.foldLeft(0L)((acc, c) => acc * 257L + c.toLong)
    def ref(text: String): Seq[Long] = {
      val hs = (0 to text.length - 5).map(p => poly(text.substring(p, p + 5)))
      if (hs.length < 4) Seq.empty
      else (0 to hs.length - 4).map(j => hs.slice(j, j + 4).min).distinct
    }
    val texts = Seq((0L, "abcdefghij klm nop qrs"), (1L, "tiny"),
      (2L, "aaaaaaaaaaaaaaaa"), (3L, "the quick brown fox jumps over"),
      // codepoints >= 127: é=233 would overflow a 32-bit ascii()*coef
      (4L, "café résumé naïve déjà vu encore"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_fpx").toString
    texts.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.fingerprintExact(spark, tmp).collect()
      .map(r => r.getLong(0) -> r).toMap
    texts.foreach { case (id, t) =>
      val fp = ref(t)
      assert(out(id).getLong(1) === fp.size.toLong, s"doc $id n_fp")
      if (fp.nonEmpty) {
        assert(out(id).getLong(2) === fp.min, s"doc $id min_fp")
        assert(out(id).getLong(3) === fp.max, s"doc $id max_fp")
      } else assert(out(id).isNullAt(2) && out(id).isNullAt(3))
    }
  }

  test("tfidf ranks rare repeated terms first; ties break by term") {
    import spark.implicits._
    val texts = Seq(
      (0L, "apple apple banana"),
      (1L, "banana cherry"),
      (2L, "cherry cherry cherry"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_tfidf").toString
    texts.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.tfidfTopTerms(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getLong(3))).toMap
    def micro(tf: Long, df: Long): Long =
      math.floor(tf * math.log(4.0 / (df + 1)) * 1e6).toLong
    // doc 0: apple (tf=2, df=1) beats banana (tf=1, df=2)
    assert(out((0L, 1L)) === ("apple", micro(2, 1)))
    assert(out((0L, 2L)) === ("banana", micro(1, 2)))
    // doc 1: banana and cherry tie on score -> term asc
    assert(out((1L, 1L)) === ("banana", micro(1, 2)))
    assert(out((1L, 2L)) === ("cherry", micro(1, 2)))
    // doc 2: cherry tf=3
    assert(out((2L, 1L)) === ("cherry", micro(3, 2)))
  }

  test("tfidf tokenizes once and fingerprint plans window-min, not nested HOFs") {
    // regression guards for two measured perf bugs: df must derive
    // from the tf aggregate (a second explode = second corpus
    // tokenize), and winnowing must be the explode+window form (the
    // nested-HOF form is O(n²) per doc in interpreted eval).
    val tfidfPlan = TextAnalysis.tfidfTopTerms(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert("Generate explode".r.findAllIn(tfidfPlan).size === 1, "one tokenize pass")
    val fpPlan = TextAnalysis.fingerprint(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(fpPlan.contains("Window"), fpPlan.take(300))
    assert(!fpPlan.contains("slice("), "no per-position array slicing")
  }

  test("repetition metrics match a hand count and stay map-only") {
    val df = TextAnalysis.repetition(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // invariants: top word count bounds any consecutive run; ratios
    // live in [0, 1e6]
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(3), s"top>=run in $r")
      assert(r.getLong(4) >= 0 && r.getLong(4) <= 1000000)
      assert(r.getLong(5) >= 0 && r.getLong(5) <= 1000000)
      assert(r.getLong(6) >= 0 && r.getLong(6) <= 1000000)
    }
    // hand-recount one document in plain Scala
    val docId = rows.head.getLong(0)
    val text = new graft.sources.GraftCatalog(spark, sfDir).table("documents")
      .where(s"doc_id = $docId").collect().head.getAs[String]("text")
    val words = text.trim.toLowerCase.split("\\s+").toSeq
    val top = words.groupBy(identity).values.map(_.size).max.toLong
    val g2 = words.sliding(2).map(_.mkString(" ")).toSeq
    assert(rows.head.getLong(1) === words.size.toLong)
    assert(rows.head.getLong(2) === top)
    assert(rows.head.getLong(5) ===
      math.floor((g2.size - g2.distinct.size).toDouble * 1000000.0 / math.max(g2.size, 1)).toLong)
    // map-only: the only exchange is the output ordering's range
    // partition — no aggregate (hash) shuffle for per-doc word counts
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"), plan.take(600))
    assert(!plan.contains("HashAggregate"), plan.take(600))
  }

  test("token operators run on sf0.001 and agree on whitespace counts") {
    val q = TextAnalysis.quality(spark, sfDir).collect()
    val t = TextAnalysis.tokens(spark, sfDir).collect()
    assert(q.length === t.length)
    val qTokens = q.map(r => r.getLong(0) -> r.getLong(2)).toMap
    t.foreach(r => assert(r.getLong(1) === qTokens(r.getLong(0))))
  }

  test("dsir weights: target-looking raw docs rank first; per-word weights match driver Math.log") {
    val dir = "/root/testdata/sf0.01"
    val out = graft.operators.TextAnalysis.dsirWeights(spark, dir).cache()
    assert(out.count() === 500)
    // exactly k raw docs selected, all non-target
    val sel = out.where(col("selected") === 1)
    assert(sel.count() === graft.operators.TextAnalysis.DsirSelectK)
    assert(sel.where(col("is_target") === 1).count() === 0)
    // selection = the top-k by (dsir_micro desc, doc_id) among raw docs
    val raw = out.where(col("is_target") === 0)
      .orderBy(col("dsir_micro").desc, col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0))
    val selIds = sel.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(raw.take(graft.operators.TextAnalysis.DsirSelectK).toSet === selIds)
    out.unpersist()

    // ULP diagnosability (E8 convention): engine-side per-word
    // floor(ln(ratio)*1e6) equals driver Math.log on every distinct
    // (cnt, total) the weight table uses
    val documents = new graft.sources.GraftCatalog(spark, dir).table("documents")
    val words = expr("filter(split(trim(lower(text)), '\\\\s+'), w -> length(w) > 0)")
    val toks = documents.select(col("doc_id"),
      col("source").isin("src0", "src1").cast("long").as("is_target"),
      explode(words).as("word"))
    val wc = toks.groupBy("word").agg(
      sum(when(col("is_target") === 1, 1L).otherwise(0L)).as("cnt_t"),
      sum(when(col("is_target") === 0, 1L).otherwise(0L)).as("cnt_r"))
    val Array(totT, totR, v) = wc
      .agg(sum("cnt_t"), sum("cnt_r"), count(lit(1))).collect()(0)
      .toSeq.map(_.asInstanceOf[Long].toDouble).toArray
    Seq(("cnt_t", totT), ("cnt_r", totR)).foreach { case (c, tot) =>
      wc.select(col(c).as("cnt"),
        floor(log((col(c) + 1).cast("double") / lit(tot + v)) * 1e6)
          .cast("long").as("lp")).distinct().collect().foreach { r =>
        val expect = math.floor(math.log((r.getLong(0) + 1).toDouble / (tot + v)) * 1e6).toLong
        assert(r.getLong(1) === expect, s"$c=${r.getLong(0)} lp boundary drift")
      }
    }
  }

  test("bigram logprob: repeated transitions score high, singleton-transition docs tie") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_bg").toString
    val repet = Seq.fill(10)("spark rules").mkString(" ")   // one bigram, 19×
    val varied = (1 to 20).map(i => s"word$i").mkString(" ") // 19 distinct bigrams
    val gibber = (1 to 20).map(i => s"zz$i qq$i").mkString(" ")
    (Seq((1L, repet, "a"), (2L, varied, "a"), (3L, gibber, "a")) ++
      (10L until 20L).map(i => (i, repet, "a")))
      .toDF("doc_id", "text", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.bigramLogprob(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    // the add-one bigram model scores corpus-frequent TRANSITIONS: the
    // repeated bigram ranks far above singleton transitions, and the
    // two all-singleton docs tie exactly (each bigram seen once, each
    // prefix once — the model is symmetric in them)
    assert(out(1L) > out(2L), s"repeated transitions outscore singletons: $out")
    assert(out(2L) === out(3L), s"all-singleton docs tie by symmetry: $out")
    // corpus run + ULP diagnosability on every distinct (cnt_b, cnt_p)
    val corpus = TextAnalysis.bigramLogprob(spark, sfDir)
    assert(corpus.count() === 500)
    val documents = new graft.sources.GraftCatalog(spark, sfDir).table("documents")
    val wordsE = expr("filter(split(trim(lower(text)), '\\\\s+'), w -> length(w) > 0)")
    val v = documents.select(explode(wordsE).as("w")).distinct().count()
    val nw = size(col("ws"))
    val bgs = documents.withColumn("ws", wordsE)
      .select(explode(zip_with(
        slice(col("ws"), lit(1), greatest(nw - 1, lit(0))),
        slice(col("ws"), lit(2), greatest(nw - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b))).as("bg"))
    val model = bgs.groupBy("bg").agg(count(lit(1)).as("cnt_b"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    val prefix = model.groupBy("w1").agg(sum("cnt_b").as("cnt_p"))
    model.join(prefix, Seq("w1"))
      .select(col("cnt_b"), col("cnt_p"),
        floor(log((col("cnt_b") + 1).cast("double") / (col("cnt_p") + lit(v)).cast("double"))
          * 1e6).cast("long").as("lp"))
      .distinct().collect().foreach { r =>
        val expect = math.floor(
          math.log((r.getLong(0) + 1).toDouble / (r.getLong(1) + v).toDouble) * 1e6).toLong
        assert(r.getLong(2) === expect,
          s"bigram lp boundary drift at cnt_b=${r.getLong(0)} cnt_p=${r.getLong(1)}")
      }
  }

  test("NB classifier tokenizes the corpus once (labeled frame is cached)") {
    // the plan PRINT nests each InMemoryRelation's cached plan, so
    // explode appears once per cache-scan site — the real assertion is
    // that every explode READS the cached labeled frame (its child is
    // an InMemoryTableScan), i.e. no site re-tokenizes from the file
    val plan = TextAnalysis.qualityClassifier(spark, sfDir)
      .queryExecution.executedPlan.toString
    val lines = plan.split("\n")
    val gens = lines.indices.filter(lines(_).contains("Generate explode"))
    assert(gens.nonEmpty, "classifier plan must tokenize somewhere")
    gens.foreach { i =>
      assert(lines.slice(i + 1, i + 5).exists(_.contains("InMemoryTableScan")),
        s"explode at plan line $i must read the cached labeled frame, " +
          "not a fresh tokenize:\n" + lines.slice(i, i + 5).mkString("\n"))
    }
  }

  test("NB quality classifier learns a planted signal and holds accuracy on the corpus") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_nb").toString
    // every doc follows one of two patterns tied to its weak label:
    // high-stopword docs carry 'quality', low-stopword docs carry
    // 'spam' — NB must recover the signal on the held-out half
    val rows = (0L until 40L).map { id =>
      val text =
        if (id % 2 == 0) "the a of and in to is quality quality signal"
        else "junk junk junk junk junk junk junk junk spam noise"
      (id, text, s"src${id % 3}")
    }
    rows.toDF("doc_id", "text", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.qualityClassifier(spark, tmp).collect()
    val isTrain = (id: Long) => (id * 1048573L + 11L) % 1000000L < 500000L
    assert(out.forall(r => !isTrain(r.getLong(0))), "only held-out docs emitted")
    assert(out.map(_.getLong(1)).toSet === Set(0L, 1L), "both classes in test half")
    out.foreach { r =>
      assert(r.getLong(4) === r.getLong(1),
        s"doc ${r.getLong(0)}: planted signal must classify correctly: $r")
      assert((r.getLong(3) > 0L) === (r.getLong(1) === 1L), "log-odds sign = class")
    }
    // real corpus: held-out accuracy comfortably above chance, and the
    // prior term matches driver Math.log (ULP diagnosability)
    val corpus = TextAnalysis.qualityClassifier(spark, sfDir).collect()
    val acc = corpus.count(r => r.getLong(1) == r.getLong(4)).toDouble / corpus.length
    assert(acc > 0.7, s"held-out accuracy $acc should beat 0.7")
    val docsTbl = new graft.sources.GraftCatalog(spark, sfDir).table("documents")
    val wordsE = expr("filter(split(trim(lower(text)), '\\\\s+'), w -> length(w) > 0)")
    val stopSet = Seq("the", "a", "of", "and", "in", "to", "is")
    val lab = docsTbl.withColumn("ws", wordsE)
      .select(col("doc_id"),
        when(size(col("ws")) > 0 &&
          size(filter(col("ws"), t => t.isin(stopSet.map(_.asInstanceOf[Any]): _*)))
            .cast("long") * 1000000L >= size(col("ws")).cast("long") * 60000L, 1L)
          .otherwise(0L).as("label"))
      .where(pmod(col("doc_id") * 1048573L + 11L, lit(1000000L)) < 500000L)
    val Array(n1, n0) = lab.agg(sum("label"), sum(lit(1L) - col("label")))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    val expectPrior =
      math.floor(math.log(n1.toDouble / (n1 + n0)) * 1e6).toLong -
      math.floor(math.log(n0.toDouble / (n1 + n0)) * 1e6).toLong
    val enginePrior = spark.range(1).select(
      (floor(log(lit(n1.toDouble) / lit((n1 + n0).toDouble)) * 1e6)
        - floor(log(lit(n0.toDouble) / lit((n1 + n0).toDouble)) * 1e6))
        .cast("long")).collect()(0).getLong(0)
    assert(enginePrior === expectPrior, "prior micro boundary drift")
  }

  test("E17: vocab growth is monotone, windowless, and ends at the corpus totals") {
    val df = graft.operators.TextAnalysis.vocabGrowth(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "cumulatives must be join-based: " + plan.take(800))
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // both curves strictly ordered by bucket and monotone non-decreasing
    assert(rows.sliding(2).forall { case Array((b1, t1, v1), (b2, t2, v2)) =>
      b1 < b2 && t1 <= t2 && v1 <= v2
    case _ => true })
    // the last point IS the corpus: total tokens and total distinct words
    val words = org.apache.spark.sql.functions.expr(
      "filter(split(trim(lower(text)), '\\\\s+'), w -> length(w) > 0)")
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(org.apache.spark.sql.functions.explode(words).as("w"))
    assert(rows.last._2 === toks.count())
    assert(rows.last._3 === toks.distinct().count())
    // vocabulary grows strictly slower than tokens (Heaps' law sanity)
    assert(rows.last._3 < rows.last._2)
  }

  test("E17: vocab growth tokenizes once — both curves read the cached (word, bucket) grain") {
    val nodes = allPlanNodes(graft.operators.TextAnalysis.vocabGrowth(spark, sfDir)
      .queryExecution.executedPlan)
    val scans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scans.isEmpty,
      "no direct file scan in the final plan: token totals AND first-seen mins " +
        "must both derive from the cached (word, bucket, n) pre-aggregate")
    val gens = nodes.collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g }
    assert(gens.isEmpty,
      "the tokenize explode must live inside the cached relation, " +
        "never re-run per branch (the E14 single-tokenize rule)")
    val ims = nodes.collect {
      case i: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => i }
    assert(ims.nonEmpty, "expected InMemoryTableScan of the cached word-bucket grain")
  }

  test("E18: zipf slope — ln floors replay on the driver, slope is Zipf-negative and exact from the emitted sums") {
    val r = graft.operators.TextAnalysis.zipfSlope(spark, sfDir).head()
    val n = r.getLong(0); val sx = r.getLong(1); val sy = r.getLong(2)
    val sxy = r.getLong(3); val sxx = r.getLong(4); val negSlope = r.getLong(5)
    // the synthetic corpus has a SMALL closed vocabulary (31 words at
    // these SFs) — the top-k clips at the vocab, n = min(k, vocab)
    assert(n > 1L && n <= 100L, s"n_words=$n")
    // the x lane replays exactly: Σ floor(ln(rank)·1e6), rank 1..n —
    // the E8 floor-after-ln convention, diagnosable per rank
    val expSx = (1L to n).map(rk => math.floor(math.log(rk.toDouble) * 1e6).toLong).sum
    assert(sx === expSx, "ln(rank) floors must match driver Math.log")
    // the emitted slope IS the integer division of the emitted sums
    val num = (BigInt(sx) * sy - BigInt(n) * sxy) * 1000000
    val den = BigInt(n) * sxx - BigInt(sx) * sx
    assert(num >= 0, "cnt is non-increasing in rank, so the negated numerator is >= 0")
    assert(BigInt(negSlope) === num / den)
    // the diagnostic READ: a near-uniform synthetic vocabulary is FLAT
    // (|slope| ≪ 1 — exactly what the rule calls boilerplate/noise);
    // natural text would sit near 1e6. Assert the flat verdict here.
    assert(negSlope > 0L && negSlope < 1000000L,
      s"synthetic corpus must read flat-to-moderate: $negSlope")
  }

  test("E20 perplexity terciles: cutoffs equal the exact k-th smallest scores; ties share a bucket; thirds partition the corpus") {
    import org.apache.spark.sql.functions._
    val got = graft.operators.TextAnalysis.perplexityBuckets(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    // empty docs are excluded (CCNet drops them)
    assert(got.forall(_._2 > 0L))
    // brute-force replay on the driver: sort the scores, take the
    // value at rank ceil(n/3) / ceil(2n/3), bucket by value compare
    val scores = got.map(_._3).sorted
    val n = scores.length.toLong
    val c1 = scores(((n + 2) / 3).toInt - 1)
    val c2 = scores(((2 * n + 2) / 3).toInt - 1)
    got.foreach { case (doc, _, v, b) =>
      val exp = if (v >= c2) 0L else if (v >= c1) 1L else 2L
      assert(b === exp, s"doc $doc score $v bucket $b != $exp (cuts $c1/$c2)")
    }
    // buckets are value-deterministic: equal scores share a bucket
    got.groupBy(_._3).foreach { case (_, rows) =>
      assert(rows.map(_._4).distinct.length === 1)
    }
    // the partition is near-thirds (exact up to tie mass)
    val byB = got.groupBy(_._4).view.mapValues(_.length.toLong).toMap
    assert(byB.keySet.subsetOf(Set(0L, 1L, 2L)))
    assert(byB.getOrElse(2L, 0L) >= 1L && byB.getOrElse(0L, 0L) >= 1L)
    // tail holds at least ceil(n/3) minus nothing (ties only grow it)
    assert(byB.getOrElse(2L, 0L) + byB.getOrElse(1L, 0L) >= (n + 2) / 3)
  }

  test("E21 persisted model: scoring the training corpus from the artifact reproduces the in-corpus terciles exactly") {
    val inCorpus = graft.operators.TextAnalysis.perplexityBuckets(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val served = graft.operators.TextAnalysis.perplexityModelServe(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(served === inCorpus,
      "model-served scoring must equal the scan-time computation")
  }

  test("E23 persisted classifier: artifact-served held-out scoring equals E14 exactly; out-of-vocab docs score the bare prior") {
    import graft.operators.TextAnalysis
    val inQuery = TextAnalysis.qualityClassifier(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val served = TextAnalysis.qualityModelServe(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(served === inQuery,
      "artifact-served scoring must equal the in-query computation")
    // the artifact generalizes: a doc with no train-vocabulary words
    // contributes nothing beyond the class prior (E14's drop rule)
    val model = java.nio.file.Files
      .createTempDirectory("graft_quality_model_spec").toString
    TextAnalysis.qualityModelTrain(spark, sfDir, model)
    import spark.implicits._
    val oov = Seq((1L, "zzqx9 zzqx9 vvkk77")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityModelScore(spark, model, oov).head()
    val prior = spark.read.parquet(s"$model/meta").head()
      .getAs[Long]("prior_delta")
    assert(r.getAs[Long]("n_scored") === 0L)
    assert(r.getAs[Long]("log_odds_micro") === prior)
    assert(r.getAs[Long]("predicted") === (if (prior > 0L) 1L else 0L))
  }
}
