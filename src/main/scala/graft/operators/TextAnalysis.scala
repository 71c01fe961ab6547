package graft.operators

import graft.GraftSession.GrainOps
import graft.functions.TextFns
import graft.sources.GraftCatalog
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.E text analysis over the `documents` table. All metrics are
  * single-pass, map-only expressions (no shuffle except the output
  * ordering), so throughput scales linearly with input splits.
  */
object TextAnalysis {

  private def docs(s: SparkSession, dir: String): DataFrame =
    new GraftCatalog(s, dir).table("documents")

  /** E1: language ID via per-language stopword scoring (rows-only:
    * the heuristic itself has no SQL oracle; accuracy is spec-tested).
    */
  def langId(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("pick", TextFns.langIdScores(TextFns.tokensLower(col("text"))))
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        col("pick.lang").as("pred_lang"), col("pick.score").as("stopword_hits"))
      .orderBy("doc_id")

  /** E2: quality scoring — exact integer counts + deterministic ratios. */
  def quality(s: SparkSession, dir: String): DataFrame = {
    val toks = TextFns.tokens(col("text"))
    val toksLower = TextFns.tokensLower(col("text"))
    val nTokens = size(toks).cast("long")
    val nDistinct = size(array_distinct(toksLower)).cast("long")
    val nPunct = size(regexp_extract_all(col("text"), lit("[.,!?;:]"), lit(0))).cast("long")
    val nDigits = size(regexp_extract_all(col("text"), lit("[0-9]"), lit(0))).cast("long")
    val stop = Seq("the", "a", "of", "and", "in", "to", "is")
    val nStop = size(filter(toksLower, t => t.isin(stop.map(_.asInstanceOf[Any]): _*))).cast("long")
    docs(s, dir).select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars_m"),
      nTokens.as("n_tokens"),
      nDistinct.as("n_distinct_tokens"),
      nPunct.as("n_punct"),
      nDigits.as("n_digits"),
      nStop.as("n_stopwords"),
      round(nPunct.cast("double") / greatest(length(col("text")).cast("long"), lit(1L)), 6).as("punct_ratio"),
      round(nDistinct.cast("double") / greatest(nTokens, lit(1L)), 6).as("distinct_ratio"),
      round(nStop.cast("double") / greatest(nTokens, lit(1L)), 6).as("stopword_ratio"))
      .orderBy("doc_id")
  }

  /** E3: token counting — whitespace, BPE-ish regex, chars/4 estimate. */
  def tokens(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      size(TextFns.tokens(col("text"))).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
        .cast("long").as("bpe_tokens"),
      ceil(length(col("text")) / lit(4.0)).cast("long").as("approx_tokens"))
      .orderBy("doc_id")

  /** E6: TF-IDF top terms per document — the classic two-shuffle
    * MapReduce job, Spark-shaped: term frequencies via
    * groupBy(doc, term) (map-side partial agg), document frequencies
    * via distinct + groupBy(term), corpus size as a broadcast
    * single-row aggregate (never a driver-side count at plan time).
    * Smoothed idf = ln((N+1)/(df+1)); the score is emitted as
    * floor(tf·idf·1e6) so the double→int truncation is identical
    * across engines (SURVEY.md §6). Top-3 terms per doc by
    * (score desc, term asc) through one per-doc window.
    */
  def tfidfTopTerms(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs(s, dir)
      .select(col("doc_id"), explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // df as a window count over the tf table (each tf row is one
    // distinct (doc, term)): the corpus is tokenized and aggregated
    // ONCE, and df costs one shuffle on term — referencing a second
    // tf-derived aggregate instead would column-prune into a
    // different subtree and re-tokenize (no exchange reuse; measured).
    val withDf = tf.withColumn("df",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("term")))
    val nDocs = docs(s, dir).agg(count(lit(1)).as("n_docs"))
    val scored = withDf
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf_micro",
        floor(col("tf") * log((col("n_docs") + 1).cast("double") / (col("df") + 1)) * 1e6)
          .cast("long"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf_micro").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
        col("term"), col("tfidf_micro"))
      .orderBy("doc_id", "rank")
  }

  /** E5: PII redaction — emails/phones injected deterministically
    * (the corpus has none), then counted and replaced; single-pass,
    * map-only.
    */
  def redact(s: SparkSession, dir: String): DataFrame = {
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phoneRe = "\\d{3}-\\d{3}-\\d{4}"
    val withPii = docs(s, dir).withColumn("text2",
      when(col("doc_id") % 5 === 0,
        concat(col("text"), lit(" contact: user"), col("doc_id").cast("string"), lit("@example.com")))
        .when(col("doc_id") % 7 === 0, concat(col("text"), lit(" call 555-123-4567")))
        .otherwise(col("text")))
    withPii.select(
      col("doc_id"),
      size(regexp_extract_all(col("text2"), lit(emailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(col("text2"), lit(phoneRe), lit(0))).cast("long").as("n_phones"),
      length(regexp_replace(regexp_replace(col("text2"), emailRe, "[EMAIL]"),
        phoneRe, "[PHONE]")).cast("long").as("redacted_len"))
      .orderBy("doc_id")
  }

  /** E7: Gopher-style repetition metrics (Rae et al. 2021, §A1.1:
    * repetitious documents are low-quality training data). Per doc:
    * top-word frequency fraction, duplicate 2-gram / 3-gram fraction,
    * and the longest consecutive same-word run. All four are computed
    * map-only from the token array — the per-doc word counting that
    * would naively be a groupBy(doc, word) shuffle is a fold over the
    * SORTED array (top count = longest run in sorted order), so the
    * operator stays embarrassingly parallel at 100 TB. Ratios are
    * emitted as floor-micro integers (SURVEY.md §6: no round() on
    * arbitrary doubles).
    */
  def repetition(s: SparkSession, dir: String): DataFrame = {
    // longest run of equal adjacent elements in `arr` — O(n) fold;
    // on array_sort(words) this equals the top word's count
    def maxRun(arr: String): String =
      s"""aggregate($arr,
            named_struct('prev', '', 'run', cast(0 as bigint), 'mx', cast(0 as bigint)),
            (acc, x) -> named_struct(
              'prev', x,
              'run', if(x = acc.prev, acc.run + 1, cast(1 as bigint)),
              'mx', greatest(acc.mx, if(x = acc.prev, acc.run + 1, cast(1 as bigint)))),
            acc -> acc.mx)"""
    val words = split(trim(lower(col("text"))), "\\s+")
    val n = size(col("words"))
    val pair = (a: Column, b: Column) => concat(a, lit(" "), b)
    val g2 = zip_with(
      slice(col("words"), lit(1), greatest(n - 1, lit(0))),
      slice(col("words"), lit(2), greatest(n - 1, lit(0))), pair)
    val g3 = zip_with(
      slice(col("words"), lit(1), greatest(n - 2, lit(0))),
      zip_with(
        slice(col("words"), lit(2), greatest(n - 2, lit(0))),
        slice(col("words"), lit(3), greatest(n - 2, lit(0))), pair),
      pair)
    def dupMicro(g: Column): Column =
      floor((size(g) - size(array_distinct(g))).cast("double") * 1000000.0 /
            greatest(size(g), lit(1))).cast("long")
    docs(s, dir)
      .withColumn("words", words)
      .select(
        col("doc_id"),
        n.cast("long").as("n_words"),
        expr(maxRun("array_sort(words)")).as("top_word_cnt"),
        expr(maxRun("words")).as("max_run_len"),
        floor(expr(maxRun("array_sort(words)")).cast("double") * 1000000.0 / n)
          .cast("long").as("top_word_micro"),
        dupMicro(g2).as("dup_2gram_micro"),
        dupMicro(g3).as("dup_3gram_micro"))
      .orderBy("doc_id")
  }

  /** E8: unigram language-model scoring — the corpus-statistics
    * quality filter of the public curation literature (CCNet's
    * KenLM-perplexity gate, reduced to the unigram model the corpus
    * itself trains): every document scores its average per-word
    * ln P(word), where P = corpus frequency. Gibberish and
    * boilerplate-noise docs sit far below the mean. Each word's
    * log-prob is floored to MICRO-integers BEFORE summation (floating
    * sums are accumulation-order-dependent; long sums are exact), so
    * the result is partition-invariant and oracle-exact. Scale shape:
    * one tokenize pass, one (doc, word) pre-aggregate (map-side
    * partial), one word-count shuffle over DISTINCT (doc, word) pairs,
    * one word join sized by distinct pairs — NOT token instances, so
    * the join input shrinks by the per-doc repetition factor at corpus
    * scale (AQE handles the residual Zipf skew) — no driver state,
    * vocabulary never collected.
    *
    * Cross-engine exactness rests on one assumption, stated here
    * because it is the repo's only floor-after-transcendental: JVM
    * Math.log and DuckDB's libm ln agree to the last bit on these
    * inputs (ratios of exact small integers). A 1-ULP divergence at a
    * micro-boundary would flip one floor; the per-word lp values are
    * spec-asserted against driver-side Math.log so any future mismatch
    * is diagnosable per word instead of a silent hash failure.
    */
  /** E17: Heaps-law vocabulary GROWTH curve — cumulative distinct
    * vocabulary vs cumulative tokens over the corpus in ingestion
    * order, the diagnostic that says whether a crawl is still
    * surfacing new language or re-crawling itself (vocab ∝ tokens^β
    * with β≈0.5 for natural text; a flattening curve means duplicate
    * inflow, a linear one means noise/IDs). Shapes: ONE tokenize
    * pass; each word's FIRST bucket via min-aggregate (map-combinable
    * — never a sort over occurrences); the corpus collapses to
    * `nBuckets` grain BEFORE any cumulative step, and the cumulative
    * sums run as a tiny triangular self-join over that bucket grain
    * (≤ n² rows of bucket-level aggregates, broadcast side ≤ n rows)
    * — NO window operator at all, so there is no SinglePartition
    * funnel to excuse (the B58→B58b rule applied preemptively).
    * Exact integers end to end.
    */
  def vocabGrowth(s: SparkSession, dir: String, nBuckets: Int = 20): DataFrame = {
    val words = expr("filter(split(trim(lower(text)), '\\\\s+'), w -> length(w) > 0)")
    val bounds = docs(s, dir).agg(max("doc_id").as("mx"))
    val bucketed = docs(s, dir)
      .select(col("doc_id"), explode(words).as("word"))
      .crossJoin(broadcast(bounds))
      .withColumn("bucket",
        least(lit(nBuckets - 1L),
          expr(s"doc_id div (((mx + 1) + ${nBuckets - 1}) div $nBuckets)"))
          .cast("long"))
    // ONE tokenize pass, kept honest: collapse to (word, bucket, n)
    // grain first and cache that — both the token totals and the
    // first-seen mins derive from it, so the explode never runs twice
    // (the E14 lesson; vocab×buckets grain, spills to disk if large)
    val wb = bucketed.groupBy("word", "bucket").agg(count(lit(1)).as("n")).grainCache()
    val tok = wb.groupBy("bucket").agg(sum("n").as("n_tokens"))
    val firstSeen = wb.groupBy("word").agg(min("bucket").as("fb"))
    val nw = firstSeen.groupBy("fb").agg(count(lit(1)).as("n_new"))
    val cumTok = tok.select(col("bucket"))
      .join(broadcast(tok.select(col("bucket").as("b2"), col("n_tokens"))),
        col("b2") <= col("bucket"))
      .groupBy("bucket").agg(sum("n_tokens").as("cum_tokens"))
    val cumVocab = tok.select(col("bucket"))
      .join(broadcast(nw.select(col("fb"), col("n_new"))), col("fb") <= col("bucket"))
      .groupBy("bucket").agg(sum("n_new").as("cum_vocab"))
    cumTok.join(cumVocab, Seq("bucket"))
      .orderBy("bucket")
  }

  /** E20: CCNet-style perplexity PARTITION — the corpus cut into
    * head / middle / tail thirds by unigram-LM quality (CCNet's
    * actual curation stage: Wenzek et al. 2020 bucket Common Crawl by
    * KenLM perplexity terciles and train on the head). Quality score
    * = E8's per-doc mean log-prob (`avg_lp_micro`, exact integers;
    * empty docs excluded — CCNet drops them); the two tercile cutoffs
    * are the k-th smallest values at k=⌈n/3⌉ and ⌈2n/3⌉, found
    * WITHOUT a global sort: a coarse value histogram (1000-micro
    * buckets — bounded by the micro-ln range, ~10⁴ rows regardless of
    * corpus size) cumulated on the driver, then an exact refinement
    * over the ≤1000 distinct micro values inside the straddling
    * bucket. Both collects are bounded driver artifacts; the grain is
    * cached so the tokenize runs ONCE across the histogram, the
    * refinements, and the final bucket assignment. Ties share a
    * bucket by value comparison, so the result is deterministic and
    * engine-independent: bucket 0 = head (best third), 1 = middle,
    * 2 = tail. All-integer ⇒ VALUE-EXACT.
    */
  def perplexityBuckets(s: SparkSession, dir: String): DataFrame = {
    // the E8 score for docs WITH words only (CCNet drops empty docs),
    // derived without E8's empty-doc left join or its output sort —
    // the cached grain is the bare per-doc aggregate, so the cache
    // materializes off one tokenize with no extra scan or exchange
    val grain = unigramPerDoc(s, dir)
      .select(col("doc_id"), col("n_words"),
        floor(col("sum_lp_micro").cast("double") / col("n_words"))
          .cast("long").as("avg_lp_micro"))
      .grainCache()
    tercileCutoffs(grain) match {
      case None =>
        grain.select(col("doc_id"), col("n_words"),
          col("avg_lp_micro"), lit(0L).as("ppl_bucket"))
      case Some((c1, c2)) =>
        grain.select(col("doc_id"), col("n_words"), col("avg_lp_micro"),
          when(col("avg_lp_micro") >= c2, lit(0L))
            .when(col("avg_lp_micro") >= c1, lit(1L))
            .otherwise(lit(2L)).as("ppl_bucket"))
          .orderBy("doc_id")
    }
  }

  /** The exact k-th smallest `avg_lp_micro` at k=⌈n/3⌉ and ⌈2n/3⌉
    * over a (cached) per-doc grain, WITHOUT a global sort: one coarse
    * collect serves the corpus count AND both rank locations; one
    * fine collect (both straddling buckets at once) serves both exact
    * cutoffs — two bounded driver actions. None on an empty grain.
    */
  private[operators] def tercileCutoffs(grain: DataFrame): Option[(Long, Long)] = {
    val coarse = grain
      .groupBy(floor(col("avg_lp_micro") / 1000.0).cast("long").as("b"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = coarse.map(_._2).sum
    if (n == 0L) return None
    val before = coarse.scanLeft(0L)(_ + _._2)
    def bucketOf(k: Long): (Long, Long) = {
      val i = before.zip(coarse).indexWhere { case (c0, (_, c)) => c0 + c >= k }
      require(i >= 0, s"[GRAFT] rank $k exceeds corpus size")
      (coarse(i)._1, before(i))
    }
    val k1 = (n + 2L) / 3L; val k2 = (2L * n + 2L) / 3L
    val (bk1, _) = bucketOf(k1); val (bk2, _) = bucketOf(k2)
    val fine = grain
      .where(floor(col("avg_lp_micro") / 1000.0).cast("long").isin(bk1, bk2))
      .groupBy("avg_lp_micro").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    def kth(k: Long): Long = {
      val (bucket, b0) = bucketOf(k)
      val inB = fine.filter { case (v, _) => Math.floorDiv(v, 1000L) == bucket }
      val cumF = inB.scanLeft(b0)(_ + _._2)
      val j = cumF.zip(inB).indexWhere { case (c0, (_, c)) => c0 + c >= k }
      inB(j)._1
    }
    Some((kth(k1), kth(k2)))
  }

  /** E21: the PERSISTED perplexity quality model — what CCNet
    * actually ships between its train and filter stages: the per-word
    * unigram log-probs (E8's exact micro integers) plus the pinned
    * tercile cutoffs (E20's exact k-th smallest scores) written as a
    * reusable artifact, so scoring never needs the training corpus
    * again. `meta` also pins the OOV penalty — ⌊ln(1/total)·1e6⌋,
    * the score of a word the corpus never produced — so out-of-domain
    * streams score strictly into the tail instead of silently
    * vanishing from the sum. Cutoffs pinned at TRAIN time is the
    * G22 baseline rule again: the filter's notion of "head" must not
    * drift with whatever flows through it.
    */
  def perplexityModelTrain(s: SparkSession, dir: String,
      modelPath: String): Unit = {
    val words = expr("filter(split(trim(lower(text)), '\\\\s+'), w -> length(w) > 0)")
    val toks = docs(s, dir).select(col("doc_id"), explode(words).as("word"))
    val perDocWord = toks.groupBy("doc_id", "word").agg(count(lit(1)).as("n"))
      .grainCache()
    val total = perDocWord.agg(sum("n")).head().getLong(0)
    val lp = perDocWord.groupBy("word").agg(sum("n").as("cnt"))
      .select(col("word"),
        floor(log(col("cnt").cast("double") / total.toDouble) * 1000000.0)
          .cast("long").as("lp_micro"))
    lp.write.mode("overwrite").parquet(s"$modelPath/words")
    // the per-doc grain for the cutoffs derives from the SAME cached
    // (doc, word, n) pass the model weights came from — one tokenize
    val grain = perDocWord.join(lp, Seq("word"))
      .groupBy("doc_id")
      .agg(sum("n").as("n_words"), sum(col("lp_micro") * col("n")).as("slp"))
      .select(col("doc_id"), col("n_words"),
        floor(col("slp").cast("double") / col("n_words"))
          .cast("long").as("avg_lp_micro"))
      .grainCache()
    val (c1, c2) = tercileCutoffs(grain).getOrElse((Long.MinValue, Long.MinValue))
    val oov = math.floor(math.log(1.0 / total.toDouble) * 1e6).toLong
    import s.implicits._
    Seq((total, oov, c1, c2))
      .toDF("total_words", "oov_lp_micro", "cut_tail_micro", "cut_head_micro")
      .coalesce(1).write.mode("overwrite").parquet(s"$modelPath/meta")
    grain.unpersist(); perDocWord.unpersist()
  }

  /** Score ARBITRARY (doc_id, text) rows against the persisted model:
    * per-doc mean log-prob under the frozen word table (unseen words
    * at the pinned OOV penalty), bucketed by the pinned cutoffs —
    * identical arithmetic to E20, so scoring the training corpus
    * itself reproduces E20's buckets exactly (the E15 index-served ≡
    * scan-time discipline; same oracle proves it). Docs with no words
    * are ABSENT from the result (CCNet drops them; the streaming gate
    * routes them to the tail explicitly). One tokenize of the scored
    * rows + one join against the model words — batch-sized work, the
    * corpus never re-enters.
    */
  def perplexityModelScore(s: SparkSession, modelPath: String,
      in: DataFrame): DataFrame = {
    val meta = graft.sources.GraftIO.readParquet(s, s"$modelPath/meta").head()
    val oov = meta.getAs[Long]("oov_lp_micro")
    val c1 = meta.getAs[Long]("cut_tail_micro")
    val c2 = meta.getAs[Long]("cut_head_micro")
    val words = expr("filter(split(trim(lower(text)), '\\\\s+'), w -> length(w) > 0)")
    val toks = in.select(col("doc_id"), explode(words).as("word"))
    toks.groupBy("doc_id", "word").agg(count(lit(1)).as("n"))
      .join(graft.sources.GraftIO.readParquet(s, s"$modelPath/words"), Seq("word"), "left")
      .select(col("doc_id"), col("n"),
        coalesce(col("lp_micro"), lit(oov)).as("lp_micro"))
      .groupBy("doc_id")
      .agg(sum("n").as("n_words"), sum(col("lp_micro") * col("n")).as("slp"))
      .select(col("doc_id"), col("n_words"),
        floor(col("slp").cast("double") / col("n_words"))
          .cast("long").as("avg_lp_micro"))
      .withColumn("ppl_bucket",
        when(col("avg_lp_micro") >= c2, lit(0L))
          .when(col("avg_lp_micro") >= c1, lit(1L))
          .otherwise(lit(2L)))
  }

  /** E21 (query form): train the model, then score the TRAINING
    * corpus from the persisted artifact alone — must equal E20's
    * in-corpus buckets value-for-value (same oracle).
    */
  def perplexityModelServe(s: SparkSession, dir: String): DataFrame = {
    val modelPath = java.nio.file.Files
      .createTempDirectory("graft_ppl_model").toString
    perplexityModelTrain(s, dir, modelPath)
    perplexityModelScore(s, modelPath, docs(s, dir).select("doc_id", "text"))
      .orderBy("doc_id")
  }

  /** E8's per-doc aggregate alone — (doc_id, n_words, sum_lp_micro)
    * for docs with ≥1 word; the shape E20 caches (no empty-doc join,
    * no output sort).
    */
  private def unigramPerDoc(s: SparkSession, dir: String): DataFrame = {
    val words = expr("filter(split(trim(lower(text)), '\\\\s+'), w -> length(w) > 0)")
    val toks = docs(s, dir).select(col("doc_id"), explode(words).as("word"))
    // pre-aggregate BEFORE the word join: per-(doc, word) multiplicity
    val perDocWord = toks.groupBy("doc_id", "word").agg(count(lit(1)).as("n"))
    val counts = perDocWord.groupBy("word").agg(sum("n").as("cnt"))
    val total = perDocWord.agg(sum("n").cast("double").as("total"))
    val scored = perDocWord.join(counts, Seq("word"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("n"),
        floor(log(col("cnt").cast("double") / col("total")) * 1000000.0)
          .cast("long").as("lp"))
    scored.groupBy("doc_id")
      .agg(sum("n").as("n_words"), sum(col("lp") * col("n")).as("sum_lp_micro"))
  }

  def unigramLogprob(s: SparkSession, dir: String): DataFrame = {
    val perDoc = unigramPerDoc(s, dir)
    docs(s, dir).select("doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("sum_lp_micro"), lit(0L)).as("sum_lp_micro"),
        floor(coalesce(col("sum_lp_micro"), lit(0L)).cast("double") /
              greatest(coalesce(col("n_words"), lit(0L)), lit(1L)))
          .cast("long").as("avg_lp_micro"))
      .orderBy("doc_id")
  }

  /** E10: vocabulary coverage curve — what fraction of the corpus'
    * token stream the top-k most frequent words cover, the standard
    * tokenizer/vocab-sizing diagnostic (Zipf head coverage: decides
    * how large a vocab must be before subword fallback is rare; the
    * natural companion to E9's trained BPE). Scale shape: one
    * tokenize + one word-count shuffle, then the global top-50 via
    * TakeOrdered (tree-reduced top-k — never a SinglePartition sort
    * of the vocabulary), and the cumulative sum runs over those 50
    * rows only (constant-size window). Coverage is emitted as exact
    * integer division `cum*1e6 div total` — no floating point
    * anywhere, so the curve is oracle-exact in any engine.
    */
  def vocabCoverage(s: SparkSession, dir: String, k: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = expr("filter(split(trim(lower(text)), '\\\\s+'), w -> length(w) > 0)")
    val toks = docs(s, dir).select(explode(words).as("word"))
    val counts = toks.groupBy("word").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").as("total"))
    val top = counts.orderBy(col("cnt").desc, col("word")).limit(k)
    val w = Window.orderBy(col("cnt").desc, col("word"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("word"))).cast("long"))
      .withColumn("cum_cnt", sum("cnt").over(w))
      .crossJoin(broadcast(total))
      .select(col("rank"), col("word"), col("cnt"),
        col("cum_cnt"),
        expr("(cum_cnt * 1000000L) div total").as("coverage_micro"))
      .orderBy("rank")
  }

  /** E19: ingestion DRIFT profile — the batch twin of the G21
    * streaming monitor: the corpus in ingestion order (doc_id) is cut
    * into fixed-size buckets and each bucket's quality stats (mean
    * token count, distinct-token ratio — both floor-micro integers)
    * are compared against the corpus-wide baseline (the mean of
    * bucket means, exact integer division); a bucket whose mean token
    * count deviates more than 30% from the baseline flags `drifted` —
    * the signal that says WHEN a crawl went bad, not just that it
    * did (a source switch, a parser regression, a flood of boiler-
    * plate all show up as a drifted ingestion window). Scale shape:
    * one tokenize, one map-combinable bucket aggregate, a broadcast
    * single-row baseline — the bucket grain is corpus/bucketDocs
    * rows, never wide. All integer arithmetic ⇒ VALUE-EXACT.
    */
  def ingestDrift(s: SparkSession, dir: String,
      bucketDocs: Long = 50L): DataFrame = {
    val toksLower = TextFns.tokensLower(col("text"))
    val stats = docs(s, dir).select(
      expr(s"doc_id div $bucketDocs").as("bucket"),
      size(toksLower).cast("long").as("nt"),
      size(array_distinct(toksLower)).cast("long").as("nd"))
    // ONE tokenize (the E14/H5 rule — this very query was the first
    // catch of the widened sweep while being written): the bucket
    // grain feeds both the baseline aggregate and the final join
    val perBucket = stats.groupBy("bucket").agg(
      count(lit(1)).as("n_docs"),
      sum("nt").as("tokens"),
      expr("(sum(nt) * 1000000L) div count(1)").as("mean_tokens_micro"),
      expr("(sum(nd) * 1000000L) div greatest(sum(nt), 1L)").as("distinct_ratio_micro"))
      .grainCache()
    val base = perBucket.agg(
      expr("sum(mean_tokens_micro) div count(1)").as("base_mean_micro"))
    perBucket.crossJoin(broadcast(base))
      .select(col("bucket"), col("n_docs"), col("tokens"),
        col("mean_tokens_micro"), col("distinct_ratio_micro"),
        col("base_mean_micro"),
        (abs(col("mean_tokens_micro") - col("base_mean_micro")) * 10L >
          col("base_mean_micro") * 3L).cast("long").as("drifted"))
      .orderBy("bucket")
  }

  /** E18: Zipf rank-frequency SLOPE — the third crawl-health
    * diagnostic next to E10 (head coverage) and E17 (vocab growth):
    * natural text follows freq ∝ rank^s with s ≈ −1 (Zipf's law); a
    * slope far above −1 (flat) means ID/boilerplate noise, far below
    * (steep) means template/duplicate inflow dominating the head.
    * Computed as the exact least-squares slope of ln(cnt) on ln(rank)
    * over the top-k words: per-rank x = ⌊ln(rank)·1e6⌋ and
    * y = ⌊ln(cnt)·1e6⌋ (the E8 floor-after-ln convention, per-rank
    * spec-replayed vs driver Math.log), then
    * slope = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²) on exact BIGINT sums —
    * emitted NEGATED (`neg_slope_micro`) because cnt is non-increasing
    * in rank BY CONSTRUCTION, so the numerator is always ≤ 0 and the
    * negated integer division stays in the engines' agreeing
    * non-negative range (Spark `div` truncates, DuckDB `//` floors —
    * they only agree above zero; the 1e6 rescale runs in
    * DECIMAL(38,0)/HUGEINT, since Σx·Σy·1e6 ≈ 2e23 overflows BIGINT).
    * Scale shape: one tokenize + one word-count shuffle + a
    * tree-reduced top-k (TakeOrdered), the regression over k rows —
    * corpus-size-independent after the count. The sums ride along for
    * per-term diagnosability. VALUE-EXACT.
    */
  def zipfSlope(s: SparkSession, dir: String, k: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = expr("filter(split(trim(lower(text)), '\\\\s+'), w -> length(w) > 0)")
    val counts = docs(s, dir).select(explode(words).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val top = counts.orderBy(col("cnt").desc, col("word")).limit(k)
    val ranked = top
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("word"))).cast("long"))
      .select(
        floor(log(col("rank").cast("double")) * 1000000.0).cast("long").as("x"),
        floor(log(col("cnt").cast("double")) * 1000000.0).cast("long").as("y"))
    ranked
      .agg(
        count(lit(1)).as("n_words"),
        sum("x").as("sum_x"), sum("y").as("sum_y"),
        sum(col("x") * col("y")).as("sum_xy"),
        sum(col("x") * col("x")).as("sum_xx"))
      .select(col("n_words"), col("sum_x"), col("sum_y"),
        col("sum_xy"), col("sum_xx"),
        expr("""CAST((CAST(sum_x AS DECIMAL(38,0)) * sum_y - CAST(n_words AS DECIMAL(38,0)) * sum_xy) * 1000000
                 div (CAST(n_words AS DECIMAL(38,0)) * sum_xx - CAST(sum_x AS DECIMAL(38,0)) * sum_x)
                AS BIGINT)""").as("neg_slope_micro"))
  }

  /** E4: winnowing document fingerprints (k=8 chars, window=4) —
    * rows-only (xxhash64 is engine-specific); stability spec-tested.
    */
  def fingerprint(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = 8; val w = 4
    // Relational winnowing: ONE pass of the native gram-hash
    // expression per document (posexplode of its array), then the
    // w-window min with a window frame, one window per legal start.
    // The array/HOF formulation (transform over slice(grams,…))
    // re-evaluates the whole gram array per window position in
    // interpreted eval — O(n²) per doc (measured: minutes at sf0.1);
    // this shape is O(n) and whole-stage-codegen end to end. Short
    // docs (< k chars) degrade to one gram over the clipped text;
    // docs with fewer than w grams emit the min of what they have
    // (pos 0's frame clips at partition end) — byte-identical to the
    // array formulation's fallbacks.
    val hashed = docs(s, dir)
      .select(col("doc_id"),
        posexplode(TextFns.gramHashes(col("text"), k)).as(Seq("pos", "gram")))
    val byDoc = Window.partitionBy("doc_id")
    val frame = byDoc.orderBy("pos").rowsBetween(Window.currentRow, w - 1)
    hashed
      .withColumn("n_grams", count(lit(1)).over(byDoc))
      .withColumn("wmin", min(col("gram")).over(frame))
      .where(col("pos") <= greatest(col("n_grams") - w, lit(0)))
      .select(col("doc_id"), col("wmin")).distinct()
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_fingerprints"), min("wmin").as("min_fingerprint"))
      .orderBy("doc_id")
  }

  /** E4 (oracle-portable form): winnowing with an exactly-portable
    * k-gram hash — the polynomial Σ code(cᵢ)·257^(k-1-i) over k=5
    * chars is at most ~1.1e12, so it fits a 64-bit integer EXACTLY
    * (no modulus, no overflow, no engine-specific hashing), and the
    * window-min selection (w=4) is pure integer comparison. The
    * fingerprint SET per document is therefore bit-identical in any
    * engine; we emit its size and min/max as the checkable summary.
    * `fingerprint` above is the scale form (native single-pass
    * rolling-hash expression); this form trades one substring per
    * (position, offset) for portability and is oracle-checked.
    */
  def fingerprintExact(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = 4
    // Same relational shape as `fingerprint` — and since r5 the SAME
    // native gram-hash expression (poly mode): one pass per document,
    // posexplode, w-window min, distinct, aggregate. The expression is
    // bit-identical to the Σ ascii(substring)·257^j SQL the oracle
    // mirrors (terms widened to long before the multiply; max
    // codepoint 0x10FFFF keeps the 5-term sum under 2.4e16 — well
    // inside exact long range; spec-asserted against the expr()
    // formulation). Docs too short for any window (len < 5 → empty
    // gram array, or fewer than w hashes) come back via the left join
    // with n_fp = 0 and null min/max — identical to the oracle.
    val hashed = docs(s, dir)
      .select(col("doc_id"),
        posexplode(TextFns.polyGramHashes(col("text"), 5)).as(Seq("p0", "h")))
      .select(col("doc_id"), (col("p0") + 1).as("p"), col("h"))
    val byDoc = Window.partitionBy("doc_id")
    val frame = byDoc.orderBy("p").rowsBetween(Window.currentRow, w - 1)
    val agg = hashed
      .withColumn("n_hs", count(lit(1)).over(byDoc))
      .withColumn("wmin", min(col("h")).over(frame))
      .where(col("n_hs") >= w && col("p") <= col("n_hs") - (w - 1))
      .select(col("doc_id"), col("wmin")).distinct()
      .groupBy("doc_id")
      .agg(count(lit(1)).as("nf"), min("wmin").as("min_fp"), max("wmin").as("max_fp"))
    docs(s, dir).select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("nf"), lit(0L)).as("n_fp"),
        col("min_fp"), col("max_fp"))
      .orderBy("doc_id")
  }

  /** The DSIR target-domain predicate: which sources define the
    * distribution we resample TOWARD. Arbitrary but fixed — a real
    * pipeline points this at its high-quality reference corpus.
    */
  private[graft] val DsirTargetSources = Seq("src0", "src1")

  /** How many raw docs `dsirWeights` selects. */
  private[graft] val DsirSelectK = 100

  /** E11: DSIR-style importance weighting (Xie et al., "Data Selection
    * for Language Models via Importance Resampling", NeurIPS 2023):
    * fit bag-of-words unigram models to a TARGET domain (the
    * high-quality reference, here sources src0/src1) and to the RAW
    * pool, weight every raw document by its log importance ratio
    * Σ_w n_w·(ln p_target(w) − ln p_raw(w)) (add-one smoothing over
    * the joint vocabulary), and keep the top-k raw docs — the
    * deterministic top-k variant of the paper's Gumbel resampling, so
    * the whole selection is oracle-replayable. (The paper hashes
    * features into buckets to bound the model size; word-level
    * features keep the weight table joinable here and the shape is
    * identical — swap the explode key for `pmod(hash(word), B)` to get
    * the hashed variant.)
    *
    * Exactness: per-word log-probs are floored to micro ints BEFORE
    * the per-doc multiply-sum (E8's convention and its documented
    * ln-ULP assumption — per-word values are spec-asserted against
    * driver-side Math.log for diagnosability). Scale shape: one
    * tokenize pass, per-(doc,word) pre-aggregate, ONE word-count
    * shuffle for both models (conditional sums, not two scans), the
    * per-word weight table joins back on the distinct-pair table, and
    * the top-k is TakeOrdered (tree-reduced) — never a global sort.
    */
  /** E16: bigram language-model scoring — E8's unigram gate moved one
    * Markov order toward CCNet's KenLM: every document scores its
    * average ln P(w_i | w_{i-1}) with add-one smoothing over the
    * corpus vocabulary, P(w_i|w_{i-1}) = (cnt(w_{i-1} w_i) + 1) /
    * (cnt_prefix(w_{i-1}) + V). Repetitive boilerplate scores HIGH
    * (its bigrams repeat verbatim), gibberish scores LOW (unseen
    * transitions hit the smoothing floor) — the two-sided signal the
    * perplexity gate actually filters on.
    *
    * Exactness: E8's convention — per-bigram log-probs are floored to
    * micro ints BEFORE the multiply-sum (exact long arithmetic from
    * there), under the same documented ln-ULP assumption. Scale
    * shape: bigram extraction is MAP-ONLY (zip the word array with
    * its own tail — no self-join, no window); the per-(doc, bigram)
    * pre-aggregate bounds the model join by distinct pairs; prefix
    * counts derive from the bigram model table (no second corpus
    * aggregate); the vocabulary size is one word-distinct aggregate
    * broadcast as a single row.
    */
  def bigramLogprob(s: SparkSession, dir: String): DataFrame = {
    val words = expr("filter(split(trim(lower(text)), '\\\\s+'), w -> length(w) > 0)")
    val n = size(col("ws"))
    // (w1, w2) adjacent pairs: words never contain whitespace, so the
    // space-joined form is collision-free and groupable as one key
    val bigrams = zip_with(
      slice(col("ws"), lit(1), greatest(n - 1, lit(0))),
      slice(col("ws"), lit(2), greatest(n - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    // ONE bigram extraction (the E14/H5 rule): the (doc, bigram, n)
    // grain feeds both the model fit and the per-doc scoring join —
    // cached so the zip/explode never re-runs per consumer. (The
    // vocabulary pass below is a DIFFERENT derivation — distinct
    // unigrams, which bigrams can't recover for one-word docs — and
    // is one column-pruned count-distinct, not a second grain.)
    val perDocBg = docs(s, dir)
      .withColumn("ws", words)
      .select(col("doc_id"), explode(bigrams).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("n"))
      .grainCache()
    val model = perDocBg.groupBy("bg").agg(sum("n").as("cnt_b"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    val prefix = model.groupBy("w1").agg(sum("cnt_b").as("cnt_p"))
    val vocab = docs(s, dir).select(explode(words).as("word"))
      .agg(count_distinct(col("word")).as("v"))
    val weights = model.join(prefix, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("bg"),
        floor(log((col("cnt_b") + 1).cast("double") /
                  (col("cnt_p") + col("v")).cast("double")) * 1e6)
          .cast("long").as("lp"))
    val perDoc = perDocBg.join(weights, Seq("bg"))
      .groupBy("doc_id")
      .agg(sum("n").as("n_bigrams"), sum(col("lp") * col("n")).as("sum_lp_micro"))
    docs(s, dir).select("doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("sum_lp_micro"), lit(0L)).as("sum_lp_micro"),
        floor(coalesce(col("sum_lp_micro"), lit(0L)).cast("double") /
              greatest(coalesce(col("n_bigrams"), lit(0L)), lit(1L)))
          .cast("long").as("avg_lp_micro"))
      .orderBy("doc_id")
  }

  /** E14: model-based quality classifier — the learned gate of the
    * public curation recipes (GPT-3's CommonCrawl quality filter,
    * Brown et al. 2020 §A; fastText-style linear bag-of-words), as a
    * multinomial Naive Bayes: TRAIN on one half of the corpus against
    * a deterministic weak label (E2's stopword-ratio rule, integer
    * comparison ns·1e6 ≥ 60000·n), SCORE the held-out half with
    * per-class add-one-smoothed word log-probs plus class priors,
    * predict by the sign of the exact-BIGINT log-odds. Differs from
    * E11 (DSIR) exactly where a classifier differs from importance
    * weighting: supervised labels, priors, argmax prediction, and a
    * held-out evaluation half.
    *
    * Exactness: the train/test split is H2's multiplicative-hash keep
    * rule (pure integer arithmetic, engine-portable); per-word and
    * prior log-probs are micro-floored ratios of exact integers under
    * E8's documented ln-ULP assumption; per-doc sums are exact BIGINT.
    * Test words outside the train vocabulary drop via the inner join
    * (the standard practical choice, and deterministic). Scale shape:
    * ONE tokenize pass carrying (label, is_train) — both map-only
    * expressions — through the distinct-pair pre-aggregate; one
    * conditional word-count shuffle fits both class models; totals
    * and priors are broadcast single-row aggregates; the weight table
    * joins back on the test half's distinct pairs.
    */
  def qualityClassifier(s: SparkSession, dir: String): DataFrame = {
    val words = expr("filter(split(trim(lower(text)), '\\\\s+'), w -> length(w) > 0)")
    val stop = Seq("the", "a", "of", "and", "in", "to", "is")
    val nw = size(col("ws")).cast("long")
    val ns = size(filter(col("ws"), t => t.isin(stop.map(_.asInstanceOf[Any]): _*))).cast("long")
    val labeled = docs(s, dir)
      .withColumn("ws", words)
      .select(col("doc_id"), col("ws"),
        when(nw > 0L && ns * 1000000L >= nw * 60000L, 1L).otherwise(0L).as("label"),
        (pmod(col("doc_id") * 1048573L + 11L, lit(1000000L)) < 500000L).as("is_train"))
      // `labeled` feeds the pair table AND the priors AND the held-out
      // select — cache it so the tokenize pass runs once, not three
      // times (the E11 discipline below)
      .grainCache()
    val pair = labeled
      .select(col("doc_id"), col("label"), col("is_train"), explode(col("ws")).as("word"))
      .groupBy("doc_id", "label", "is_train", "word").agg(count(lit(1)).as("n"))
      .grainCache()
    val wc = pair.where(col("is_train")).groupBy("word").agg(
      sum(when(col("label") === 1L, col("n")).otherwise(0L)).as("cnt1"),
      sum(when(col("label") === 0L, col("n")).otherwise(0L)).as("cnt0"))
    val tot = wc.agg(sum("cnt1").as("tot1"), sum("cnt0").as("tot0"),
      count(lit(1)).as("v"))
    def lpMicro(cnt: Column, total: Column): Column =
      floor(log((cnt + 1).cast("double") / (total + col("v")).cast("double"))
        * 1e6).cast("long")
    val wt = wc.crossJoin(broadcast(tot))
      .select(col("word"),
        (lpMicro(col("cnt1"), col("tot1"))
          - lpMicro(col("cnt0"), col("tot0"))).as("w_micro"))
    val priors = labeled.where(col("is_train")).agg(
      sum(col("label")).as("n1"),
      sum(lit(1L) - col("label")).as("n0"))
      .select(
        (floor(log(col("n1").cast("double") / (col("n1") + col("n0")).cast("double")) * 1e6)
          - floor(log(col("n0").cast("double") / (col("n1") + col("n0")).cast("double")) * 1e6))
          .cast("long").as("prior_delta"))
    val perDoc = pair.where(!col("is_train"))
      .join(wt, Seq("word"))
      .groupBy("doc_id")
      .agg(sum("n").as("n_scored"), sum(col("w_micro") * col("n")).as("delta_words"))
    labeled.where(!col("is_train"))
      .select(col("doc_id"), col("label"))
      .join(perDoc, Seq("doc_id"), "left")
      .crossJoin(broadcast(priors))
      .select(col("doc_id"), col("label"),
        coalesce(col("n_scored"), lit(0L)).as("n_scored"),
        (col("prior_delta") + coalesce(col("delta_words"), lit(0L))).as("log_odds_micro"))
      .withColumn("predicted", when(col("log_odds_micro") > 0L, 1L).otherwise(0L))
      .orderBy("doc_id")
  }

  // ── E23: the quality classifier as a PERSISTED artifact ──

  /** E23: persist E14's trained classifier — the fastText-`.bin` role
    * of the public curation recipes (the GPT-3 quality filter is a
    * trained artifact applied to every later crawl, not a per-corpus
    * recomputation). The artifact carries everything scoring needs and
    * nothing else: the per-word log-odds weights (exact micro
    * integers), the class-prior delta, and the PINNED weak-label rule
    * (stop list + threshold) so evaluation against the labeling is
    * reproducible from the artifact alone — the G22/E21 rule again:
    * every constant the filter's decisions depend on freezes at train
    * time. Train = E14's train-half fit verbatim (ONE tokenize via the
    * cached labeled grain); the weight table is vocabulary-sized,
    * never corpus-sized.
    */
  def qualityModelTrain(s: SparkSession, dir: String,
      modelPath: String): Unit = {
    val words = expr("filter(split(trim(lower(text)), '\\\\s+'), w -> length(w) > 0)")
    val stop = Seq("the", "a", "of", "and", "in", "to", "is")
    val nw = size(col("ws")).cast("long")
    val ns = size(filter(col("ws"), t => t.isin(stop.map(_.asInstanceOf[Any]): _*))).cast("long")
    val labeled = docs(s, dir)
      .withColumn("ws", words)
      .select(col("doc_id"), col("ws"),
        when(nw > 0L && ns * 1000000L >= nw * 60000L, 1L).otherwise(0L).as("label"))
      .where(pmod(col("doc_id") * 1048573L + 11L, lit(1000000L)) < 500000L)
      // feeds the word-count fit AND the priors — cache so the
      // tokenize pass runs once (the E14 discipline)
      .grainCache()
    val wc = labeled
      .select(col("label"), explode(col("ws")).as("word"))
      .groupBy("word").agg(
        sum(when(col("label") === 1L, 1L).otherwise(0L)).as("cnt1"),
        sum(when(col("label") === 0L, 1L).otherwise(0L)).as("cnt0"))
    val tot = wc.agg(sum("cnt1").as("tot1"), sum("cnt0").as("tot0"),
      count(lit(1)).as("v"))
    def lpMicro(cnt: Column, total: Column): Column =
      floor(log((cnt + 1).cast("double") / (total + col("v")).cast("double"))
        * 1e6).cast("long")
    wc.crossJoin(broadcast(tot))
      .select(col("word"),
        (lpMicro(col("cnt1"), col("tot1"))
          - lpMicro(col("cnt0"), col("tot0"))).as("w_micro"))
      .write.mode("overwrite").parquet(s"$modelPath/words")
    val prior = labeled.agg(
      sum(col("label")).as("n1"), sum(lit(1L) - col("label")).as("n0"))
      .select(
        (floor(log(col("n1").cast("double") / (col("n1") + col("n0")).cast("double")) * 1e6)
          - floor(log(col("n0").cast("double") / (col("n1") + col("n0")).cast("double")) * 1e6))
          .cast("long").as("prior_delta"))
      .head().getLong(0)
    import s.implicits._
    Seq((prior, stop.mkString(","), 60000L))
      .toDF("prior_delta", "stop_words", "thr_stop_ratio_micro")
      .coalesce(1).write.mode("overwrite").parquet(s"$modelPath/meta")
    labeled.unpersist()
  }

  /** Score ARBITRARY (doc_id, text) rows against the persisted
    * classifier: per-doc BIGINT log-odds under the frozen weight
    * table (words outside the train vocabulary drop via the inner
    * join — E14's rule), prediction by sign, and the PINNED weak
    * label recomputed from the artifact's own stop list + threshold
    * for evaluation — identical arithmetic to E14, so scoring the
    * held-out half reproduces E14's result exactly (the E15/E21
    * artifact-served ≡ scan-time discipline; same oracle proves it).
    * One tokenize of the scored rows (the cached base grain serves
    * the label, the pair table, and the final frame) + one
    * vocabulary-sized join — the training corpus never re-enters.
    */
  def qualityModelScore(s: SparkSession, modelPath: String,
      in: DataFrame): DataFrame = {
    val meta = graft.sources.GraftIO.readParquet(s, s"$modelPath/meta").head()
    val prior = meta.getAs[Long]("prior_delta")
    val stop = meta.getAs[String]("stop_words").split(",").toSeq
    val thr = meta.getAs[Long]("thr_stop_ratio_micro")
    val words = expr("filter(split(trim(lower(text)), '\\\\s+'), w -> length(w) > 0)")
    val nw = size(col("ws")).cast("long")
    val ns = size(filter(col("ws"), t => t.isin(stop.map(_.asInstanceOf[Any]): _*))).cast("long")
    val base = in
      .withColumn("ws", words)
      .select(col("doc_id"), col("ws"),
        when(nw > 0L && ns * 1000000L >= nw * thr, 1L).otherwise(0L).as("label"))
      .grainCache()
    val perDoc = base
      .select(col("doc_id"), explode(col("ws")).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("n"))
      .join(graft.sources.GraftIO.readParquet(s, s"$modelPath/words"), Seq("word"))
      .groupBy("doc_id")
      .agg(sum("n").as("n_scored"), sum(col("w_micro") * col("n")).as("delta_words"))
    base.select(col("doc_id"), col("label"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("label"),
        coalesce(col("n_scored"), lit(0L)).as("n_scored"),
        (lit(prior) + coalesce(col("delta_words"), lit(0L))).as("log_odds_micro"))
      .withColumn("predicted", when(col("log_odds_micro") > 0L, 1L).otherwise(0L))
  }

  /** E23 (query form): train on the H2-hash train half, persist, then
    * score the HELD-OUT half from the artifact alone — must equal
    * E14's in-query result value-for-value (shared oracle verbatim).
    */
  def qualityModelServe(s: SparkSession, dir: String): DataFrame = {
    val modelPath = java.nio.file.Files
      .createTempDirectory("graft_quality_model").toString
    qualityModelTrain(s, dir, modelPath)
    val held = docs(s, dir).select(col("doc_id"), col("text"))
      .where(pmod(col("doc_id") * 1048573L + 11L, lit(1000000L)) >= 500000L)
    qualityModelScore(s, modelPath, held).orderBy("doc_id")
  }

  def dsirWeights(s: SparkSession, dir: String): DataFrame = {
    val words = expr("filter(split(trim(lower(text)), '\\\\s+'), w -> length(w) > 0)")
    val isTarget = col("source").isin(DsirTargetSources: _*).cast("long")
    val toks = docs(s, dir)
      .select(col("doc_id"), isTarget.as("is_target"), explode(words).as("word"))
    // the distinct-pair table feeds the model fit AND the doc scoring
    // join AND (via wc) the totals — cache it so the tokenize pass
    // runs once, not four times (2.9s → 1.3s median at sf0.1)
    val perDocWord = toks.groupBy("doc_id", "is_target", "word")
      .agg(count(lit(1)).as("n")).grainCache()
    val wc = perDocWord.groupBy("word").agg(
      sum(when(col("is_target") === 1, col("n")).otherwise(0L)).as("cnt_t"),
      sum(when(col("is_target") === 0, col("n")).otherwise(0L)).as("cnt_r"))
      .grainCache()
    val tot = wc.agg(sum("cnt_t").as("tot_t"), sum("cnt_r").as("tot_r"),
      count(lit(1)).as("v"))
    def lpMicro(cnt: Column, total: Column): Column =
      floor(log((cnt + 1).cast("double") / (total + col("v")).cast("double"))
        * 1e6).cast("long")
    val weights = wc.crossJoin(broadcast(tot))
      .select(col("word"),
        (lpMicro(col("cnt_t"), col("tot_t"))
          - lpMicro(col("cnt_r"), col("tot_r"))).as("w_micro"))
    val perDoc = perDocWord.join(weights, Seq("word"))
      .groupBy("doc_id")
      .agg(sum("n").as("n_words"), sum(col("w_micro") * col("n")).as("dsir"))
    val base = docs(s, dir).select(col("doc_id"), isTarget.as("is_target"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("is_target"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("dsir"), lit(0L)).as("dsir_micro"))
    val kept = base.where(col("is_target") === 0)
      .orderBy(col("dsir_micro").desc, col("doc_id"))
      .limit(DsirSelectK).select(col("doc_id").as("kid"))
    base.join(broadcast(kept), col("doc_id") === col("kid"), "left")
      .select(col("doc_id"), col("is_target"), col("n_words"), col("dsir_micro"),
        when(col("kid").isNull, 0L).otherwise(1L).as("selected"))
      .orderBy("doc_id")
  }
}
