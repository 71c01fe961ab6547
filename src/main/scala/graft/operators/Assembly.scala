package graft.operators

import graft.GraftSession.GrainOps
import graft.sources.GraftCatalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.H training-set assembly: the passes that turn a CURATED corpus
  * into model-ready training data — sequence packing (documents
  * concatenated into fixed-length context windows) and mixture
  * sampling (per-source rates hitting a target data mixture). Both
  * are deterministic integer/window arithmetic, so both are
  * oracle-exact cross-engine.
  */
object Assembly {

  private def docs(s: SparkSession, dir: String): DataFrame =
    new GraftCatalog(s, dir).table("documents")

  /** H8 thresholds: a positive is a near-dup (cos ≥ 0.9), a hard
    * negative sits below the 0.8 margin boundary.
    */
  val PosThetaMicro = 900000L
  val NegThetaMicro = 800000L

  /** H8: contrastive pair mining — assemble (anchor, positive, hard
    * negative) triplets for embedding-model training, the data recipe
    * of SimCSE/E5-style contrastive pretraining (Gao et al. 2021;
    * Wang et al. 2022: positives from near-duplicate/aligned pairs,
    * negatives mined HARD — the highest-similarity candidates that
    * are NOT positives — because random negatives are too easy to
    * teach a margin). Positives: E12 hash-embedding cosine ≥ 0.9
    * (C5's near-dup semantics on the train-free vectors); hard
    * negative: the argmax-cosine candidate strictly below 0.8; both
    * argmaxes tie-break to the smallest candidate id, so the triplet
    * set is fully deterministic, and every score is the repo's
    * micro-floored cosine over exact integer vectors.
    *
    * Scale shape: this exact form verifies ALL pairs of the corpus'
    * hash embeddings (|docs|² bounded at the verify SF). The
    * production path swaps the all-pairs candidate generator for the
    * C5 LSH-banded candidates (positives) and a D1-style per-anchor
    * top-k retrieval (negatives) — the selection arithmetic below is
    * shared by both. The per-anchor argmaxes run as two windows over
    * the filtered pair sets; at scale those become per-anchor heaps
    * on the retrieval shortlist (constant per anchor), never a
    * corpus-wide sort.
    */
  def contrastivePairs(s: SparkSession, dir: String): DataFrame = {
    val e = HashEmbed.embeddings(s, dir).where(col("norm2") > 0)
      .withColumn("nrm", sqrt(col("norm2").cast("double")))
      .grainCache() // both sides of the pair join
    val a = e.select(col("doc_id").as("anchor_id"), col("emb").as("ea"), col("nrm").as("na"))
    val b = e.select(col("doc_id").as("cand_id"), col("emb").as("eb"), col("nrm").as("nb"))
    val pairs = a.join(broadcast(b), col("anchor_id") =!= col("cand_id"))
      .select(col("anchor_id"), col("cand_id"),
        floor(SemDedup.dotL(col("ea"), col("eb")).cast("double")
          / (col("na") * col("nb")) * 1e6).cast("long").as("cos_micro"))
    def best(filtered: DataFrame, prefix: String): DataFrame = {
      val w = Window.partitionBy("anchor_id")
        .orderBy(col("cos_micro").desc, col("cand_id"))
      filtered.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("anchor_id"), col("cand_id").as(s"${prefix}_id"),
          col("cos_micro").as(s"${prefix}_cos_micro"))
    }
    val pos = best(pairs.where(col("cos_micro") >= PosThetaMicro), "pos")
    val neg = best(pairs.where(col("cos_micro") < NegThetaMicro), "neg")
    pos.join(neg, Seq("anchor_id"))
      .select(col("anchor_id"), col("pos_id"), col("pos_cos_micro"),
        col("neg_id"), col("neg_cos_micro"),
        (col("pos_cos_micro") - col("neg_cos_micro")).as("margin_micro"))
      .orderBy("anchor_id")
  }

  /** DuckDB oracle for H8: HashEmbed's vector CTE chain + the same
    * pair/argmax arithmetic, single-window form.
    */
  def contrastiveOracleSql: String = s"""${HashEmbed.vecSql},
      e AS (
        SELECT doc_id, emb::DOUBLE[] AS emb,
               sqrt(CAST(norm2 AS DOUBLE)) AS nrm
        FROM vecn WHERE norm2 > 0
      ), pairs AS (
        SELECT a.doc_id AS anchor_id, b.doc_id AS cand_id,
               CAST(floor(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm)
                          * 1000000.0) AS BIGINT) AS cos_micro
        FROM e a JOIN e b ON a.doc_id <> b.doc_id
      ), pos AS (
        SELECT anchor_id, cand_id AS pos_id, cos_micro AS pos_cos_micro
        FROM (SELECT *, row_number() OVER (PARTITION BY anchor_id
                ORDER BY cos_micro DESC, cand_id) AS rn
              FROM pairs WHERE cos_micro >= $PosThetaMicro)
        WHERE rn = 1
      ), neg AS (
        SELECT anchor_id, cand_id AS neg_id, cos_micro AS neg_cos_micro
        FROM (SELECT *, row_number() OVER (PARTITION BY anchor_id
                ORDER BY cos_micro DESC, cand_id) AS rn
              FROM pairs WHERE cos_micro < $NegThetaMicro)
        WHERE rn = 1
      )
      SELECT p.anchor_id, p.pos_id, p.pos_cos_micro, n.neg_id,
             n.neg_cos_micro,
             CAST(p.pos_cos_micro - n.neg_cos_micro AS BIGINT) AS margin_micro
      FROM pos p JOIN neg n USING (anchor_id)
      ORDER BY p.anchor_id"""

  /** Context-window length (tokens) for packing. */
  val SeqLen = 2048L

  /** Docs per packing bucket — the parallelism unit. */
  val PackBucket = 1000L

  /** H1: sequence packing — the standard pre-tokenization pass that
    * concatenates documents into fixed-length training sequences
    * (GPT-style causal-LM batching: docs are packed head-to-tail into
    * `SeqLen`-token windows; a document starts in the window its
    * preceding cumulative token count falls into). Packing is
    * CONTIGUOUS per (source, doc-bucket): a running token sum over a
    * window PARTITIONED by (source, bucket) — never a global
    * SinglePartition window — assigns each doc its starting sequence
    * as `(running - tokens) div SeqLen`. At 100 TB each bucket packs
    * independently in parallel and the result is byte-deterministic
    * (pure integer math over the doc_id order), which is what makes
    * training-data builds reproducible.
    */
  def packSequences(s: SparkSession, dir: String): DataFrame =
    packBy(s, dir,
      size(regexp_extract_all(col("text"),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long"))

  /** H10: the packing BOUNDARY manifest — per packed document, its
    * sequence and its token offset inside that sequence. This is the
    * attention-mask / loss-mask input a trainer needs on top of H1's
    * sequence manifest: cross-document attention is masked exactly at
    * these [offset, offset+tokens) spans, and the span arithmetic is
    * the same one window + projection as H1 (no extra shuffle — the
    * doc grain IS the pre-aggregation grain). Value-exact: offsets
    * are pure integer running-sum arithmetic in both engines.
    */
  def packMasks(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir).select(
      col("doc_id"), col("source"),
      expr(s"doc_id div $PackBucket").as("bucket"),
      size(regexp_extract_all(col("text"),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long").as("tokens"))
    val w = Window.partitionBy("source", "bucket").orderBy("doc_id")
    toks
      .withColumn("running", sum("tokens").over(w))
      .withColumn("seq_no", expr(s"(running - tokens) div $SeqLen"))
      .select(col("source"), col("bucket"), col("seq_no"), col("doc_id"),
        (col("running") - col("tokens") - col("seq_no") * SeqLen).as("offset"),
        col("tokens"))
      .orderBy("source", "bucket", "seq_no", "doc_id")
  }

  /** H13: PACKING-EFFICIENCY report — what the bucketed PARALLELISM
    * of H1 costs in padding: contiguous fill wastes tokens only at
    * each bucket's LAST window, so windows actually used per source =
    * Σ_buckets ⌈bucket_tokens/SeqLen⌉, against the single-stream
    * lower bound ⌈source_tokens/SeqLen⌉ — the gap (`wasted_windows`,
    * `efficiency_micro`) is the price of packing buckets
    * independently, and the knob it informs is PackBucket (bigger
    * buckets → fewer boundaries → less padding, less parallelism).
    * Every production training build watches exactly this number
    * (padding fraction of the token budget). One tokenize, one
    * map-combinable (source, bucket) aggregate, |sources| rows out;
    * pure integer ceilings and `div` → VALUE-EXACT.
    */
  def packEfficiency(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir).select(
      col("doc_id"), col("source"),
      expr(s"doc_id div $PackBucket").as("bucket"),
      size(regexp_extract_all(col("text"),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long").as("tokens"))
    val perBucket = toks.groupBy("source", "bucket")
      .agg(sum("tokens").as("btok"), count(lit(1)).as("nd"))
    perBucket.groupBy("source")
      .agg(
        count(lit(1)).as("n_buckets"),
        sum("nd").as("n_docs"),
        sum("btok").as("total_tokens"),
        sum(expr(s"(btok + ${SeqLen - 1}) div $SeqLen")).as("n_windows"))
      .withColumn("windows_lb",
        expr(s"(total_tokens + ${SeqLen - 1}) div $SeqLen"))
      .withColumn("wasted_windows", col("n_windows") - col("windows_lb"))
      .withColumn("efficiency_micro",
        expr("(windows_lb * 1000000L) div n_windows"))
      .orderBy("source")
  }

  /** H1 on REAL subword counts: same contiguous packing, with the
    * per-doc token count coming from the learned BPE codec (E9) —
    * what an actual training build packs by — instead of E3's regex
    * approximation. Training is vocab-bounded; the packing plan is
    * unchanged (one window + one groupBy over the SAME exchange).
    */
  def packSequencesBpe(s: SparkSession, dir: String): DataFrame = {
    val codec = BpeTokenizer.trainCodec(s, dir)
    packBy(s, dir,
      BpeTokenizer.bpeTokenCount(BpeTokenizer.words(col("text")), codec))
  }

  /** H1 (split form): TRUE causal-LM packing — documents are laid
    * head-to-tail on the token axis and windows cut every `SeqLen`
    * tokens REGARDLESS of document boundaries, so a long document
    * spills across consecutive windows (what GPT-style batching
    * actually does; `packSequences` is the whole-doc-assignment
    * approximation). Each doc occupies the token interval
    * [running−tokens, running) within its (source, bucket); it
    * explodes into exactly the windows it touches with its per-window
    * token occupancy — pure integer arithmetic after the same single
    * running-sum window, map-only from there. Every window except a
    * bucket's last therefore holds EXACTLY SeqLen tokens
    * (spec-asserted), which is the property training jobs rely on.
    */
  def packSequencesSplit(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir).select(
      col("doc_id"), col("source"),
      expr(s"doc_id div $PackBucket").as("bucket"),
      size(regexp_extract_all(col("text"),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long").as("tokens"))
    val w = Window.partitionBy("source", "bucket").orderBy("doc_id")
    toks
      .withColumn("e", sum("tokens").over(w))
      .withColumn("s", col("e") - col("tokens"))
      // a zero-token doc occupies no window at all
      .where(col("tokens") > 0)
      .withColumn("seq_no",
        explode(sequence(expr(s"s div $SeqLen"), expr(s"(e - 1) div $SeqLen"))))
      .withColumn("tok_in_win",
        least(col("e"), (col("seq_no") + 1) * SeqLen) -
          greatest(col("s"), col("seq_no") * SeqLen))
      .groupBy("source", "bucket", "seq_no")
      .agg(count(lit(1)).as("n_docs"), sum("tok_in_win").as("seq_tokens"))
      .orderBy("source", "bucket", "seq_no")
  }

  private def packBy(s: SparkSession, dir: String,
      tokenCount: org.apache.spark.sql.Column): DataFrame = {
    val toks = docs(s, dir).select(
      col("doc_id"), col("source"),
      expr(s"doc_id div $PackBucket").as("bucket"),
      tokenCount.as("tokens"))
    val w = Window.partitionBy("source", "bucket").orderBy("doc_id")
    toks
      .withColumn("running", sum("tokens").over(w))
      .withColumn("seq_no", expr(s"(running - tokens) div $SeqLen"))
      .groupBy("source", "bucket", "seq_no")
      .agg(count(lit(1)).as("n_docs"), sum("tokens").as("seq_tokens"),
        // the sequence MANIFEST a training job consumes: which docs,
        // in order, fill this window (bounded by docs-per-window)
        concat_ws(",", sort_array(collect_list(col("doc_id"))))
          .as("docs_csv"))
      .orderBy("source", "bucket", "seq_no")
  }

  /** H2: mixture sampling — downsample each source to a target mixture
    * weight (the "data mixing" stage of every public LLM data recipe:
    * per-source sampling rates chosen so the training distribution
    * matches a target, not the crawl distribution). The keep rule is
    * the engine's deterministic hash sample (multiplicative hash mod
    * 1e6 against the source's weight), so the SAME documents are kept
    * on every run and in every engine — reproducible mixtures, no RNG.
    * Map-only scan + one per-source aggregate; the achieved rate is
    * reported against the target so drift is visible.
    */
  /** Target weight per source, derived from its numeric suffix:
    * 0.1/0.3/0.5/0.7/0.9 cycling — a deterministic stand-in for the
    * user-supplied mixture table.
    */
  private[graft] def weightMicro: org.apache.spark.sql.Column =
    lit(100000L) + (substring(col("source"), 4, 10).cast("long") % 5) * 200000L

  /** The deterministic keep rule: multiplicative hash of doc_id mod
    * 1e6 against the source's weight — same docs kept in every run
    * and every engine.
    */
  private[graft] def keepRule: org.apache.spark.sql.Column =
    pmod(col("doc_id") * 1048573L + 11L, lit(1000000L)) < weightMicro

  def mixtureSample(s: SparkSession, dir: String): DataFrame = {
    docs(s, dir)
      .withColumn("weight_micro", weightMicro)
      .withColumn("kept", keepRule.cast("int"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("kept").cast("long").as("n_kept"),
        first("weight_micro").as("weight_micro"),
        floor(sum("kept").cast("double") * 1000000.0 / count(lit(1)))
          .cast("long").as("achieved_micro"))
      .orderBy("source")
  }

  /** H5: token-budget-balanced sampling — the "equal token budgets"
    * mixing rule of public data recipes (sample every source down to
    * the SMALLEST source's token count, so no channel dominates by
    * sheer volume): per-source keep-rate = budget/total in exact
    * micro-integers, applied through the same deterministic
    * multiplicative-hash keep rule as H2 — reproducible, engine-
    * independent, no RNG. Scale shape: one map-only tokenize, one
    * per-source aggregate (sources² ≪ anything — a broadcast
    * artifact), one broadcast join of rates back onto the scan, one
    * per-source re-aggregate; never a global sort or repartition.
    * The achieved token count is reported against the budget so
    * hash-rule drift is visible.
    */
  def tokenBudgetSample(s: SparkSession, dir: String): DataFrame = {
    // ONE tokenize, kept honest (the E14/E17 rule): the (doc, source,
    // tokens) grain is tiny and feeds BOTH the per-source totals and
    // the final keep-rate join — uncached, the plan re-reads and
    // re-tokenizes the whole corpus for the second consumer, doubling
    // the dominant cost at 100 TB. Plan-spec'd single-tokenize.
    val toks = docs(s, dir).select(
      col("doc_id"), col("source"),
      size(regexp_extract_all(col("text"),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long").as("tokens"))
      .grainCache()
    val totals = toks.groupBy("source").agg(sum("tokens").as("total_tokens"))
    val budget = totals.agg(min("total_tokens").as("budget"))
    val rates = totals.crossJoin(broadcast(budget))
      .select(col("source"), col("total_tokens"), col("budget"),
        expr("(budget * 1000000L) div total_tokens").as("rate_micro"))
    toks.join(broadcast(rates), Seq("source"))
      .withColumn("kept",
        (pmod(col("doc_id") * 1048573L + 11L, lit(1000000L)) < col("rate_micro"))
          .cast("int"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("kept").cast("long").as("n_kept"),
        first("total_tokens").as("total_tokens"),
        first("budget").as("budget_tokens"),
        first("rate_micro").as("rate_micro"),
        sum(col("kept") * col("tokens")).as("kept_tokens"))
      .orderBy("source")
  }

  /** Chunk geometry: window of `ChunkSize` words advancing by
    * `ChunkStride` (so consecutive chunks overlap by 8 words — the
    * standard RAG/context-window overlap that keeps boundary-spanning
    * content intact in at least one chunk).
    */
  val ChunkSize = 64L
  val ChunkStride = 56L

  /** H4: document chunking — the fixed-window segmentation pass that
    * turns long documents into bounded retrieval/training units
    * (every RAG index build and long-doc training pipeline runs one).
    * Each doc's pre-token sequence (H1's regex universe) is cut into
    * `ChunkSize`-word windows advancing by `ChunkStride`; the final
    * window clips at the document end, and a doc shorter than one
    * window is its own single chunk. MAP-ONLY: chunk count is pure
    * arithmetic on the word count, chunk rows explode from a
    * `sequence()` — no shuffle but the output ordering, so the pass
    * scales linearly with input splits at 100 TB. Deterministic
    * integer geometry → value-exact DuckDB oracle (list slicing
    * replays the same windows).
    */
  def chunkDocuments(s: SparkSession, dir: String): DataFrame = {
    val w = BpeTokenizer.words(col("text"))
    docs(s, dir)
      .select(col("doc_id"), w.as("w"))
      .withColumn("nw", size(col("w")).cast("long"))
      .where(col("nw") > 0)
      // n_chunks = 1 + ceil(max(nw - size, 0) / stride); div keeps it
      // in exact integer math (long / long would widen to double)
      .withColumn("n_chunks",
        expr(s"1L + (greatest(nw - $ChunkSize, 0L) + ${ChunkStride - 1}L) div ${ChunkStride}L"))
      .withColumn("chunk_no", explode(sequence(lit(0L), col("n_chunks") - 1L)))
      .withColumn("chunk_start", col("chunk_no") * ChunkStride)
      .withColumn("chunk_len", least(lit(ChunkSize), col("nw") - col("chunk_start")))
      .select(
        col("doc_id"), col("chunk_no"), col("chunk_start"), col("chunk_len"),
        element_at(col("w"), (col("chunk_start") + 1L).cast("int")).as("first_word"),
        element_at(col("w"), (col("chunk_start") + col("chunk_len")).cast("int")).as("last_word"))
      .orderBy("doc_id", "chunk_no")
  }

  /** H3 (flagship composite): the WHOLE training-set build, end to
    * end — C7's curated document set (quality gate → decontamination
    * gate → near-dup representative) → H2's mixture sampling → H1's
    * contiguous sequence packing — summarized per source as (docs
    * sampled, sequences produced, total tokens). Every stage is
    * portable integer/window arithmetic, so the ENTIRE pipeline —
    * five operator families composed — is hash-checked against the
    * oracle in one query. This is the end state the engine exists
    * for: raw crawl in, reproducible packed training mixture out.
    */
  def assembleCorpus(s: SparkSession, dir: String): DataFrame = {
    val kept = Dedup.curatedDocs(s, dir)
    val sampled = kept.where(keepRule)
      .select(col("doc_id"), col("source"),
        expr(s"doc_id div $PackBucket").as("bucket"),
        col("n_toks").cast("long").as("tokens"))
    val w = Window.partitionBy("source", "bucket").orderBy("doc_id")
    sampled
      .withColumn("running", sum("tokens").over(w))
      .withColumn("seq_no", expr(s"(running - tokens) div $SeqLen"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        count_distinct(col("bucket"), col("seq_no")).as("n_seqs"),
        sum("tokens").as("total_tokens"))
      .orderBy("source")
  }

  /** H14: SEEDED deterministic corpus shuffle — the training-order
    * shuffle every epoch needs, engine-independent by construction:
    * the order key is `md5(doc_id # seed)` (identical hex in any
    * engine), so the same seed reproduces the same global order on
    * any cluster size, any partitioning, any restart — and a new seed
    * is a fresh permutation. The total order is a range-partitioned
    * sort (the terasort shape), never a single partition.
    */
  def seededShuffle(docs: DataFrame, seed: String): DataFrame =
    docs.withColumn("shuffle_key",
      md5(concat(col("doc_id").cast("string"), lit("#" + seed))))

  /** H14 (resume leg): mid-epoch resume by KEY WATERMARK, not by
    * offset — `skip(N)` must re-establish the global order and
    * discard N rows on every restart (a sort per crash at 100 TB);
    * the key watermark is one checkpointed string and an ordinary
    * range predicate. Against the live derivation it evaluates
    * map-side; against a MATERIALIZED epoch (the real shape: the
    * shuffled order written once, range-sorted on `shuffle_key`) it
    * pushes into the parquet scan and min/max stats prune the
    * already-consumed row groups entirely (spec-asserted).
    */
  def resumeAfter(shuffled: DataFrame, watermark: String): DataFrame =
    shuffled.where(col("shuffle_key") > lit(watermark))

  /** H14 query: the first 20 docs of epoch seed `ep1`, then the NEXT
    * 20 resumed from the 20th doc's key — keyed resume must equal the
    * oracle's offset semantics (rows 21-40 of the global order)
    * without ever skip-scanning the head.
    */
  def shuffleResume(s: SparkSession, dir: String): DataFrame = {
    val keyed = seededShuffle(docs(s, dir).select("doc_id"), "ep1")
    val head = keyed.orderBy("shuffle_key").limit(20)
      .localCheckpoint(true) // served twice: output + watermark
    try {
      val watermark = head.orderBy(col("shuffle_key").desc).limit(1)
        .collect()(0).getAs[String]("shuffle_key")
      val resumed = resumeAfter(keyed, watermark)
        .orderBy("shuffle_key").limit(20)
      head.withColumn("slice", lit("head"))
        .unionByName(resumed.withColumn("slice", lit("resumed")))
        .select("slice", "doc_id", "shuffle_key")
        .orderBy("shuffle_key")
        .localCheckpoint(true)
    } finally graft.GraftSession.releaseCheckpoint(head)
  }

  def shuffleResumeOracleSql: String = """
    WITH ordered AS (
      SELECT doc_id,
             md5(CAST(doc_id AS VARCHAR) || '#ep1') AS shuffle_key,
             row_number() OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR) || '#ep1')) AS rn
      FROM documents)
    SELECT CASE WHEN rn <= 20 THEN 'head' ELSE 'resumed' END AS slice,
           doc_id, shuffle_key
    FROM ordered WHERE rn <= 40 ORDER BY shuffle_key"""

  /** H6: curriculum staging (Bengio et al. 2009, applied to LLM data
    * ordering): rank every document by a model-free difficulty proxy —
    * E8's unigram log-likelihood, where common-word fluent text scores
    * HIGH (easy) and rare-word text LOW (hard) — and cut each source
    * into 4 easy→hard stages. The training loader then consumes stage
    * 1 before stage 2, etc. Staging is PER SOURCE (ntile partitioned
    * by source, ordered easy→hard with doc_id tie-break): the window
    * never collapses to a single partition, every source contributes
    * to every stage (a global cut would put an entire easy source in
    * stage 1), and the quartile arithmetic is pure integer rank
    * division — oracle-exact with no percentile-interpolation FP edge.
    * Output: one manifest row per doc, ordered by (stage, source,
    * doc_id) — exactly the order a stage-sequential loader reads.
    */
  /** H7: deterministic train/val/test split, stratified per source —
    * the holdout carve-out every training build runs before packing.
    * The split key is the same multiplicative-hash rule as H2's
    * mixture sampling (engine-independent, no RNG, stable under
    * re-runs and re-partitioning): hash mod 100 → 0-89 train,
    * 90-94 val, 95-99 test. Stratification is free — the hash is
    * uniform WITHIN each source, so every source lands ≈90/5/5 and no
    * split ever loses a source entirely. Map-only scan + one
    * per-(source, split) aggregate; the per-doc assignment is
    * recoverable by re-applying the rule (no assignment table to
    * store at 100 TB — the rule IS the assignment).
    */
  def trainValTestSplit(s: SparkSession, dir: String): DataFrame = {
    val bucket = pmod(col("doc_id") * 1048573L + 11L, lit(100L))
    val split = when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    docs(s, dir)
      .select(col("doc_id"), col("source"), split.as("split"),
        size(split_part_tokens).cast("long").as("n_toks"))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .orderBy("source", "split")
  }

  private def split_part_tokens =
    expr("filter(split(trim(text), '\\\\s+'), w -> length(w) > 0)")

  /** H12: WEIGHTED sampling without replacement (Efraimidis-Spirakis
    * A-ES) — quality-proportional data selection: sample k documents
    * with inclusion odds ∝ a per-doc weight (here the distinct-token
    * count — a quality proxy), the curation step between scoring
    * (E2/E13) and packing. Each doc draws the deterministic uniform
    * u = (hash(doc_id)+1)/10⁶ and keys on ln(u)/w (the log form of
    * A-ES's u^(1/w) — maximizing either is the same order); the
    * sample IS the top-k by key, so the whole operator is one
    * map-side projection + a tree-reduced TakeOrdered — no shuffle
    * of the corpus, no per-group state, the only sound distributed
    * shape for weighted sampling at 100 TB.
    *
    * Exactness: the key is emitted floor-micro'd; this is a
    * floor-after-transcendental (the E8 precedent) — JVM Math.log
    * and DuckDB ln agree to the last bit on these rational inputs,
    * and the per-doc keys are spec-replayed against driver Math.log
    * so any future ULP flip is diagnosable per doc.
    */
  def weightedSample(s: SparkSession, dir: String, k: Int = 50): DataFrame = {
    val toksLower = graft.functions.TextFns.tokensLower(col("text"))
    val scored = docs(s, dir).select(
      col("doc_id"),
      greatest(size(array_distinct(toksLower)).cast("long"), lit(1L)).as("weight"))
      .withColumn("u",
        (pmod(col("doc_id") * 1048573L + 11L, lit(1000000L)) + 1L)
          .cast("double") / 1000000.0)
      .withColumn("key_micro",
        floor(log(col("u")) / col("weight").cast("double") * 1000000.0)
          .cast("long"))
    scored.select(col("doc_id"), col("weight"), col("key_micro"))
      .orderBy(col("key_micro").desc, col("doc_id"))
      .limit(k)
  }

  /** H11: LEAKAGE-SAFE split — H8's hash split keyed on the C6
    * near-dup CLUSTER instead of the document: a near-copy of a
    * training doc landing in val/test is the classic contamination a
    * doc-level split leaves open (eval scores inflate on memorized
    * text). Every member shares its cluster's canonical id (= min
    * member, from the oracle-exact C6 form), so hashing THAT id
    * co-locates whole clusters by construction. Accounting per
    * split: docs, distinct clusters, tokens, and `n_rehomed` — the
    * docs a doc-level split WOULD have placed in a different split
    * than their cluster (the exact leakage surface this closes;
    * nonzero on this corpus, spec-pinned). Scale: the cluster pass
    * is C6's (blocked, adaptive CC); the split itself is one
    * map-side hash + one aggregate — no new shuffle beyond the
    * cluster join.
    */
  def clusterSafeSplit(s: SparkSession, dir: String): DataFrame = {
    def splitOf(key: org.apache.spark.sql.Column) = {
      val bucket = pmod(key * 1048573L + 11L, lit(100L))
      when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    }
    val clusters = graft.operators.Dedup.nearDupClustersExact(s, dir)
    val toks = docs(s, dir)
      .select(col("doc_id"), size(split_part_tokens).cast("long").as("n_toks"))
    clusters.join(toks, Seq("doc_id"))
      .select(col("doc_id"), col("cluster"),
        splitOf(col("cluster")).as("split"),
        splitOf(col("doc_id")).as("doc_split"), col("n_toks"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("cluster")).as("n_clusters"),
        sum("n_toks").as("n_tokens"),
        sum(when(col("doc_split") =!= col("split"), 1L).otherwise(0L))
          .as("n_rehomed"))
      .orderBy("split")
  }

  def curriculumStages(s: SparkSession, dir: String): DataFrame = {
    val lp = TextAnalysis.unigramLogprob(s, dir)
      .select(col("doc_id"), col("n_words"), col("avg_lp_micro"))
    val src = docs(s, dir).select(col("doc_id"), col("source"))
    val w = Window.partitionBy("source")
      .orderBy(col("avg_lp_micro").desc, col("doc_id"))
    src.join(lp, Seq("doc_id"))
      .withColumn("stage", ntile(4).over(w).cast("long"))
      .select(col("doc_id"), col("source"), col("n_words"),
        col("avg_lp_micro"), col("stage"))
      .orderBy("stage", "source", "doc_id")
  }
}
