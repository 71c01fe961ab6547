package graft.operators

import graft.GraftSession.GrainOps
import graft.functions.{BpeCodec, BpeTokenCountExpr}
import graft.sources.GraftCatalog
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.unsafe.types.UTF8String

/** §2.E subword tokenization: deterministic byte-pair-encoding
  * training + encoding (Sennrich et al. 2016) — the tokenizer a real
  * packing pipeline (H1) runs, replacing the "BPE-ish" regex count of
  * E3 with REAL learned-subword counts.
  *
  * Training is pure integer pair-counting over the word-frequency
  * table of a deterministic hash sample of the corpus, so the learned
  * merge list — and therefore every downstream token count — is
  * byte-identical on every run, every partitioning, and every engine.
  * Tie-breaks are (count DESC, left ASC, right ASC) in UTF-8 binary
  * order on BOTH trainer paths (Spark's string sort IS UTF-8 binary;
  * the driver path compares through UTF8String).
  *
  * Scale shape (same adaptive pattern as Dedup.connectedComponents):
  * the word-frequency table is VOCABULARY-sized, not corpus-sized —
  * one tokenize + one groupBy shuffle produces it. Below
  * `DriverVocabCap` distinct words it is collected and the merge loop
  * runs in memory (vocab-bounded, corpus-size-independent); above the
  * cap the loop runs as iterated groupBy argmax + map rounds on the
  * cluster (one tiny shuffle per merge, localCheckpoint every round to
  * truncate lineage), which holds at any corpus size.
  */
object BpeTokenizer {

  /** Pre-tokenization: letter runs | digit runs | single punctuation —
    * the same public regex E3 ("BPE-ish" count) and H1's packing
    * already use, so BPE refines those counts rather than redefining
    * the token universe.
    */
  val TokenRegex = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Merge-table size cap (stops earlier when no pair repeats). */
  val DefaultMerges = 64

  /** Vocabulary size above which training switches from the collected
    * in-memory loop to the iterated-groupBy distributed loop.
    */
  val DriverVocabCap = 2000000L

  private def docs(s: SparkSession, dir: String): DataFrame =
    new GraftCatalog(s, dir).table("documents")

  /** Pre-token array of a text column. */
  def words(text: Column): Column = regexp_extract_all(text, lit(TokenRegex), lit(0))

  /** Total BPE token count of an array<string> of words (native
    * expression, memoized per distinct word — see BpeTokenCountExpr).
    */
  def bpeTokenCount(wordsCol: Column, codec: BpeCodec): Column =
    Bridge.column(BpeTokenCountExpr(Bridge.expression(wordsCol), codec))

  /** Deterministic 10% training sample — same multiplicative-hash
    * keep-rule family as H2's mixture sampling: stable across runs,
    * partitions, and engines; never an RNG.
    */
  private def sampleDocs(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).where(pmod(col("doc_id") * 1048573L + 11L, lit(1000000L)) < 100000L)

  /** Word-frequency table of the training sample: vocabulary-sized
    * (one tokenize pass + one groupBy shuffle over the 10% sample).
    */
  private[graft] def wordFreq(s: SparkSession, dir: String): DataFrame =
    sampleDocs(s, dir)
      .select(explode(words(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Train a codec on the corpus sample in `dir`. */
  def trainCodec(s: SparkSession, dir: String, nMerges: Int = DefaultMerges,
      driverCap: Long = DriverVocabCap): BpeCodec = {
    val wf = wordFreq(s, dir).grainCache()
    try {
      val vocabSize = wf.count()
      val merges =
        if (vocabSize <= driverCap) {
          import s.implicits._
          trainDriver(wf.as[(String, Long)].collect(), nMerges)
        } else trainDistributed(wf, nMerges)
      BpeCodec(merges)
    } finally { wf.unpersist(); () }
  }

  /** One word → its initial symbol sequence (one symbol per unicode
    * code point).
    */
  private[graft] def splitSymbols(w: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toArray
  }

  /** Greedy left-to-right single-pass application of one merge — the
    * exact semantics BpeCodec.encode replays via string replace (and
    * the oracle via SQL replace), shared verbatim by both trainer
    * paths so they stay byte-identical.
    */
  private[graft] def applyMerge(syms: Array[String], l: String, r: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        out += l + r; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** UTF-8 binary string order — what Spark's ASC sort on StringType
    * does; the driver path uses it so both trainers tie-break
    * identically.
    */
  private def utf8Lt(a: String, b: String): Boolean =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) < 0

  /** In-memory merge loop over the collected word-frequency table —
    * O(vocab · avg word length) per merge round, corpus-independent.
    */
  private[graft] def trainDriver(vocab: Array[(String, Long)],
      nMerges: Int): Seq[(String, String)] = {
    var table: Array[(Array[String], Long)] =
      vocab.map { case (w, f) => (splitSymbols(w), f) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.length < nMerges) {
      val counts = new java.util.HashMap[(String, String), java.lang.Long]()
      table.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          val prev = counts.get(k)
          counts.put(k, if (prev == null) f else prev.longValue() + f)
          i += 1
        }
      }
      var best: ((String, String), Long) = null
      counts.forEach { (k, v) =>
        if (best == null || v > best._2 ||
          (v == best._2 && (utf8Lt(k._1, best._1._1) ||
            (k._1 == best._1._1 && utf8Lt(k._2, best._1._2)))))
          best = (k, v.longValue())
      }
      if (best == null || best._2 < 2L) done = true
      else {
        val (l, r) = best._1
        merges += ((l, r))
        table = table.map { case (syms, f) =>
          var touches = false
          var i = 0
          while (!touches && i < syms.length - 1) {
            touches = syms(i) == l && syms(i + 1) == r; i += 1
          }
          if (touches) (applyMerge(syms, l, r), f) else (syms, f)
        }
      }
    }
    merges.toSeq
  }

  /** At-scale merge loop: one groupBy-argmax job + one map round per
    * merge over the vocabulary-sized symbol table. localCheckpoint
    * between rounds (the map embeds the previous round's plan — see
    * Dedup.distributedLabelProp), superseded checkpoints released.
    */
  private[graft] def trainDistributed(wf: DataFrame, nMerges: Int): Seq[(String, String)] = {
    val spark = wf.sparkSession
    import spark.implicits._
    var cur = wf.as[(String, Long)]
      .map { case (w, f) => (splitSymbols(w).toSeq, f) }
      .toDF("syms", "freq").localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.length < nMerges) {
      val n = size(col("syms"))
      val best = cur.where(n >= 2)
        .select(explode(zip_with(
          slice(col("syms"), lit(1), greatest(n - 1, lit(0))),
          slice(col("syms"), lit(2), greatest(n - 1, lit(0))),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"), col("freq"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).as[(String, String, Long)].collect()
      if (best.isEmpty || best.head._3 < 2L) done = true
      else {
        val (l, r, _) = best.head
        merges += ((l, r))
        val next = cur.as[(Seq[String], Long)]
          .map { case (syms, f) => (applyMerge(syms.toArray, l, r).toSeq, f) }
          .toDF("syms", "freq").localCheckpoint()
        graft.GraftSession.releaseCheckpoint(cur)
        cur = next
      }
    }
    graft.GraftSession.releaseCheckpoint(cur)
    merges.toSeq
  }

  /** E9 query: real subword token counts per document — train on the
    * hash sample of `dir`, encode every doc. Value-exact vs the
    * baked-merge DuckDB oracle at the driver's correctness SF (a spec
    * guards the baked table against drift).
    */
  def bpeTokens(s: SparkSession, dir: String): DataFrame = {
    val codec = trainCodec(s, dir)
    val w = words(col("text"))
    docs(s, dir).select(
      col("doc_id"),
      size(w).cast("long").as("n_words"),
      bpeTokenCount(w, codec).as("bpe_tokens"))
      .orderBy("doc_id")
  }

  /** The merge table BPE training learns at sf0.01 (the driver's
    * correctness scale) — BAKED so the DuckDB oracle can replay the
    * encode as literal SQL. Regenerated by `printSf001Merges`;
    * BpeSpec asserts trainCodec(sf0.01) still produces exactly this
    * list, so drift breaks the build, not the correctness board.
    */
  val Sf001Merges: Seq[(String, String)] = Seq(
    ("e", "r"), ("o", "w"), ("i", "n"), ("o", "r"), ("s", "t"), ("t", "a"),
    ("a", "l"), ("m", "er"), ("a", "r"), ("p", "ar"), ("b", "l"), ("bl", "e"),
    ("ta", "ble"), ("l", "ow"), ("s", "low"), ("j", "o"), ("jo", "in"),
    ("d", "ow"), ("in", "dow"), ("w", "indow"), ("a", "n"), ("c", "an"),
    ("s", "can"), ("a", "s"), ("as", "h"), ("h", "ash"), ("er", "y"),
    ("or", "t"), ("q", "u"), ("qu", "ery"), ("s", "ort"), ("f", "i"),
    ("fi", "l"), ("fil", "t"), ("filt", "er"), ("al", "u"), ("alu", "e"),
    ("v", "alue"), ("u", "p"), ("a", "st"), ("f", "ast"), ("c", "t"),
    ("ct", "or"), ("e", "ctor"), ("r", "ow"), ("v", "ector"), ("g", "e"),
    ("g", "r"), ("gr", "o"), ("gro", "up"), ("mer", "ge"), ("par", "k"),
    ("s", "park"), ("b", "i"), ("bi", "g"), ("e", "y"), ("k", "ey"),
    ("a", "m"), ("a", "t"), ("at", "c"), ("atc", "h"), ("b", "atch"),
    ("e", "am"), ("h", "e"))

  /** DuckDB SQL replaying the codec's encode of word column `w`: the
    * space-prefixed symbol string (" a b c") with each merge applied
    * as one literal replace — identical left-to-right non-overlapping
    * semantics to BpeCodec.encodedRepr (see its doc for why sequential
    * application is exact BPE). Symbol count = space count.
    */
  def oracleEncodeSql(wordExpr: String, merges: Seq[(String, String)]): String = {
    merges.foreach { case (l, r) =>
      require((l + r).forall(c => c.isLetterOrDigit && c < 128),
        s"[GRAFT] non-alphanumeric merge symbol would need SQL escaping: ($l,$r)")
    }
    merges.foldLeft(s"' ' || array_to_string(regexp_extract_all($wordExpr, '.'), ' ')") {
      case (acc, (l, r)) => s"replace($acc, ' $l $r', ' $l$r')"
    }
  }

  // ── E22: the tokenizer as a PERSISTED artifact ──

  /** E22: persist a trained codec — the tokenizer file every real
    * pipeline ships (the tokenizer.json role): BPE is only usable if
    * the EXACT merge list that tokenized the training corpus is the
    * one that tokenizes everything afterwards (prompts, eval sets,
    * absorb batches); retraining "the same" tokenizer on drifted data
    * silently changes every token boundary. The artifact is the
    * rank-ordered merge table — order IS the codec, so `rank` is
    * persisted explicitly and reload sorts on it, never on file or
    * row order.
    */
  def bpeModelTrain(s: SparkSession, dir: String, modelPath: String): Unit = {
    val codec = trainCodec(s, dir)
    import s.implicits._
    codec.merges.zipWithIndex
      .map { case ((l, r), i) => (i.toLong, l, r) }
      .toDF("rank", "lhs", "rhs")
      .coalesce(1).write.mode("overwrite").parquet(s"$modelPath/merges")
  }

  /** Reload the frozen codec (rank order restored explicitly). */
  def bpeModelLoad(s: SparkSession, modelPath: String): BpeCodec =
    BpeCodec(graft.sources.GraftIO.readParquet(s, s"$modelPath/merges").orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq)

  /** Encode ARBITRARY (doc_id, text) rows with the frozen artifact —
    * one scan of the scored rows, the training corpus never
    * re-enters; the codec travels as a broadcast-sized literal inside
    * the native count expression exactly as in the scan-time path.
    */
  def bpeModelApply(s: SparkSession, modelPath: String,
      in: DataFrame): DataFrame = {
    val codec = bpeModelLoad(s, modelPath)
    val w = words(col("text"))
    in.select(col("doc_id"),
      size(w).cast("long").as("n_words"),
      bpeTokenCount(w, codec).as("bpe_tokens"))
  }

  /** E22 (query form): train → persist → encode the training corpus
    * from the artifact ALONE — must equal E9's scan-time result
    * value-for-value (the E15/E21 artifact-served ≡ scan-time
    * discipline; shares E9's oracle verbatim).
    */
  def bpeModelServe(s: SparkSession, dir: String): DataFrame = {
    val modelPath = java.nio.file.Files
      .createTempDirectory("graft_bpe_model").toString
    bpeModelTrain(s, dir, modelPath)
    bpeModelApply(s, modelPath, docs(s, dir)).orderBy("doc_id")
  }
}
