package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Text primitives for the LLM-pipeline operators, built from
  * codegen-friendly `functions._` compositions (no Scala UDFs in hot
  * paths — every expression here stays inside Catalyst).
  *
  * Determinism: all hash lanes derive from xxhash64 plus fixed odd
  * affine constants, so results are stable across runs and partitions.
  */
object TextFns {

  /** Non-whitespace token array. */
  def tokens(text: Column): Column = regexp_extract_all(text, lit("\\S+"), lit(0))

  /** Lower-cased token array. */
  def tokensLower(text: Column): Column = tokens(lower(text))

  /** k-word shingles as strings ("w1 w2 w3"). Empty array when the
    * document has fewer than k tokens.
    */
  def wordShingles(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
      .otherwise(array().cast("array<string>"))

  /** xxhash64 of every shingle — the single string-hash pass; all
    * minhash lanes are cheap affine transforms of these.
    */
  def shingleHashes(shingles: Column): Column = transform(shingles, s => xxhash64(s))

  /** Native k-token shingle hashing with no shingle-string
    * materialization (see WordShingleHashesExpr); k=1 gives plain
    * token hashes.
    */
  def wordShingleHashes(toks: Column, k: Int): Column =
    Bridge.column(WordShingleHashesExpr(Bridge.expression(toks), k))

  /** One-pass lowercase+tokenize+shingle-hash from raw text (see
    * TextShingleHashesExpr) — the dedup signature scan path.
    */
  def textShingleHashes(text: Column, k: Int): Column =
    Bridge.column(TextShingleHashesExpr(Bridge.expression(text), k))

  /** n-lane minhash signature: lane i = min over shingles of
    * XXH64(h, seed_i) — a native single-pass Catalyst expression (the
    * HOF formulation allocates a lane-sized array per lane and boxes
    * every lambda call; see expressions.scala).
    */
  def minhashSignature(hashes: Column, n: Int): Column =
    Bridge.column(MinHashSignatureExpr(Bridge.expression(hashes), n))

  /** LSH banding: split an n-lane signature into `bands` bands and
    * hash each band to a single long. Returns array of band hashes
    * (index in the array = band id).
    */
  def bandHashes(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      aggregate(
        slice(signature, b * rowsPerBand + 1, rowsPerBand),
        lit(1125899906842597L),
        (acc, x) => xxhash64(acc, x))
    }: _*)

  /** Estimated Jaccard from two equal-length minhash signatures:
    * fraction of agreeing lanes.
    */
  def estJaccard(sigA: Column, sigB: Column): Column =
    aggregate(zip_with(sigA, sigB, (a, b) => when(a === b, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x).cast("double") / size(sigA)

  /** Exact Jaccard over two shingle-set arrays. */
  def exactJaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  /** 64-bit SimHash from token hashes: bit i is set when more than
    * half the tokens have bit i set in their hash. Weightless variant;
    * O(64·|tokens|) cheap ops, map-side.
    */
  def simhash64(hashes: Column): Column =
    Bridge.column(SimHash64Expr(Bridge.expression(hashes)))

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Split a 64-bit signature into 4 16-bit sub-keys (for hamming-
    * bucketed candidate generation: distance ≤ 3 ⇒ at least one
    * sub-key matches exactly).
    */
  def simhashBands(sig: Column): Column =
    array((0 until 4).map(b => shiftrightunsigned(sig, b * 16).bitwiseAND(lit(0xFFFFL))): _*)

  /** Winnowing fingerprint: k-char shingle rolling hashes → sliding
    * window of w → per-window minimum → distinct sorted mins.
    * (Schleimer et al., SIGMOD 2003 winnowing scheme.)
    */
  /** HOF winnowing over a single Column — convenience form for small
    * inputs/specs ONLY. The nested lambda re-evaluates the gram array
    * per window position in interpreted eval (HOFs don't codegen), so
    * this is O(n²) per document; the operators use the relational
    * explode+window formulation in TextAnalysis.fingerprint instead.
    */
  /** Character k-gram XXH64 hashes in one pass (native expression) —
    * byte-identical to `xxhash64(substring(text, pos+1, k))` per
    * position, incl. the clipped short-text fallback.
    */
  def gramHashes(text: Column, k: Int): Column =
    Bridge.column(GramHashesExpr(Bridge.expression(text), k, poly = false))

  /** Exactly-portable polynomial k-gram hashes in one pass (native
    * expression) — bit-identical to the Σ ascii(substring)·257^j SQL
    * formulation that the DuckDB oracle mirrors.
    */
  def polyGramHashes(text: Column, k: Int): Column =
    Bridge.column(GramHashesExpr(Bridge.expression(text), k, poly = true))

  /** Portable word k-gram span hashes in one pass (native expression) —
    * bit-identical to the two-level mod-P HOF formulation the DuckDB
    * oracle mirrors (spec-asserted in DedupSpec).
    */
  def wordSpanHashes(words: Column, k: Int): Column =
    Bridge.column(WordSpanHashesExpr(Bridge.expression(words), k))

  /** How many of `spans`' elements appear in `set` (sorted internally;
    * binary-search probe per element, map-side, stateless).
    */
  def spanOverlapCount(spans: Column, set: Array[Long]): Column =
    Bridge.column(ArrayOverlapCountExpr(Bridge.expression(spans), set.sorted))

  /** k-token STRING shingles (the oracle-portable exact-dedup form) —
    * native single pass; bit-identical to the
    * transform(sequence)+concat_ws HOF it replaces (spec-asserted).
    */
  def wordShingleStrings(words: Column, k: Int): Column =
    Bridge.column(WordShingleStringsExpr(Bridge.expression(words), k))

  def winnowingFingerprints(text: Column, k: Int, w: Int): Column = {
    val grams = when(length(text) >= k,
      transform(sequence(lit(0), length(text) - k),
        i => xxhash64(text.substr(i + 1, lit(k)))))
      .otherwise(array(xxhash64(text)))
    val mins = when(size(grams) >= w,
      transform(sequence(lit(0), size(grams) - w),
        i => array_min(slice(grams, i + 1, lit(w)))))
      .otherwise(array(array_min(grams)))
    array_sort(array_distinct(mins))
  }

  /** Per-language stopword lists for the n-gram/stopword language-ID
    * heuristic (tiny, public common-word lists).
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "that", "it", "was", "for", "with", "as", "his", "on", "be"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "den", "mit", "ist", "des", "im", "nicht", "ein", "eine", "auf"),
    "es" -> Seq("de", "la", "que", "el", "en", "y", "los", "del", "se", "las", "por", "un", "con", "una", "para"),
    "fr" -> Seq("de", "la", "le", "et", "les", "des", "en", "un", "du", "une", "que", "est", "dans", "qui", "par"),
    "zh" -> Seq("的", "了", "在", "是", "我", "有", "和", "就", "不", "人", "都", "一", "一个", "上", "也"))

  /** Language-ID: per-language stopword hit counts over lower-cased
    * tokens; prediction = argmax (ties broken by language code order
    * via struct comparison). Returns struct(pred, score).
    */
  def langIdScores(toks: Column): Column = {
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      val hits = size(filter(toks, t => t.isin(words.map(_.asInstanceOf[Any]): _*)))
      struct(hits.as("score"), lit(lang).as("lang"))
    }
    array_max(array(scored: _*))
  }
}
