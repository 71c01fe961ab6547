package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData

/** Byte-pair-encoding codec: an ordered merge list learned by
  * `BpeTokenizer.trainCodec` (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units" — the public BPE
  * algorithm every production tokenizer descends from).
  *
  * Encoding applies the merges IN LEARNED ORDER, each as one greedy
  * left-to-right non-overlapping replacement pass over the word's
  * symbol sequence. For a merge list produced by BPE training this is
  * equivalent to the classic lowest-rank-first loop: applying merge i
  * can only create adjacencies that involve its OWN output symbol
  * (rank > i by construction — a pair is only learnable once both its
  * symbols exist), never a new occurrence of an earlier pair. The
  * sequential form is what makes the codec ORACLE-PORTABLE: with the
  * symbol sequence rendered as a space-prefixed string (" a b c"),
  * each merge is literally `replace(s, ' a b', ' ab')`, and SQL
  * engines' literal replace has the same left-to-right semantics —
  * so DuckDB can replay the encode exactly (see
  * BpeTokenizer.oracleEncodeSql).
  *
  * Thread-safe: encode results for distinct words are memoized in a
  * bounded ConcurrentHashMap (Zipf word distributions make the memo
  * hit rate ~the corpus repetition factor).
  */
case class BpeCodec(merges: Seq[(String, String)]) extends Serializable {

  @transient private lazy val patterns: Array[(String, String)] =
    merges.iterator.map { case (l, r) => (" " + l + " " + r, " " + l + r) }.toArray

  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private val MemoCap = 1 << 16

  /** Space-prefixed symbol string after all merges: every symbol is
    * preceded by exactly one space (" ab c d"), so `#symbols` =
    * `#spaces` and a merge pattern " l r" can never match inside
    * symbols (spaces mark symbol starts only).
    */
  def encodedRepr(word: String): String = {
    val sb = new java.lang.StringBuilder(word.length * 2)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      sb.append(' ').appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    var s = sb.toString
    var m = 0
    while (m < patterns.length) {
      val p = patterns(m)
      if (s.contains(p._1)) s = s.replace(p._1, p._2)
      m += 1
    }
    s
  }

  /** BPE tokens of one word. */
  def encode(word: String): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    encodedRepr(word).substring(1).split(' ').toSeq
  }

  /** Number of BPE symbols `word` encodes to (memoized). */
  def countWord(word: String): Int = {
    val cached = memo.get(word)
    if (cached != null) return cached.intValue()
    val r = encodedRepr(word)
    var n = 0
    var i = 0
    while (i < r.length) { if (r.charAt(i) == ' ') n += 1; i += 1 }
    if (memo.size < MemoCap) memo.put(word, n)
    n
  }
}

/** Total BPE token count over an array<string> of pre-tokenized words
  * — the hot-path scan expression feeding sequence packing (H1): one
  * long per row, no token arrays materialized, memoized per distinct
  * word, inside whole-stage codegen via a monomorphic kernel call
  * (see HyperplaneLshExpr.compute for the pattern).
  */
case class BpeTokenCountExpr(child: Expression, codec: BpeCodec)
    extends UnaryExpression {

  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.LongType
  override def prettyName: String = "bpe_token_count"

  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    var total = 0L
    var i = 0
    while (i < n) {
      val w = arr.getUTF8String(i)
      if (w != null) total += codec.countWord(w.toString)
      i += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bpeCountExpr", this, classOf[BpeTokenCountExpr].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $self.compute($arr);")
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(compute(input.asInstanceOf[ArrayData]))

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
