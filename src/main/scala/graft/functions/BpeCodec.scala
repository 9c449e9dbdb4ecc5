package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Merge-based BPE token counting over a committed offline merge table
  * — the real-algorithm analog of the reference's tiktoken cl100k_base
  * validation (/root/reference/common/utils/embeddings.py:52-60, cap
  * 2042 at common/config.py:57). Zero egress forbids the actual
  * cl100k vocabulary, so the fixture `graft/bpe_merges.txt` is a
  * small, well-formed merge table committed with the repo.
  *
  * Encoding spec (implemented IDENTICALLY by the DuckDB oracle, which
  * is what makes `t_bpe_count` hash-checkable):
  *  1. a word is framed as `#c1#c2#…#cn#` (one symbol per char);
  *  2. each merge rule (a, b), in table order, runs ONE global
  *     left-to-right non-overlapping replace of `#a#b#` with `#ab#`
  *     (Java String.replace ≡ DuckDB replace, same scan order);
  *  3. token count = number of `#` boundaries − 1.
  * For a well-formed table (every rule side is a base char or an
  * earlier product) this sequential pass equals classic priority-queue
  * BPE encoding: a pair can only (re)appear after the rule that
  * creates its constituents, which is earlier in the order.
  * Caveats: symbols are UTF-16 chars (fine for the ASCII corpus) and
  * a literal `#` in a word splits deterministically on both sides.
  */
object BpeCodec {

  /** Ordered merge rules from the committed fixture. */
  val merges: Seq[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges.txt")
    require(in != null, "bpe_merges.txt missing from resources")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("//"))
      .map { l =>
        val sp = l.indexOf(' ')
        require(sp > 0 && l.indexOf(' ', sp + 1) < 0, s"bad merge rule: '$l'")
        (l.substring(0, sp), l.substring(sp + 1))
      }.toVector
    finally src.close()
  }

  private val compiled: Array[Array[String]] =
    merges.map { case (a, b) => Array(s"#$a#$b#", s"#$a$b#") }.toArray

  /** BPE token count of one word. */
  def encodeCount(token: String): Int = {
    val sb = new java.lang.StringBuilder(token.length * 2 + 1)
    sb.append('#')
    var i = 0
    while (i < token.length) { sb.append(token.charAt(i)).append('#'); i += 1 }
    var s = sb.toString
    var r = 0
    while (r < compiled.length) {
      s = s.replace(compiled(r)(0), compiled(r)(1))
      r += 1
    }
    var hashes = 0
    var j = 0
    while (j < s.length) { if (s.charAt(j) == '#') hashes += 1; j += 1 }
    hashes - 1
  }

  /** Sum of per-word BPE counts over whitespace-split text. Called
    * from generated code.
    */
  def countText(s: UTF8String): Long = {
    var total = 0L
    for (tok <- s.toString.split("\\s+") if tok.nonEmpty)
      total += encodeCount(tok)
    total
  }

  /** DuckDB expression computing [[encodeCount]] of token column/expr
    * `tok` — the exact same framing + fold-of-replaces, rules inlined
    * from [[merges]] as `pat|rep` strings.
    */
  def sqlEncodeLen(tok: String): String = {
    val rules = merges.map { case (a, b) => s"'#$a#$b#|#$a$b#'" }
      .mkString("[", ", ", "]")
    s"len(string_split(list_reduce(list_prepend(" +
      s"'#' || array_to_string(list_filter(string_split_regex($tok, ''), c -> c <> ''), '#') || '#', " +
      s"$rules), (s, r) -> replace(s, split_part(r, '|', 1), split_part(r, '|', 2))), '#')) - 2"
  }
}

/** Σ per-word BPE merge counts of a string column (codegen: one static
  * call per row, loop stays outside the interpreter).
  */
case class BpeTokenCount(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_count"

  override def nullSafeEval(s: Any): Any =
    BpeCodec.countText(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeCodec.countText($c)")

  override protected def withNewChildInternal(c: Expression): BpeTokenCount =
    copy(child = c)
}

object BpeTokenCount {
  def column(c: Column): Column =
    Shims.column(BpeTokenCount(Shims.expression(c)))
}
