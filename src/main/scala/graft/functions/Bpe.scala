package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}

/** Compile-time BPE (byte-pair-encoding) tokenizer — the
  * tokenizer-faithful token accounting the LLM-curation gates need
  * (whitespace counts mis-budget real tokenizers by 1.3–2×).
  *
  * The MERGE TABLE is the tokenizer definition: a rank-ordered list
  * of (left, right) token merges, hand-authored over frequent
  * English letter pairs and chained multi-char merges (th→the,
  * ti→tion — the shapes a trained BPE learns), embedded at compile
  * time exactly like the IntLn/IntProbit constant tables. Inference
  * is the standard greedy algorithm (the GPT-2 convention): start
  * from characters, repeatedly find the LOWEST-RANK merge whose pair
  * is adjacent somewhere in the word, merge ALL its non-overlapping
  * occurrences left-to-right, stop when no rule applies. Words are
  * lowercase [a-z]+ runs (the pre-tokenizer), so token text never
  * collides with the encoding separator.
  *
  * THREE independent derivations share only the table:
  *  - [[BpeCount]] (native Catalyst expression): the string-replace
  *    engine over the double-separator encoding — each token is
  *    written `|tok|`, so the pair (a,b) is adjacent iff the string
  *    contains `|a||b|`, and `replace(w, "|a||b|", "|ab|")` merges
  *    all occurrences left-to-right non-overlapping (exactly the
  *    greedy semantics).
  *  - the DuckDB oracle: a RECURSIVE CTE applying the same
  *    replace-step over the same encoding until no rule matches
  *    ([[duckMergesValues]] / [[duckEnc]] build the fragments).
  *  - the spec's brute: the classical pair-list scan
  *    (tokens-as-vector, argmin over adjacent pairs) — a genuinely
  *    different algorithm that must agree token-for-token.
  */
object Bpe {

  /** Rank-ordered merges; rank = index + 1. */
  val Merges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "r" -> "e",
    "o" -> "n", "e" -> "r", "a" -> "t", "e" -> "n", "o" -> "r",
    "e" -> "s", "s" -> "t", "a" -> "r", "o" -> "u", "in" -> "g",
    "a" -> "l", "i" -> "t", "i" -> "s", "e" -> "d", "t" -> "o",
    "an" -> "d", "l" -> "e", "c" -> "h", "s" -> "e", "r" -> "o",
    "m" -> "e", "d" -> "e", "c" -> "o", "u" -> "n", "l" -> "l",
    "i" -> "c", "er" -> "s", "t" -> "i", "ti" -> "on", "a" -> "s",
    "h" -> "e", "w" -> "h", "o" -> "m", "b" -> "e", "w" -> "e",
    "u" -> "r", "l" -> "o", "l" -> "a", "s" -> "h", "p" -> "o",
    "m" -> "a", "s" -> "i", "d" -> "i", "f" -> "o", "w" -> "a",
    "e" -> "a", "n" -> "o", "u" -> "s", "p" -> "r", "c" -> "a",
    "v" -> "e", "p" -> "a", "e" -> "l", "g" -> "r", "p" -> "l",
    "f" -> "i", "n" -> "e", "the" -> "r", "and" -> "s")

  val Sep = '|'

  /** Double-separator encoding: each token rendered `|tok|`. */
  def enc(word: String): String =
    word.map(c => s"$Sep$c$Sep").mkString

  def pat(a: String, b: String): String = s"$Sep$a$Sep$Sep$b$Sep"
  def rep(a: String, b: String): String = s"$Sep$a$b$Sep"

  private val patterns: Array[(String, String)] =
    Merges.map { case (a, b) => (pat(a, b), rep(a, b)) }.toArray

  /** Greedy BPE over one word via the string-replace engine;
    * returns the final tokens.
    */
  def tokens(word: String): Seq[String] = {
    var w = enc(word)
    var applied = true
    while (applied) {
      applied = false
      var i = 0
      while (!applied && i < patterns.length) {
        val (p, r) = patterns(i)
        if (w.contains(p)) { w = w.replace(p, r); applied = true }
        i += 1
      }
    }
    // strip the outer separators, split on the doubled inner ones
    if (word.isEmpty) Seq.empty
    else w.substring(1, w.length - 1).split(s"\\$Sep\\$Sep", -1).toSeq
  }

  def countTokens(word: String): Long = {
    require(word.indexOf(Sep) < 0, s"BPE word contains the separator: $word")
    tokens(word).length.toLong
  }

  /** `(rank, pat, rep)` VALUES rows for the oracle's merge relation. */
  def duckMergesValues: String =
    Merges.zipWithIndex.map { case ((a, b), i) =>
      s"(${i + 1}, '${pat(a, b)}', '${rep(a, b)}')"
    }.mkString(", ")

  /** DuckDB expression rendering a word column into the encoding
    * (each char becomes `|c|`; RE2 replacement, no lookahead needed).
    */
  def duckEnc(col: String): String =
    s"regexp_replace($col, '(.)', '$Sep\\1$Sep', 'g')"
}

/** Native expression: BPE token count of a lowercase [a-z]+ word. */
case class BpeCount(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_count"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(Bpe.countTokens(input.toString))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
