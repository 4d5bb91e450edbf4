package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** BPE-style subword tokenizer — the token counter a training-data
  * pipeline budgets with, as a pure codegen'd expression chain that
  * the DuckDB oracle can mirror exactly.
  *
  * Algorithm (classic byte-pair-encoding ENCODE with a fixed, rank-
  * ordered merge vocabulary): start from single characters; for each
  * merge rule (a, b) in rank order, merge every leftmost
  * non-overlapping adjacent pair (a, b) into the piece `ab`.
  * Subword count = pieces remaining.
  *
  * Representation: every piece is wrapped as `\u0002piece\u0003`, so
  * the whole piece SEQUENCE is one string and one merge pass is one
  * `replace(s, "\u0002a\u0003\u0002b\u0003", "\u0002ab\u0003")` —
  * plain left-to-right non-overlapping string replacement, which is
  * exactly the leftmost BPE merge pass, and is available (with
  * identical scan semantics) in every engine. Both sides of the
  * correctness gate are generated from the SAME [[merges]] list, so
  * the oracle checks the merge algorithm itself, not a lookalike.
  * BpeTokenizerSpec additionally checks the string form against an
  * independent piece-list implementation of BPE.
  *
  * The merge vocabulary is letter-pair-only by construction: maximal
  * letter runs are single pre-tokens under the GPT-2-style
  * pre-tokenizer split, and a letter-letter merge can never cross a
  * letter-run boundary (adjacent letters are by definition the same
  * run) — so merging over the raw wrapped text is equivalent to
  * pre-tokenizing first and merging within pre-tokens, and the whole
  * pipeline stays one flat map-side expression. A production
  * vocabulary with space/punctuation merges would mark pre-token
  * boundaries with a third sentinel first (same plan shape).
  */
object BpeTokenizer {

  private val L = "\u0002"
  private val R = "\u0003"

  /** Rank-ordered merge vocabulary (most frequent English pairs, the
    * shape a corpus-trained BPE vocabulary takes; multi-step chains
    * like t+h→th, th+e→the build real multi-char subwords).
    */
  val merges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("in", "g"), ("a", "n"),
    ("an", "d"), ("e", "r"), ("o", "n"), ("r", "e"), ("a", "t"),
    ("e", "n"), ("o", "r"), ("e", "s"), ("o", "u"), ("i", "s"),
    ("i", "t"), ("a", "l"), ("e", "d"), ("s", "t"), ("o", "f"),
    ("t", "o"), ("l", "e"), ("c", "h"), ("s", "h"))

  require(merges.forall { case (a, b) =>
    (a + b).forall(c => c.isLetter && c.isLower) },
    "merge vocabulary must be lowercase-letter-only (see Scaladoc)")

  /** Pieces string: every char wrapped, then all merges applied. */
  private def piecesString(c: Column): Column = {
    // pre-existing sentinel chars in the input would corrupt piece
    // boundaries — scrub them first (deterministic in both engines)
    val clean = replace(replace(c, lit(L), lit("")), lit(R), lit(""))
    val wrapped = regexp_replace(clean, "(?s)(.)", s"$L$$1$R")
    merges.foldLeft(wrapped) { case (acc, (a, b)) =>
      replace(acc, lit(s"$L$a$R$L$b$R"), lit(s"$L$a$b$R"))
    }
  }

  /** Subword piece count of a text column (LongType). Since round 6
    * this rides the [[BpePieces]] JVM expression; the replace-chain
    * form survives as [[subwordCountChain]] (the differential twin —
    * and still the shape the DuckDB oracle runs via
    * [[subwordCountSql]], so the gate re-proves equivalence).
    */
  def subwordCount(c: Column): Column =
    size(BpePieces.bpe_pieces(c)).cast("long")

  /** The subword pieces themselves, as array<string>. Empty (or
    * sentinel-only) input yields an EMPTY array, agreeing with
    * `subwordCount = 0`.
    */
  def subwordPieces(c: Column): Column = BpePieces.bpe_pieces(c)

  /** The original sentinel-wrapped replace-chain count — kept as the
    * spec's differential reference for [[subwordCount]].
    */
  private[graft] def subwordCountChain(c: Column): Column = {
    val s = piecesString(c)
    (length(s) - length(replace(s, lit(L), lit("")))).cast("long")
  }

  /** The original replace-chain pieces — spec reference. */
  private[graft] def subwordPiecesChain(c: Column): Column = {
    val s = piecesString(c)
    val trimmed = regexp_replace(s, s"^$L|$R$$", "")
    when(length(s) > 0, split(trimmed, s"$R$L"))
      .otherwise(array().cast("array<string>"))
  }

  /** DuckDB mirror of [[subwordCount]] applied to SQL expression `e`
    * — generated from the same merge list, with the sentinel chars
    * embedded literally (Verify's JSON escaper handles them).
    */
  private def mergedSql(e: String): String = {
    val clean = s"replace(replace($e, '$L', ''), '$R', '')"
    val wrapped = s"regexp_replace($clean, '(.)', '$L\\1$R', 'gs')"
    merges.foldLeft(wrapped) { case (acc, (a, b)) =>
      s"replace($acc, '$L$a$R$L$b$R', '$L$a$b$R')"
    }
  }

  def subwordCountSql(e: String): String = {
    val merged = mergedSql(e)
    s"(length($merged) - length(replace($merged, '$L', '')))"
  }

  /** DuckDB mirror of [[subwordPieces]]: the pieces as VARCHAR[],
    * empty input → empty list (matching the expression's guard).
    */
  def subwordPiecesSql(e: String): String = {
    val merged = mergedSql(e)
    s"""(CASE WHEN length($merged) > 0
       | THEN string_split(regexp_replace($merged, '^$L|$R$$', '', 'g'), '$R$L')
       | ELSE CAST([] AS VARCHAR[]) END)""".stripMargin.replace("\n", "")
  }
}
