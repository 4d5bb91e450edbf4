package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable numeric/text primitives.
  *
  * The driver's correctness gate hash-compares our results against a
  * DuckDB oracle, so every value that appears in a query result must
  * be bit-identical across engines:
  *
  *  - `pround`: Spark's `round()` on DOUBLE goes through
  *    BigDecimal.valueOf(x) — i.e. the SHORTEST decimal string of x —
  *    while DuckDB rounds the raw double; they disagree whenever the
  *    shortest repr sits exactly on a .5 boundary (e.g. 189/40 =
  *    4.7249999…96, shortest "4.725" → Spark 4.73, DuckDB 4.72).
  *    floor(x·10ⁿ + 0.5)/10ⁿ is pure double arithmetic, identical
  *    everywhere.
  *  - `portableHash`: 32-bit int from the first 8 hex digits of
  *    md5(UTF-8 bytes) — identical in any engine with md5.
  *  - `tokens`: the reference tokenizer (wc/wc.go:26-39) — maximal
  *    runs of Unicode letters.
  */
object CrossEngine {

  /** Deterministic half-up rounding: floor(x·10ⁿ + 0.5)/10ⁿ. */
  def pround(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    floor(c * p + 0.5) / p
  }

  /** SQL text of pround for the DuckDB oracle. */
  def proundSql(e: String, n: Int): String = {
    val p = math.pow(10, n).toLong
    s"floor(($e) * $p + 0.5) / $p"
  }

  /** Expand every `pround(expr, n)` macro inside an oracle SQL string
    * into the portable floor formula, so the oracle runs the exact
    * arithmetic the Spark side does.
    */
  @annotation.tailrec
  def expandProundSql(sql: String): String = {
    val idx = sql.indexOf("pround(")
    if (idx < 0) sql
    else {
      val start = idx + "pround(".length
      var depth = 1; var i = start; var lastComma = -1
      while (depth > 0) {
        sql.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case ',' if depth == 1 => lastComma = i
          case _ =>
        }
        i += 1
      }
      val end = i - 1
      val e = sql.substring(start, lastComma).trim
      val n = sql.substring(lastComma + 1, end).trim.toInt
      expandProundSql(sql.substring(0, idx) + proundSql(e, n) + sql.substring(end + 1))
    }
  }

  /** Portable 32-bit hash: int(md5(x)[:8 hex]). */
  def portableHash(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long")

  /** DuckDB mirror of portableHash applied to SQL expression `e`. */
  def portableHashSql(e: String): String =
    s"CAST(('0x' || substr(md5($e), 1, 8)) AS BIGINT)"

  /** Second independent portable 32-bit hash: hex chars 9..16 of the
    * same md5 — together with [[portableHash]] this yields 64
    * engine-portable hash bits per value (used by the 64-bit SimHash
    * fingerprint) for the price of one md5.
    */
  def portableHashLo(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 9, 8), 16, 10).cast("long")

  /** DuckDB mirror of portableHashLo applied to SQL expression `e`. */
  def portableHashLoSql(e: String): String =
    s"CAST(('0x' || substr(md5($e), 9, 8)) AS BIGINT)"

  /** Tokens of a text column as array<string>, empties removed
    * (split on runs of non-letters — wc/wc.go:28 semantics).
    * Codegen'd single-pass walk; differential-tested against the
    * regex form `filter(split(c, "[^\\p{L}]+"), length > 0)`.
    */
  def tokens(c: Column): Column = TokenizeWords.tokenize_words(c)
}
