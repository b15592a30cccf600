package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar string / regex functions — SURVEY.md §2 D1–D7.
  *
  * The reference's regex-based scalar parsing of money strings, citations
  * and ranges (challenge2.py:94-162). Everything here is a pure `Column =>
  * Column` built from codegen'd built-ins — no UDFs, so the expressions
  * stay inside whole-stage codegen and push through Catalyst untouched.
  */
object TextParse {

  /** D1 — case-insensitive regex contains (pandas str.contains(...,
    * IGNORECASE), challenge2.py:100-101). */
  def containsI(c: Column, pattern: String): Column = c.rlike("(?i)" + pattern)

  /** D2 — strip `[n]`-style citation markers (challenge2.py:168,175). */
  def stripCitations(c: Column): Column = regexp_replace(c, """\[\d+\]\s*""", "")

  /** D2 — collapse `$x–$y` money ranges to the upper bound's `$`
    * (challenge2.py:111: `r'\$.*[-—–](?![a-z])'` → `'$'`). Java regex
    * supports the negative lookahead as-is (SURVEY.md §2 J4). */
  def collapseMoneyRange(c: Column): Column =
    regexp_replace(c, """\$.*[-—–](?![a-z])""", "\\$")

  /** D3 — single-group regex extract with str.extract semantics
    * (NaN on no-match → NULL, SURVEY.md §2 J5). */
  def extract(c: Column, pattern: String, group: Int = 1): Column =
    nullif(regexp_extract(c, pattern, group), lit(""))

  /** D5 — list→string join for str-or-list union cells
    * (`' '.join(x) if type(x) == list else x`, challenge2.py:91).
    * After ingest normalization the cell is ArrayType, so this is a plain
    * concat_ws. */
  def joinTokens(c: Column, sep: String = " "): Column = concat_ws(sep, c)

  // ---- D6: parse_dollars (challenge2.py:114-157) ----------------------

  private val MillionPat = """(?i)\$\s*(\d+(?:\.\d+)?)\s*milli?on"""
  private val BillionPat = """(?i)\$\s*(\d+(?:\.\d+)?)\s*billion"""
  private val SepPat     = """\$\s*(\d{1,3}(?:[,.]\d{3})+)(?![,.\d])"""
  private val PlainPat   = """\$\s*(\d+(?:\.\d+)?)"""

  /** D6 — `parse_dollars`: "$123.4 million" → 1.234e8, "$1.2 billion" →
    * 1.2e9, "$123,456,789" → 1.23456789e8; tolerates the "millon" typo and
    * both comma and period thousands separators; anything else → NULL
    * (challenge2.py:114-157). Million/billion forms are tried FIRST so the
    * reference's `(?!\s[mb]illion)` lookahead is unnecessary — this keeps
    * the logic portable to RE2-based engines. Pure `when` chain →
    * whole-stage codegen. */
  def parseDollars(raw: Column): Column = {
    val c = collapseMoneyRange(stripCitations(raw))
    when(c.rlike(MillionPat), regexp_extract(c, MillionPat, 1).cast("double") * 1e6)
      .when(c.rlike(BillionPat), regexp_extract(c, BillionPat, 1).cast("double") * 1e9)
      .when(c.rlike(SepPat),
        regexp_replace(regexp_extract(c, SepPat, 1), """[,.]""", "").cast("double"))
      .when(c.rlike(PlainPat), regexp_extract(c, PlainPat, 1).cast("double"))
      .otherwise(lit(null).cast("double"))
  }

  /** D4+E6 — running-time parse: "1 h 30 m" / "100 minutes" variants →
    * minutes (challenge2.py:193-198). Three capture groups, one
    * regexp_extract per group (Spark has no multi-column extract), then the
    * `h*60+m if no pure minutes` conditional as a when expression. */
  def parseRuntimeMinutes(raw: Column): Column = {
    val pat = """(\d+)\s*ho?u?r?s?\s*(\d*)|(\d+)\s*m"""
    val h  = regexp_extract(raw, pat, 1).cast("double")
    val m  = regexp_extract(raw, pat, 2).cast("double")
    val mm = regexp_extract(raw, pat, 3).cast("double")
    val hZ  = coalesce(h, lit(0.0))
    val mZ  = coalesce(m, lit(0.0))
    val mmZ = coalesce(mm, lit(0.0))
    when(mmZ === 0.0, hZ * 60 + mZ).otherwise(mmZ)
  }
}
