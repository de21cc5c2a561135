package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text column functions — pure `org.apache.spark.sql.functions`
  * compositions, so every one of them stays inside whole-stage codegen
  * (no UDFs anywhere on these hot paths).
  */
object TextFns {

  /** Version of [[tokens]]'s semantics, folded into the cache keys of
    * every on-disk artifact derived from tokenization (BM25 postings,
    * RRF rank lists). BUMP THIS whenever `tokens` changes behavior —
    * otherwise a stored index built under the old tokenizer is served
    * as if current. */
  val TokVersion = 1

  /** Reference-faithful tokenizer (api.py:470-489): punctuation→space,
    * lowercase, split on whitespace, drop empties — as the native
    * single-scan [[TokenizeWs]] expression (same semantics as the
    * regex-chain formulation; see its scaladoc for the equivalence). */
  def tokens(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(TokenizeWs(ColumnBridge.expression(c)))
  }

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Filename sanitization (main.py:79-81): keep [alnum -_], else '_';
    * trim, spaces→'_', truncate to 100 chars. */
  def sanitizeFilename(c: Column): Column =
    substring(
      translate(trim(regexp_replace(c, "[^A-Za-z0-9 \\-_]", "_")), " ", "_"),
      1, 100)

  /** ASCII sanitization (api.py:271-324): any codepoint ≥128 → '_'. */
  def asciiSanitize(c: Column): Column =
    regexp_replace(c, "[^\\x00-\\x7F]", "_")

  /** Content truncation for export (api.py:327): first 50 000 chars. */
  def truncateContent(c: Column): Column = substring(c, 1, 50000)

  /** Common-entity HTML unescape (api.py:314 uses html.unescape; the
    * named-entity long tail is out of scope — the five entities below
    * cover markdown-ish corpora; `&amp;` must be decoded last). */
  def htmlUnescape(c: Column): Column = {
    val step1 = regexp_replace(c, "&lt;", "<")
    val step2 = regexp_replace(step1, "&gt;", ">")
    val step3 = regexp_replace(step2, "&quot;", "\"")
    val step4 = regexp_replace(step3, "&#39;", "'")
    regexp_replace(step4, "&amp;", "&")
  }

  /** Token n-gram shingles: ["a b c", "b c d", ...]; empty if < n tokens. */
  def shingles(c: Column, n: Int): Column = shinglesFromTokens(tokens(c), n)

  /** Shingles from an already-materialized tokens column. Hot paths must
    * pass a projected column: the n-gram is assembled with `get()` element
    * reads (no per-shingle array slice allocation), and tokenization runs
    * once per row instead of once per expression occurrence. */
  def shinglesFromTokens(ts: Column, n: Int): Column =
    when(size(ts) >= n,
      transform(sequence(lit(0), size(ts) - n),
        i => concat_ws(" ", (0 until n).map(k => get(ts, i + k)): _*)))
      .otherwise(array().cast("array<string>"))
}
