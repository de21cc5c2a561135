package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) keys for multi-dimension file clustering — the
  * layout trick behind Delta/Iceberg's `OPTIMIZE ZORDER`: sort by the
  * bit-interleaving of several columns and CONTIGUOUS key ranges stay
  * small in EVERY interleaved dimension, so per-file parquet min/max
  * stats prune scans filtered on ANY of the layout columns — not just
  * the leading one, which is all a lexicographic sort can offer.
  *
  * Pure `functions._` arithmetic (shift/and/or folds — whole-stage
  * codegen'd, no UDF): the key build is a narrow per-row projection.
  */
object ZOrder {

  /** Interleave the low `bits` bits of each column (already bucketized
    * to `[0, 2^bits)` longs) into one z-key: result bit `i*n + j` =
    * bit `i` of `cols(j)`. `bits * cols.size` must fit a signed long. */
  def zkey(cols: Seq[Column], bits: Int = 16): Column = {
    val n = cols.size
    require(n >= 1 && bits * n <= 62, s"zkey: $n cols x $bits bits overflows a long")
    val terms = for { i <- 0 until bits; j <- 0 until n } yield
      shiftleft(shiftright(cols(j).cast("long"), i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Rank-bucket a numeric column to `[0, 2^bits)` against fixed
    * `[lo, hi]` bounds (computed ONCE per corpus by one min/max agg —
    * the SQ8-stats pattern — and shipped as literals, so bucketizing is
    * narrow). Values at/beyond the bounds clamp to the edge buckets;
    * a degenerate lo==hi column collapses to bucket 0 (and contributes
    * nothing to the interleave, harmlessly). */
  def bucketize(c: Column, lo: Double, hi: Double, bits: Int = 16): Column = {
    val buckets = 1L << bits
    if (hi <= lo) lit(0L)
    else least(lit(buckets - 1), greatest(lit(0L),
      floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(buckets.toDouble))
        .cast("long")))
  }
}
