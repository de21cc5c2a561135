package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY §4).
  *
  * AQE's skew-join splitting handles most skew at runtime; these are the
  * explicit tools for the cases it can't see:
  *
  *  - `saltedEquiJoin` — pre-split a pathologically hot key by salting:
  *    the left (large, skewed) side gets a deterministic salt in
  *    [0, salts); the right side is replicated once per salt value. The
  *    join key becomes (key, salt), spreading each hot key over `salts`
  *    reducers. Result is row-identical to the plain join.
  *
  *  - `capByFrequency` — drop join keys whose document frequency exceeds
  *    a cap (stop-shingle filtering for set-similarity joins): a shingle
  *    appearing in k docs contributes k² candidate pairs, so a df cap
  *    bounds the worst-case fanout of `Dedup.ngramJaccard` at any scale
  *    (pairs sharing ONLY ultra-common shingles are, by construction,
  *    below any useful similarity threshold).
  */
object Skew {

  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String,
                     salts: Int): DataFrame = {
    // deterministic salt: spread rows by a hash of the whole row, not
    // rand() (reproducibility) — any stable per-row expression works
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(salts)).cast("int"))
    val saltedRight = right
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** When `logDropsAs` is set, the number of keys actually over the cap is
    * counted (one small job over the already-aggregated frequency table)
    * and logged — a df cap that silently drops candidates at larger
    * corpora is a recall loss nobody sees otherwise. */
  def capByFrequency(exploded: DataFrame, key: String, idCol: String,
                     maxDf: Long, logDropsAs: Option[String] = None): DataFrame = {
    val freq = exploded.groupBy(col(key))
      .agg(countDistinct(col(idCol)).as("__df"))
    val kept = logDropsAs match {
      case Some(tag) =>
        val f = freq.cache()
        val dropped = f.filter(col("__df") > maxDf).count()
        if (dropped > 0)
          System.err.println(s"[graft] $tag: df cap $maxDf dropped $dropped hot key(s) " +
            "from candidate generation; pairs sharing ONLY those keys are not checked")
        f.filter(col("__df") <= maxDf).select(col(key))
      case None =>
        freq.filter(col("__df") <= maxDf).select(col(key))
    }
    exploded.join(kept, Seq(key), "left_semi")
  }
}
