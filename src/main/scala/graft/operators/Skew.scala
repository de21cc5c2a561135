package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.hash.Murmur3_x86_32

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

  /** Doc-length-aware repartitioning for long-document corpora.
    *
    * Per-row work (tokenize, shingle-explode, minhash) runs inside ONE
    * task per row, so wall-clock for a partition is the SUM of its rows'
    * costs: k co-located 10 MB "monster" documents serialize k× even
    * with idle cores. Hash repartitioning only spreads them in
    * expectation (7 monsters over 32 partitions collide with p ≈ 0.5);
    * `repartitionByRange` on length is actively wrong — it co-locates
    * the whole heavy tail in the top range. This spreads heavy rows
    * (weight ≥ `heavyThreshold`) round-robin over GUARANTEED-distinct
    * shuffle partitions: rank heavy rows by weight desc, then assign
    * rank r the precomputed probe key whose Murmur3 hash (the same
    * hash+seed `repartition(n, col)` partitions by) lands in partition
    * r mod `parts`. Light rows hash-distribute as usual. Output rows
    * are identical — only physical placement changes.
    *
    * The heavy set is ranked through a single partition (id+weight
    * columns only, never the payload) reached via repartition — a
    * SHUFFLE boundary, not coalesce(1), which would merge the upstream
    * scan+filter into that same single task and serialize the whole
    * corpus scan. With the boundary, the scan/filter stays
    * partition-parallel and only the tiny heavy subset funnels to one
    * task. `heavyThreshold` should keep that subset to the corpus's
    * monster tail — the default 1 M chars is ~200× the sf corpora's
    * mean doc. */
  def spreadByWeight(df: DataFrame, weightCol: String, idCol: String,
                     parts: Int, heavyThreshold: Long): DataFrame = {
    val probe = probeKeys(parts)
    val probeLit = array(probe.map(lit(_)): _*)
    // rank heavy rows without an unpartitioned WindowExec (see
    // Sampling.sampleN): the heavy subset is small by construction
    val ranked = df.filter(col(weightCol) >= heavyThreshold)
      .select(col(idCol), col(weightCol))
      .repartition(1).sortWithinPartitions(col(weightCol).desc, col(idCol))
      .select(col(idCol), monotonically_increasing_id().as("__r"))
    df.join(broadcast(ranked), Seq(idCol), "left")
      .withColumn("__pk",
        when(col("__r").isNotNull,
          element_at(probeLit, pmod(col("__r"), lit(parts)).cast("int") + 1))
          .otherwise(xxhash64(col(idCol))))
      .repartition(parts, col("__pk"))
      .drop("__r", "__pk")
  }

  /** Regime classifier for salted equi-joins, encoding the measured
    * three-regime study (SURVEY §6): salting only ever won when the
    * plan was sort-merge AND one key owned most of the large side —
    * regime (c). Under a broadcast plan there is no shuffle skew to fix
    * (regime a), and under modest SMJ skew the right-side ×salts
    * replication cost exceeds the win (regime b). So: salt ONLY when
    * the small side is over the broadcast threshold and the sampled
    * top-key share clears `hotShare`.
    *
    * Pure decision math — callers supply the sampled stats (e.g. one
    * Misra-Gries + count pass over the table they were going to scan
    * anyway) so the regimes are unit-testable without corpora. */
  def autoSaltDecision(topKeyShare: Double, smallSideRows: Long,
                       smallSideRowBytes: Long, broadcastThreshold: Long,
                       hotShare: Double, salts: Int): Option[Int] =
    if (broadcastThreshold >= 0 &&
        smallSideRows * smallSideRowBytes <= broadcastThreshold) None // (a)
    else if (topKeyShare < hotShare) None                             // (b)
    else Some(salts)                                                  // (c)

  /** Conf-gated doc-length-aware spread (the knob shared by every
    * shingle/span explode site: dedup_pipeline, dedup_clusters,
    * dedup_incremental, curation_chunk_dedup). Per-row explode work runs
    * in ONE task per row, so co-located monster documents serialize even
    * with idle cores; `spark.graft.dedup.lengthAware=true` spreads rows
    * whose `weightCol` ≥ `spark.graft.dedup.heavyChars` (default 1 M)
    * over guaranteed-distinct partitions via [[spreadByWeight]].
    * Placement-only: every caller's downstream is key-grouped or
    * explicitly ordered, so outputs are byte-identical either way
    * (asserted in the long-doc stress main). No-op when the frame lacks
    * `weightCol` (e.g. a pre-projected incoming frame without n_chars). */
  def maybeSpreadByConf(df: DataFrame, weightCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    if (!spark.conf.getOption("spark.graft.dedup.lengthAware").exists(_.toBoolean) ||
        !df.columns.contains(weightCol)) df
    else {
      val parts = spark.sessionState.conf.numShufflePartitions
      val thr = spark.conf.getOption("spark.graft.dedup.heavyChars")
        .map(_.toLong).getOrElse(1000000L)
      spreadByWeight(df, weightCol, idCol, parts, thr)
    }
  }

  /** For each target partition t < parts, a long whose Murmur3 hash
    * (seed 42, Spark's HashPartitioning) lands in t. Coupon-collector
    * search, ~parts·ln(parts) probes — microseconds for any sane count. */
  private[operators] def probeKeys(parts: Int): Array[Long] = {
    val keys = new Array[Long](parts)
    val found = new Array[Boolean](parts)
    var x = 0L
    var remaining = parts
    while (remaining > 0) {
      val t = ((Murmur3_x86_32.hashLong(x, 42) % parts) + parts) % parts
      if (!found(t)) { found(t) = true; keys(t) = x; remaining -= 1 }
      x += 1
    }
    keys
  }

  /** Hot-key count above which the anti-join side is no longer broadcast
    * (fall back to a semi-join on the kept keys). Hot keys are by nature
    * few — the cap exists for ultra-common outliers — so this is a
    * pathology guard, not a tuning knob. */
  private val MaxBroadcastHotKeys = 262144L

  /** When `logDropsAs` is set, the number of keys actually over the cap is
    * counted (one small job over the already-aggregated frequency table)
    * and logged — a df cap that silently drops candidates at larger
    * corpora is a recall loss nobody sees otherwise. The same count picks
    * the cheapest enforcement plan: ZERO hot keys (the common case at any
    * healthy df cap) means the input passes through with NO join at all —
    * previously every caller paid a full semi-join shuffle against the
    * kept-keys table to drop nothing; a FEW hot keys broadcast as an
    * anti-join (the big side never shuffles); only a pathological hot-key
    * count falls back to the kept-side semi-join.
    *
    * `distinctPairs = true` asserts (idCol, key) rows are already unique
    * (true for every shingle table built via array_distinct), turning the
    * df aggregate from countDistinct — per-key distinct buffers — into a
    * plain count. */
  def capByFrequency(exploded: DataFrame, key: String, idCol: String,
                     maxDf: Long, logDropsAs: Option[String] = None,
                     distinctPairs: Boolean = false): DataFrame = {
    val dfExpr = if (distinctPairs) count(lit(1)) else countDistinct(col(idCol))
    val freq = exploded.groupBy(col(key)).agg(dfExpr.as("__df"))
    logDropsAs match {
      case Some(tag) =>
        val hot = freq.filter(col("__df") > maxDf).select(col(key)).cache()
        val dropped = hot.count()
        if (dropped == 0) { hot.unpersist(); exploded }
        else {
          System.err.println(s"[graft] $tag: df cap $maxDf dropped $dropped hot key(s) " +
            "from candidate generation; pairs sharing ONLY those keys are not checked")
          if (dropped <= MaxBroadcastHotKeys)
            exploded.join(broadcast(hot), Seq(key), "left_anti")
          else
            exploded.join(freq.filter(col("__df") <= maxDf).select(col(key)),
              Seq(key), "left_semi")
        }
      case None =>
        exploded.join(freq.filter(col("__df") <= maxDf).select(col(key)),
          Seq(key), "left_semi")
    }
  }
}
