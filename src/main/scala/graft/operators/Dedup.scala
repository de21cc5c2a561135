package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextFns

/** Deduplication suite (SURVEY §2c) over the `documents` table.
  *
  * Scale design: every variant turns all-pairs comparison into an
  * equi-join on a bounded key (shared shingle, LSH band bucket, simhash
  * block) — the only quadratic step is within-bucket, and bucket sizes
  * are bounded by construction (stop-shingle df cap / band width).
  *
  * Corpora with heavy EXACT duplication: the pairwise operators
  * (`ngramJaccard`/`minhashLsh`/`simhash`) report pairs, and a cluster
  * of k identical docs genuinely has k²/2 qualifying pairs — no
  * algorithm makes a quadratic ANSWER subquadratic. Production dedup
  * uses [[dedupPipeline]] instead, whose per-doc survivor output stays
  * linear and whose near-dup stage runs on exact-representatives only
  * (duplication-independent; 1 M docs at 200× duplication in ~18 s).
  */
object Dedup {

  // ---- shared building blocks ----------------------------------------

  /** (doc_id, s): distinct 3-gram token shingles per document.
    * Tokens are projected first so the generator tokenizes each row once. */
  def shingleSets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), TextFns.tokens(col("text")).as("__ts"))
      .select(col("doc_id"),
        explode(array_distinct(TextFns.shinglesFromTokens(col("__ts"), 3))).as("s"))

  private val tokensSql =
    "list_filter(regexp_split_to_array(lower(regexp_replace(text, '[^\\w\\s]', ' ', 'g')), '\\s+'), x -> x <> '')"

  private def shinglesSqlCteOver(docs: String): String = s"""
    toks AS (SELECT doc_id, $tokensSql AS t FROM $docs),
    sh AS (SELECT DISTINCT doc_id, s FROM (
      SELECT doc_id, unnest(list_transform(range(len(t)-2),
        i -> array_to_string(t[i+1:i+3], ' '))) AS s
      FROM toks WHERE len(t) >= 3)),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)"""

  private val shinglesSqlCte = shinglesSqlCteOver("documents")

  /** Exact Jaccard over candidate pair list (da < db assumed). The
    * candidate list is tiny relative to the shingle table — broadcast it
    * so verification never shuffles the shingles. */
  private def verifyJaccard(cand: DataFrame, sh: DataFrame): DataFrame = {
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = broadcast(cand)
      .join(sh.select(col("doc_id").as("da"), col("s")), Seq("da"))
      .join(sh.select(col("doc_id").as("db"), col("s")), Seq("db", "s"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter"))
    inter
      .join(sz.select(col("doc_id").as("da"), col("n").as("na")), Seq("da"))
      .join(sz.select(col("doc_id").as("db"), col("n").as("nb")), Seq("db"))
      .select(col("da"), col("db"),
        round(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double"), 6).as("jaccard"))
  }

  // ---- 1. exact dedup --------------------------------------------------
  // Group on a hash of the normalized text (main.py has no dedup; this is
  // the LLM-pipeline baseline): one shuffle on the fingerprint, min-id
  // survivor per group. At 100 TB the fingerprint groupBy is the only
  // shuffle and partial aggregation kicks in map-side.
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        md5(concat_ws(" ", TextFns.tokens(col("text")))).as("content_fp"))
      .groupBy(col("content_fp"))
      .agg(min(col("doc_id")).as("survivor_id"), count(lit(1)).as("n_copies"))
      .select(col("survivor_id"), col("n_copies"), col("content_fp"))
      .orderBy(col("survivor_id"))

  val exactOracle: String = s"""
    SELECT min(doc_id) AS survivor_id, count(*) AS n_copies, content_fp
    FROM (SELECT doc_id,
            md5(array_to_string($tokensSql, ' ')) AS content_fp
          FROM documents)
    GROUP BY content_fp
    ORDER BY survivor_id"""

  // ---- 2. n-gram Jaccard set-similarity join ---------------------------
  // Candidate generation: self-join on shared shingle (the classic
  // set-similarity join). Hot-shingle fanout is the scale risk: the
  // GATED entry runs with the default stop-shingle df cap since round 8
  // (the ScaleHotCatalog stress measured the uncapped self-join
  // quadratic in hot-shingle df — 31.5 s at df 10 000, unbounded at
  // df 1 M — so the uncapped form must not be what ships as the
  // operator's default shape); the oracle mirrors the cap with a `keep`
  // CTE and tools.CapGate proves the boundary flips identically
  // cross-engine. Zero hot keys (every gated SF) short-circuits to a
  // no-join passthrough, so capped == uncapped there by construction.
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame =
    // pre-partitioned on the shingle (the dedup_clusters trick): the
    // df-cap frequency aggregate AND both self-join sides key on `s`,
    // so one exchange at cache materialization serves all three — the
    // cap's extra pass then reads the cache in place instead of
    // re-shuffling it
    ngramJaccardImpl(shingleSets(Tables.documents(spark, dir))
        .repartition(col("s")).cache(),
      maxDf = Some(DefaultMaxShingleDf), logDropsAs = Some("dedup_ngram_jaccard"))

  /** Exact (uncapped) form — the correctness reference for specs; NOT
    * the production default (quadratic in hot-shingle df). */
  def ngramJaccardUncapped(spark: SparkSession, dir: String): DataFrame =
    ngramJaccardImpl(shingleSets(Tables.documents(spark, dir)).cache(), maxDf = None)

  /** Scale path: cap candidate-generation fanout with a stop-shingle
    * filter (Skew.capByFrequency) — a shingle in k docs yields k²
    * candidates, so maxDf bounds the join. Sizes (`sz`) are still
    * computed on the UNCAPPED sets, so Jaccard values of surviving
    * pairs are exact; only pairs whose every shared shingle is
    * ultra-common (necessarily low-similarity) can be missed. */
  def ngramJaccardCapped(spark: SparkSession, dir: String, maxDf: Long): DataFrame =
    ngramJaccardImpl(shingleSets(Tables.documents(spark, dir)).cache(), Some(maxDf))

  /** `ordered = false` skips the trailing global sort — consumers that
    * feed the pair list into a join or connected components (where row
    * order is meaningless) shouldn't pay a range exchange for it. */
  /** Profiling hook (tools/ProfClusters): the dedup_clusters edge plan
    * from an already-built rep-shingle frame. */
  private[graft] def profEdgesFrom(repSh: DataFrame): DataFrame =
    ngramJaccardImpl(repSh, maxDf = Some(DefaultMaxShingleDf),
      logDropsAs = Some("prof_clusters"), ordered = false)
      .select(col("da").as("src"), col("db").as("dst"))

  private def ngramJaccardImpl(sh: DataFrame, maxDf: Option[Long],
                               logDropsAs: Option[String] = None,
                               ordered: Boolean = true): DataFrame = {
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val joinable = maxDf.fold(sh)(m =>
      Skew.capByFrequency(sh, "s", "doc_id", m, logDropsAs, distinctPairs = true))
    // one self-join pass: the groupBy *is* the intersection count — no
    // distinct-then-reverify round trip over the shingle table
    val inter = joinable.select(col("doc_id").as("da"), col("s"))
      .join(joinable.select(col("doc_id").as("db"), col("s")), Seq("s"))
      .filter(col("da") < col("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter"))
    val pairs = inter
      .join(sz.select(col("doc_id").as("da"), col("n").as("na")), Seq("da"))
      .join(sz.select(col("doc_id").as("db"), col("n").as("nb")), Seq("db"))
      .select(col("da"), col("db"),
        round(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double"), 6).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
    if (ordered) pairs.orderBy(col("da"), col("db")) else pairs
  }

  /** [[ngramJaccard]]'s oracle at a given df cap: `keep` mirrors
    * Skew.capByFrequency — the intersection counts only shingles in
    * ≤ maxDf docs (sh rows are (doc_id, s)-distinct, so count(*) per s
    * IS the df), while sizes stay uncapped so surviving pairs' Jaccard
    * is exact. `None` = the exact/uncapped form. */
  private[graft] def ngramJaccardOracleFor(maxDf: Option[Long]): String = {
    val keepCte = maxDf.fold("")(m =>
      s"\n    keep AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= $m),")
    val keepJoin = if (maxDf.isDefined) "\n      JOIN keep k ON a.s = k.s" else ""
    s"""
    WITH $shinglesSqlCte,$keepCte
    pairs AS (
      SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id$keepJoin
      GROUP BY 1, 2)
    SELECT da, db,
      round(CAST(inter AS DOUBLE) / CAST(x.n + y.n - inter AS DOUBLE), 6) AS jaccard
    FROM pairs JOIN sz x ON da = x.doc_id JOIN sz y ON db = y.doc_id
    WHERE CAST(inter AS DOUBLE) / CAST(x.n + y.n - inter AS DOUBLE) >= 0.5
    ORDER BY da, db"""
  }

  /** Uncapped oracle — stays the gate for `dedup_minhash_lsh` (LSH is
    * uncapped; its recall is proven against the exact pair set). */
  val ngramJaccardOracle: String = ngramJaccardOracleFor(None)

  // ---- 3. MinHash + banded LSH ----------------------------------------
  // k=32 permutations h_i(x) = (a_i·x + b_i) mod p over xxhash64 shingle
  // hashes, 8 bands × 4 rows. Replaces the quadratic shingle join with an
  // equi-join on (band, band_hash): O(docs × 8) rows shuffled. Candidates
  // are exact-verified with true Jaccard — LSH only affects recall, never
  // precision. Deterministic (fixed permutation constants), but not
  // SQL-expressible → rows-only gate + spec asserting recall vs `ngramJaccard`.
  //
  // Round 3, measured-not-guessed: a native zero-shuffle signature
  // expression ([[graft.functions.MinHashSignature]]/[[MinHashBands]],
  // property-spec'd bit-identical) EXISTS for signature-only pipelines
  // (streaming, signature export) — but in these operators the shingle
  // table must be materialized anyway for the exact-verify join, and
  // signatures via a map-side-combined groupBy over that SAME cache
  // measure ~1.7× faster locally than re-tokenizing for the per-row
  // expression (4.0 s vs 2.5 s minhash_lsh at sf0.1; see PLANS.md).
  // So the LSH operators keep the cache-reusing formulation.
  private val P = graft.functions.MinHashSignature.P
  private def permA = graft.functions.MinHashSignature.permA
  private def permB = graft.functions.MinHashSignature.permB

  /** (doc_id, sig[32]): one-pass native signature for every doc with at
    * least one shingle (shingle-less docs had no row in the groupBy
    * formulation either). Zero shuffle — the right path when the
    * shingle table is NOT otherwise materialized. Duplicate shingles
    * can't change a minimum, so the array needs no distinct. */
  def minhashSignatures(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        TextFns.shinglesFromTokens(TextFns.tokens(col("text")), 3).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .select(col("doc_id"),
        graft.functions.MinHashSignature.of(col("__sh")).as("sig"))

  /** Signature columns m0..m31 from an (already cached) shingle table —
    * one map-side-combined groupBy; the differential reference for the
    * native expression AND the production path when `sh` is cached. */
  private[graft] def minhashSignaturesComposable(sh: DataFrame): DataFrame = {
    val hashed = sh.withColumn("x", pmod(xxhash64(col("s")), lit(P)))
    val mins = (0 until 32).map(i =>
      min(pmod(col("x") * permA(i) + permB(i), lit(P))).as(s"m$i"))
    hashed.groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
  }

  /** (doc_id, band, bh) from signature columns. */
  private def bandsOfSig(sig: DataFrame): DataFrame =
    sig.select(col("doc_id"),
      explode(array((0 until 8).map { b =>
        struct(lit(b).as("band"),
          xxhash64(concat_ws(",", (0 until 4).map(r => col(s"m${b * 4 + r}")): _*)).as("bh"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bh"))

  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // the shingle table feeds signature building AND both sides of the
    // exact-verify join — cache it once
    val sh = shingleSets(docs).cache()
    val bands = bandsOfSig(minhashSignaturesComposable(sh))
    val cand = bands.select(col("doc_id").as("da"), col("band"), col("bh"))
      .join(bands.select(col("doc_id").as("db"), col("band"), col("bh")), Seq("band", "bh"))
      .filter(col("da") < col("db"))
      .select(col("da"), col("db")).distinct()
    verifyJaccard(cand, sh)
      .filter(col("jaccard") >= 0.5)
      .orderBy(col("da"), col("db"))
  }

  // ---- 4. SimHash + pigeonhole blocks ---------------------------------
  // 60-bit simhash over md5-derived token hashes; Hamming ≤ 3 near-dups
  // found by the 4-block pigeonhole trick (distance ≤3 ⇒ at least one of
  // 4 16-bit blocks equal) — an equi-join on (block_idx, block_value).
  // Token hash = first 15 hex chars of md5 (60 bits, always positive):
  // md5 is identical in Spark and DuckDB, so the ENTIRE operator is
  // SQL-expressible and hash-gated against the oracle — xxhash64 (the
  // usual choice) has no DuckDB twin and would force a rows-only gate.
  def simhashes(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(TextFns.tokens(col("text"))).as("t"))
      .withColumn("h", conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long"))
    val bitSums = (0 until 60).map(i =>
      sum(shiftright(col("h"), i).bitwiseAND(1) * 2 - 1).as(s"b$i"))
    val agg = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val simhash = (0 until 60).map(i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    agg.select(col("doc_id"), simhash.as("simhash"))
  }

  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val sh = simhashes(Tables.documents(spark, dir)).cache() // both join sides
    val blocks = sh.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(k =>
        struct(lit(k).as("k"),
          shiftrightunsigned(col("simhash"), k * 16).bitwiseAND(0xFFFFL).as("bv"))): _*)).as("blk"))
      .select(col("doc_id"), col("simhash"), col("blk.k"), col("blk.bv"))
    val cand = blocks
      .select(col("doc_id").as("da"), col("simhash").as("sa"), col("k"), col("bv"))
      .join(blocks.select(col("doc_id").as("db"), col("simhash").as("sb"), col("k"), col("bv")),
        Seq("k", "bv"))
      .filter(col("da") < col("db"))
      .select(col("da"), col("db"), col("sa"), col("sb")).distinct()
    cand
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))))
      .filter(col("hamming") <= 3)
      .select(col("da"), col("db"), col("hamming"))
      .orderBy(col("da"), col("db"))
  }

  // ---- 5. composed dedup pipeline -------------------------------------
  // The production shape: exact-dedup FIRST (collapses duplicate
  // clusters to one representative — on real corpora exact dups are the
  // bulk), then MinHash-LSH near-dup only over representatives. Without
  // the exact stage, a cluster of k identical docs puts k docs in every
  // band bucket → O(k²) candidate pairs per cluster; with it, near-dup
  // work is independent of duplication factor. Returns one row per
  // input doc: its surviving representative and why it was dropped.
  /** Conf-gated doc-length-aware spread for long-doc corpora
    * (`spark.graft.dedup.lengthAware=true`; heavy threshold
    * `spark.graft.dedup.heavyChars`, default 1 M chars). Applied ONLY to
    * the rep table feeding the shingle explode — that is where per-row
    * work concentrates (shingle + minhash of a 10 MB doc is seconds of
    * ONE task), and the semi-join producing reps leaves monsters
    * co-located both by doc_id-hash birthday odds and by AQE's
    * small-partition coalescing. A head-of-scan spread was measured and
    * rejected: the tokenize/fingerprint pass is ~1 s for the whole
    * corpus (see dedup_exact in the stress run), so shuffling the full
    * text column twice cost more than it saved. Output is
    * placement-only: gated results stay byte-identical (every
    * downstream op is key-grouped or explicitly ordered). */
  private def maybeSpread(spark: SparkSession, docs: DataFrame): DataFrame =
    Skew.maybeSpreadByConf(docs, "n_chars", "doc_id")

  def dedupPipeline(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val fp = docs.select(col("doc_id"),
      md5(concat_ws(" ", TextFns.tokens(col("text")))).as("content_fp"))
      .cache() // feeds grouping, rep mapping, AND the final status join
    val exactGroups = fp.groupBy(col("content_fp"))
      .agg(min(col("doc_id")).as("exact_rep"))
    val withRep = fp.join(exactGroups, Seq("content_fp")).cache()
    val reps = docs.join(
      withRep.filter(col("doc_id") === col("exact_rep")).select(col("doc_id")),
      Seq("doc_id"), "left_semi")

    // near-dup among representatives only
    val sh = shingleSets(maybeSpread(spark, reps)).cache()
    val bands = bandsOfSig(minhashSignaturesComposable(sh))
    val cand = bands.select(col("doc_id").as("da"), col("band"), col("bh"))
      .join(bands.select(col("doc_id").as("db"), col("band"), col("bh")), Seq("band", "bh"))
      .filter(col("da") < col("db"))
      .select(col("da"), col("db")).distinct()
    val nearPairs = verifyJaccard(cand, sh).filter(col("jaccard") >= 0.5)
    // near-dup clusters: full transitive closure over the rep graph
    val comp = Graph.connectedComponents(
      reps.select(col("doc_id").as("id")),
      nearPairs.select(col("da").as("src"), col("db").as("dst")))
      .select(col("id").as("exact_rep"), col("component").as("survivor"))

    withRep
      .join(comp, Seq("exact_rep"))
      .select(col("doc_id"),
        col("survivor").as("survivor_id"),
        when(col("doc_id") === col("survivor"), "kept")
          .when(col("survivor") =!= col("exact_rep"), "near_dup")
          .when(col("doc_id") =!= col("exact_rep"), "exact_dup")
          .otherwise("kept").as("status"))
      .orderBy(col("doc_id"))
  }

  // ---- 6. transitive dedup clusters (connected components) ------------
  // Near-dup similarity is not transitive, but dedup clusters are: the
  // component of the pair graph. Distributed CC by iterative min-label
  // propagation — each round is one join + aggregate, labels
  // localCheckpoint'ed to cut lineage; rounds ≤ component diameter
  // (near-dup components are near-cliques, so 1-2 rounds in practice).
  // Scale-safe construction (round 2): exact-duplicates are collapsed to
  // their min-id representative FIRST (identical shingle sets ⇒ jaccard 1 ⇒
  // same cluster, so components over reps + rep-mapping reproduce the full
  // answer exactly, independent of duplication factor), and the rep-level
  // set-similarity join is df-capped — far above any shingle df in tested
  // data (max 25 at sf0.1), so output is unchanged there, while one
  // ultra-common shingle at 100 TB can no longer create k² candidates.
  // The cap is a session knob (`spark.graft.dedup.maxShingleDf`) and any actual
  // drop is logged, so recall loss at larger corpora is visible, not silent.
  //
  // Exact collapse only applies to docs that HAVE shingles (≥3 tokens):
  // a shingle-less duplicate pair produces no jaccard edge, so the pair
  // graph keeps each copy as its own singleton cluster — collapsing them
  // by fingerprint would merge what the graph never connects. Docs below
  // the shingle threshold get a per-doc fingerprint and stay their own rep.
  val DefaultMaxShingleDf = 256L

  def dedupClusters(spark: SparkSession, dir: String): DataFrame =
    dedupClustersOf(spark, dir, ordered = true)

  /** `ordered = false` skips the trailing corpus-sized range sort —
    * composing consumers (the leakage-safe split's join) destroy row
    * order immediately, so they shouldn't pay the exchange for it
    * (the ngramJaccardImpl precedent). */
  /** The effective shingle-df cap: canonical knob namespace is
    * spark.graft.*; the round-2 name graft.dedup.maxShingleDf stays
    * honored for compatibility. ONE definition — cache keys derived
    * from this value (splitLeakSafeComposed) must always agree with
    * what the cluster computation actually used. */
  private[graft] def effectiveMaxShingleDf(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.dedup.maxShingleDf")
      .orElse(spark.conf.getOption("graft.dedup.maxShingleDf"))
      .map(_.toLong).getOrElse(DefaultMaxShingleDf)

  private[graft] def dedupClustersOf(spark: SparkSession, dir: String,
                                     ordered: Boolean): DataFrame =
    dedupClustersOfDocs(spark, Tables.documents(spark, dir), ordered)

  /** The cluster computation over ANY (doc_id, text, n_chars) frame —
    * the seam the incremental-release spec rebuilds unions through
    * (round 15). */
  private[graft] def dedupClustersOfDocs(spark: SparkSession, docs: DataFrame,
                                         ordered: Boolean): DataFrame = {
    val maxDf = effectiveMaxShingleDf(spark)
    // tokenize ONCE: the cached token projection feeds both the
    // fingerprint pass and the rep shingle explode — previously the docs
    // parquet was scanned AND tokenized twice (fp pass + reps semi-join),
    // ~25% of the operator's wall at sf0.1. The doc-length spread is
    // applied before tokenizing so the cache's partitioning already
    // spreads monster docs away from each other for the explode stage.
    val toks = maybeSpread(spark, docs)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("__ts"))
      .cache() // feeds fp + rep shingles (harness clears)
    val fp = toks
      .select(col("doc_id"),
        when(size(col("__ts")) >= 3, md5(concat_ws(" ", col("__ts"))))
          .otherwise(concat(lit("noshingle:"), col("doc_id").cast("string")))
          .as("content_fp"))
    // rep assignment as ONE window min over the fingerprint — the
    // groupBy + join-back formulation shuffled fp twice and needed fp
    // cached for its two consumers; the window shuffles once and fp has
    // a single consumer. Group state is bounded by the duplication
    // factor of one fingerprint, the same bound the groupBy had.
    val withRep = fp
      .select(col("doc_id"),
        min(col("doc_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("content_fp")))
          .as("rep"))
      .cache() // feeds the rep filter and the final cluster mapping
    val repIds = withRep.filter(col("doc_id") === col("rep")).select(col("doc_id"))
    // the cache is PRE-PARTITIONED on the shingle: the set-similarity
    // self-join (both sides) and the df-cap frequency aggregate all key
    // on `s`, so one exchange at materialization replaces three
    // downstream ones — the cached partitioning satisfies them in place
    val repSh = toks
      .join(repIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        explode(array_distinct(TextFns.shinglesFromTokens(col("__ts"), 3))).as("s"))
      .repartition(col("s"))
    val edges = ngramJaccardImpl(repSh.cache(), maxDf = Some(maxDf),
      logDropsAs = Some("dedup_clusters"), ordered = false)
      .select(col("da").as("src"), col("db").as("dst"))
    val comp = Graph.connectedComponents(
      repIds.select(col("doc_id").as("id")), edges)
    val out = withRep
      .join(comp.select(col("id").as("rep"), col("component")), Seq("rep"))
      .select(col("doc_id"), col("component").as("cluster_id"))
    if (ordered) out.orderBy(col("doc_id")) else out
  }

  /** The recursive-CTE cluster computation, shared by the clusters
    * oracle and the leakage-safe split oracle (Curation): produces CTE
    * `clu(doc_id, cluster_id)` (plus `toks` over `docs`). Callers
    * prepend WITH RECURSIVE. The `docs` parameter lets the release-
    * manifest-v2 oracle run the identical chain over a seeded corpus
    * CTE (round 15). */
  private[operators] def clustersCteSqlOver(docs: String): String = s"""
    ${shinglesSqlCteOver(docs)},
    pairs AS (
      SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    near AS (
      SELECT da, db FROM pairs JOIN sz x ON da = x.doc_id JOIN sz y ON db = y.doc_id
      WHERE CAST(inter AS DOUBLE) / CAST(x.n + y.n - inter AS DOUBLE) >= 0.5),
    edges AS (SELECT da AS a, db AS b FROM near UNION ALL SELECT db, da FROM near),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
    minreach AS (SELECT a, min(b) AS mb FROM reach GROUP BY a),
    clu AS (
      SELECT d.doc_id, least(d.doc_id, coalesce(m.mb, d.doc_id)) AS cluster_id
      FROM $docs d LEFT JOIN minreach m ON m.a = d.doc_id)"""

  private[operators] val clustersCteSql: String = clustersCteSqlOver("documents")

  val dedupClustersOracle: String = s"""
    WITH RECURSIVE
    $clustersCteSql
    SELECT doc_id, cluster_id FROM clu
    ORDER BY doc_id"""

  /** The mtime+knob-keyed materialized cluster table (one build per
    * corpus version per df cap) — ONE definition for every cluster
    * consumer (splitLeakSafeComposed, dedup_survivorship) so the cache
    * key and the computation can never disagree. `dedup_clusters`
    * itself stays the inline build: it IS the operator under test; the
    * consumers are compositions and should not re-pay it. */
  def clustersCached(spark: SparkSession, dir: String): DataFrame = {
    val docsPath = s"$dir/documents.parquet"
    val maxDf = effectiveMaxShingleDf(spark)
    val key = s"${dir.replaceAll("[^A-Za-z0-9.]", "_")}_${Layout.stateTag(spark, docsPath)}_df$maxDf"
    // generation protocol (round 18): each build lands in its own fresh
    // gen-dir and commits via the _CURRENT pointer — object-store-exact
    // (a lost lease race costs a duplicate build, never a torn store)
    val path = Layout.generation(spark,
      s"${Layout.cacheRoot(spark)}/clusters_cache/$key") { g =>
      dedupClustersOf(spark, dir, ordered = false).write.parquet(g)
    }
    spark.read.parquet(path)
  }

  // ---- survivorship policy (round 11) ---------------------------------
  // dedup_clusters names each cluster by its min doc_id — an ARBITRARY
  // survivor. Production dedup keeps the BEST member (RefinedWeb/Lee
  // et al. practice: the longest or highest-quality duplicate is
  // usually the most complete version; min-id keeps whichever crawled
  // first). Survivorship = one rank-1 window over the cluster frame —
  // the policy costs one K-bounded-per-cluster window on top of the
  // clusters, nothing corpus-shaped.

  /** Pick one survivor per cluster from a (doc_id, cluster_id) frame
    * joined with per-doc metadata: rank by the given policy columns
    * (first = most important, descending), ties → lowest doc_id.
    * Returns the input plus `keep` (true for the cluster's survivor). */
  def survivorshipOf(clusters: DataFrame, meta: DataFrame,
                     policyCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(policyCols.map(col(_).desc) :+ col("doc_id").asc: _*)
    clusters.join(meta, Seq("doc_id"))
      .withColumn("keep", row_number().over(w) === 1)
  }

  /** Gated entry: longest-document survivorship over the organic
    * clusters (policy = n_chars desc, doc_id tie-break), served from
    * the [[clustersCached]] materialization — the policy window is the
    * only per-run cost, the cluster build is once per corpus version
    * (first measured inline: 15.6 s at sf1, all but ~1 s of it
    * re-running dedup_clusters). */
  def survivorship(spark: SparkSession, dir: String): DataFrame =
    survivorshipOf(
      clustersCached(spark, dir),
      Tables.documents(spark, dir).select(col("doc_id"), col("n_chars")),
      Seq("n_chars"))
      .select(col("doc_id"), col("cluster_id"), col("n_chars"), col("keep"))
      .orderBy(col("doc_id"))

  /** The survivorship rank CTEs (`jn`, `r`) over a `clu(doc_id,
    * cluster_id)` CTE — the 19h policy (n_chars desc, doc_id
    * tie-break), shared VERBATIM by [[survivorshipOracle]] and the
    * composed [[dedupPipelineSurvivorshipOracle]] so the two gates can
    * never encode different policies. */
  private[operators] val survivorshipRankCtesSql: String = s"""
    jn AS (
      SELECT c.doc_id, c.cluster_id, d.n_chars
      FROM clu c JOIN documents d ON d.doc_id = c.doc_id),
    r AS (
      SELECT doc_id, cluster_id, n_chars,
        row_number() OVER (PARTITION BY cluster_id
          ORDER BY n_chars DESC, doc_id) AS rn
      FROM jn)"""

  /** Exact twin of [[survivorship]] over the shared cluster CTEs. */
  val survivorshipOracle: String = s"""
    WITH RECURSIVE
    $clustersCteSql,
    $survivorshipRankCtesSql
    SELECT doc_id, cluster_id, n_chars, (rn = 1) AS keep FROM r
    ORDER BY doc_id"""

  // ---- pipeline × survivorship (round 12) ------------------------------
  // VERDICT r11 #6: dedup_pipeline kept min-id; the production manifest
  // should keep the POLICY survivor. This entry is the composition —
  // the organic clusters (same transitive semantics as dedup_pipeline's
  // rep components expanded through exact groups, served from the
  // mtime-keyed cluster cache) with the 19h longest-document policy
  // choosing each cluster's survivor, and the pipeline's auditable
  // per-doc status RELATIVE TO THAT SURVIVOR: `kept` for the survivor,
  // `exact_dup` when the doc's content fingerprint equals the
  // survivor's (a byte-identical copy of what survived), `near_dup`
  // otherwise. Cost on top of the cached clusters: one rank-1 window
  // (K-bounded per cluster), one fingerprint scan joined twice (doc
  // side + survivor side) — nothing corpus-quadratic.
  def dedupPipelineSurvivorship(spark: SparkSession, dir: String): DataFrame = {
    val surv = survivorshipOf(
      clustersCached(spark, dir),
      Tables.documents(spark, dir).select(col("doc_id"), col("n_chars")),
      Seq("n_chars")).cache()
    val winners = surv.filter(col("keep"))
      .select(col("cluster_id"), col("doc_id").as("survivor_id"))
    val fp = Tables.documents(spark, dir).select(col("doc_id"),
      md5(concat_ws(" ", TextFns.tokens(col("text")))).as("content_fp"))
      .cache() // joined on both the doc and the survivor side
    surv.select(col("doc_id"), col("cluster_id"))
      .join(winners, Seq("cluster_id"))
      .join(fp, Seq("doc_id"))
      .join(fp.select(col("doc_id").as("survivor_id"),
        col("content_fp").as("surv_fp")), Seq("survivor_id"))
      .select(col("doc_id"), col("survivor_id"),
        when(col("doc_id") === col("survivor_id"), "kept")
          .when(col("content_fp") === col("surv_fp"), "exact_dup")
          .otherwise("near_dup").as("status"))
      .orderBy(col("doc_id"))
  }

  /** Exact twin of [[dedupPipelineSurvivorship]]: the shared cluster
    * CTEs + the shared 19h rank CTEs + the status CASE. */
  val dedupPipelineSurvivorshipOracle: String = s"""
    WITH RECURSIVE
    $clustersCteSql,
    $survivorshipRankCtesSql,
    win AS (SELECT cluster_id, doc_id AS survivor_id FROM r WHERE rn = 1),
    fps AS (SELECT doc_id, md5(array_to_string($tokensSql, ' ')) AS content_fp
            FROM documents)
    SELECT c.doc_id, w.survivor_id,
      CASE WHEN c.doc_id = w.survivor_id THEN 'kept'
           WHEN f1.content_fp = f2.content_fp THEN 'exact_dup'
           ELSE 'near_dup' END AS status
    FROM clu c
    JOIN win w USING (cluster_id)
    JOIN fps f1 ON f1.doc_id = c.doc_id
    JOIN fps f2 ON f2.doc_id = w.survivor_id
    ORDER BY c.doc_id"""

  // ---- registry -------------------------------------------------------

  // ---- incremental (catalog) dedup — round 4, two-table API round 5 ----
  // The nightly-ingest stage: NEW documents are checked against an
  // EXISTING catalog and classified exact_dup / near_dup / novel with
  // the best catalog match. The catalog is a precomputed fingerprint +
  // shingle store ([[buildCatalog]] → two parquet tables, written once
  // per ingest and only READ afterwards — never re-derived from catalog
  // text); [[incrementalOf]] is the production entry over those tables.
  // The gated `incremental` splits the one gated corpus at doc_id
  // [[IncrementalCut]] and routes through the same two-table path so
  // the oracle sees the same semantics the production API runs.
  //
  // Scale shape: the exact stage is one fingerprint equi-join; the
  // near stage runs ONLY over incoming docs the exact stage didn't
  // claim (left-anti prune before the wide shingle join), joins
  // incoming shingles against catalog shingles (equi-join on the
  // shingle), and picks the best match with a rank-1 window (literal
  // limit → WindowGroupLimit). Incoming never self-joins: candidate
  // volume is |incoming ∩ catalog shingle matches|, not corpus².
  // The catalog side of the shingle join is df-capped
  // (`spark.graft.dedup.incrementalMaxDf`, default
  // [[DefaultMaxShingleDf]], drops logged) — without it one
  // ultra-common catalog shingle fans out EVERY incoming doc that
  // contains it. The oracle SQL MIRRORS the default cap (a HAVING on
  // catalog shingle df), so query and oracle share semantics at every
  // df — not just while catalog df < 256 (round-6 fix: previously only
  // the Spark side capped, and a hot-shingle catalog would have flipped
  // near_dup→novel on one side of the gate only). The conf remains a
  // production knob; the gated entry runs at the mirrored default.
  private[graft] val IncrementalCut = 250L

  /** Build the persisted incremental-dedup catalog from a corpus:
    * fingerprints (doc_id, fp, n_sh — the shingle-set size the Jaccard
    * denominator needs, so match-time never re-aggregates the catalog
    * shingle store) and shingles (doc_id, s). Write both to parquet;
    * [[incrementalOf]] reads them back. Shingle-less docs (<3 tokens)
    * carry n_sh = 0 and never produce near-dup candidates. */
  def buildCatalog(docs: DataFrame): (DataFrame, DataFrame) = {
    val sh = shingleSets(Skew.maybeSpreadByConf(docs, "n_chars", "doc_id"))
    val fp = docs.select(col("doc_id"),
      md5(concat_ws(" ", TextFns.tokens(col("text")))).as("fp"))
    val fpN = fp.join(
      sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh")),
      Seq("doc_id"), "left")
      .select(col("doc_id"), col("fp"), coalesce(col("n_sh"), lit(0L)).as("n_sh"))
    (fpN, sh)
  }

  /** Production incremental dedup: classify `incoming` (doc_id, text)
    * against a persisted catalog (the two [[buildCatalog]] tables).
    * Returns (doc_id, status, match_id) for every incoming doc. */
  def incrementalOf(catalogFp: DataFrame, catalogSh: DataFrame,
                    incoming: DataFrame): DataFrame =
    incrementalOfTracked(catalogFp, catalogSh, incoming)._1

  /** [[incrementalOf]] plus the internal incoming-shingle cache handle:
    * a continuous-ingest caller (classifyBatch, one call per micro-batch
    * forever) must unpersist it once the batch's verdicts are
    * materialized, or dead per-batch caches accumulate in storage memory
    * for the stream's whole life. Batch callers can ignore it (the
    * Verify/Bench harness clears all caches per query). */
  private[graft] def incrementalOfTracked(catalogFp: DataFrame, catalogSh: DataFrame,
                    incoming: DataFrame): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val spark = incoming.sparkSession
    val maxDf = spark.conf.getOption("spark.graft.dedup.incrementalMaxDf")
      .map(_.toLong).getOrElse(DefaultMaxShingleDf)
    val inFp = incoming.select(col("doc_id"),
      md5(concat_ws(" ", TextFns.tokens(col("text")))).as("fp"))
    val exactM = inFp
      .join(catalogFp.select(col("fp"), col("doc_id").as("cid")), Seq("fp"))
      .groupBy(col("doc_id")).agg(min(col("cid")).as("ex_id"))
    val inSh = shingleSets(Skew.maybeSpreadByConf(incoming, "n_chars", "doc_id"))
      .cache() // feeds the join + incoming sizes (see incrementalOfTracked doc)
    val nonExact = incoming.select(col("doc_id"))
      .join(exactM.select(col("doc_id")), Seq("doc_id"), "left_anti")
    val inSz = inSh.groupBy(col("doc_id")).agg(count(lit(1)).as("ni"))
    // stop-shingle cap on the CATALOG side: candidate fanout per shingle
    // is df_catalog × df_incoming, and the catalog is the unbounded,
    // ever-growing side. Dropped keys are logged (recall loss is
    // visible); sizes stay uncapped so surviving candidates' Jaccard
    // uses true set sizes.
    // distinctPairs: catalog shingle tables come from buildCatalog's
    // array_distinct explode, and the idempotent batch-keyed appends keep
    // (doc_id, s) unique across the catalog's whole life
    val cappedCat = Skew.capByFrequency(catalogSh, "s", "doc_id", maxDf,
      logDropsAs = Some("dedup_incremental"), distinctPairs = true)
    val inter = inSh.join(nonExact, Seq("doc_id"), "left_semi")
      .join(cappedCat.select(col("doc_id").as("cid"), col("s")), Seq("s"))
      .groupBy(col("doc_id"), col("cid")).agg(count(lit(1)).as("inter"))
    val wBest = Window.partitionBy(col("doc_id")).orderBy(col("j").desc, col("cid"))
    val nearM = inter
      .join(inSz, Seq("doc_id"))
      .join(catalogFp.select(col("doc_id").as("cid"), col("n_sh").as("nc")), Seq("cid"))
      .select(col("doc_id"), col("cid"),
        round(col("inter").cast("double") /
          (col("ni") + col("nc") - col("inter")).cast("double"), 6).as("j"))
      .filter(col("j") >= 0.5)
      .withColumn("rn", row_number().over(wBest)).filter(col("rn") === 1)
      .select(col("doc_id"), col("cid").as("near_id"))
    val verdicts = incoming.select(col("doc_id"))
      .join(exactM, Seq("doc_id"), "left")
      .join(nearM, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("ex_id").isNotNull, "exact_dup")
          .when(col("near_id").isNotNull, "near_dup")
          .otherwise("novel").as("status"),
        coalesce(col("ex_id"), col("near_id")).as("match_id"))
      .orderBy(col("doc_id"))
    (verdicts, inSh)
  }

  /** Close the nightly-ingest loop: extend the catalog with the batch
    * [[incrementalOf]] just classified, so tomorrow's run sees today's
    * documents. The DEFAULT appends every incoming doc's fingerprint +
    * shingles, which is REBUILD-EQUIVALENT: merge(buildCatalog(C), A)
    * produces exactly the tables buildCatalog(C ∪ A) would (one
    * unionByName per table — the catalog side is never re-read or
    * re-derived; only the new batch is tokenized, once). That invariant
    * is what makes sequential ingests == one batch run (spec-proven):
    * classify(B, merge(cat, A)) == classify(B, buildCatalog(C ∪ A)).
    *
    * `novelOnly = true` is the storage-lean production mode: only docs
    * whose verdict was `novel` enter the catalog. Exact-dup
    * classification of future batches is UNCHANGED (a future copy still
    * fingerprint-matches the original catalog doc the dup pointed at),
    * but near-dups whose only neighbor was a skipped non-novel batch
    * doc can downgrade — the documented trade for not growing the
    * catalog with redundant shingle sets.
    *
    * Scale shape: pure append — no shuffle touches the existing
    * catalog; the only work is buildCatalog over the (small) batch and,
    * in novelOnly mode, one left-semi join against its own verdicts. */
  def mergeIntoCatalog(catalogFp: DataFrame, catalogSh: DataFrame,
                       incoming: DataFrame, verdicts: DataFrame,
                       novelOnly: Boolean = false): (DataFrame, DataFrame) = {
    val keep =
      if (novelOnly)
        incoming.join(verdicts.filter(col("status") === "novel").select(col("doc_id")),
          Seq("doc_id"), "left_semi")
      else incoming
    val (fp, sh) = buildCatalog(keep)
    (catalogFp.unionByName(fp), catalogSh.unionByName(sh))
  }

  /** Persisted flavor of [[mergeIntoCatalog]]: append the batch's
    * fingerprints + shingles to the parquet catalog tables in place
    * (parquet append writes new files only — the existing catalog bytes
    * are untouched, so the nightly job's write cost is O(batch), never
    * O(catalog)). Same rebuild-equivalence as the DataFrame flavor.
    *
    * With `batchId = Some(id)` the append is IDEMPOTENT: the batch lands
    * in its own `batch-<id>/` subdirectory with overwrite semantics, so
    * a crash-retried batch REPLACES its earlier (possibly partial) files
    * instead of duplicating rows — duplicate shingle rows would inflate
    * [[incrementalOf]]'s intersection counts (Jaccard > 1 is possible)
    * and flip novel→near_dup for later batches. A catalog grown this way
    * must be read with `recursiveFileLookup=true` (see [[readCatalog]]). */
  def appendToCatalog(fpPath: String, shPath: String,
                      incoming: DataFrame, verdicts: DataFrame,
                      novelOnly: Boolean = false,
                      batchId: Option[Long] = None): Unit = {
    val keep =
      if (novelOnly)
        incoming.join(verdicts.filter(col("status") === "novel").select(col("doc_id")),
          Seq("doc_id"), "left_semi")
      else incoming
    val (fp, sh) = buildCatalog(keep)
    batchId match {
      case Some(id) =>
        fp.write.mode("overwrite").parquet(s"$fpPath/batch-$id")
        sh.write.mode("overwrite").parquet(s"$shPath/batch-$id")
      case None =>
        fp.write.mode("append").parquet(fpPath)
        sh.write.mode("append").parquet(shPath)
    }
  }

  /** Read a catalog table that may have grown `batch-<id>/` subdirectories
    * via idempotent [[appendToCatalog]] appends. `excludeBatch` drops one
    * batch's subdirectory from the view — the crash-retry case: when batch
    * `id` is re-run, its own earlier (failed-attempt) append must not be
    * visible or every doc in the batch would exact-match itself. The
    * directory listing is one driver-side FS call against the catalog
    * ROOT (children only, not a recursive walk), so it stays O(#batches)
    * at any catalog size. */
  def readCatalog(spark: SparkSession, root: String,
                  excludeBatch: Option[Long] = None): DataFrame = {
    val paths = excludeBatch match {
      case None => Seq(root)
      case Some(id) =>
        val p = new org.apache.hadoop.fs.Path(root)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.listStatus(p).toSeq
          .filterNot(st => st.getPath.getName.startsWith("_") ||
            st.getPath.getName.startsWith(".") ||
            st.getPath.getName == s"batch-$id")
          .map(_.getPath.toString)
    }
    spark.read.option("recursiveFileLookup", "true").parquet(paths: _*)
  }

  // ---- signature-only incremental catalog (round 15) -------------------
  // The storage-lean sibling of buildCatalog/incrementalOf: the near-dup
  // state is 32 minhash longs per doc (≈256 B) instead of the full
  // shingle set — MEASURED 11.9× smaller at 200-token documents
  // (ScaleHotCatalog: 436 vs 36.5 MB at 200 k docs), growing with doc
  // length while the signature stays fixed. The honest crossover: for
  // ~10-token stubs the shingle table is SMALLER (the first gate
  // version measured it) — pick the catalog for the corpus you have. The trade is
  // explicit and standard: candidate generation is the same banded LSH
  // equi-join, but verification is the SIGNATURE-ESTIMATED Jaccard
  // (matching components / 32, ±1/√32 expected error) instead of the
  // exact shingle-set ratio — a near-threshold pair can flip vs the
  // exact catalog (spec quantifies agreement on crafted families).
  // Exact-dup detection is unchanged (same md5 fingerprint table).

  /** (fp(doc_id, fp), sigs(doc_id, sig[32])) — both persistable;
    * signatures via the native zero-shuffle expression. */
  def buildSigCatalog(docs: DataFrame): (DataFrame, DataFrame) = {
    val fp = docs.select(col("doc_id"),
      md5(concat_ws(" ", TextFns.tokens(col("text")))).as("fp"))
    (fp, minhashSignatures(docs))
  }

  /** (doc_id, band, bh) from an ARRAY-signature frame — identical band
    * hashing to [[bandsOfSig]]'s column form (same longs, same
    * comma-joined string through xxhash64), so either formulation's
    * bands join against either's. */
  private def bandsOfSigArray(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"),
      explode(array((0 until 8).map { b =>
        struct(lit(b).as("band"),
          xxhash64(concat_ws(",",
            (0 until 4).map(r => element_at(col("sig"), b * 4 + r + 1)): _*)).as("bh"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bh"))

  /** Classify `incoming` against a signature catalog:
    * (doc_id, status, match_id, est_jaccard). Near-dup = best
    * band-candidate with estimated Jaccard ≥ `minEst` (ties → lowest
    * catalog id, the incrementalOf rule). The catalog band side is
    * df-capped like the shingle path — a boilerplate family's hot
    * bucket would otherwise fan out candidates unboundedly (dropped
    * keys are logged; recall loss is visible, never silent). */
  def incrementalSigOf(catalogFp: DataFrame, catalogSig: DataFrame,
                       incoming: DataFrame, minEst: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = incoming.sparkSession
    val maxDf = spark.conf.getOption("spark.graft.dedup.incrementalMaxDf")
      .map(_.toLong).getOrElse(DefaultMaxShingleDf)
    val inFp = incoming.select(col("doc_id"),
      md5(concat_ws(" ", TextFns.tokens(col("text")))).as("fp"))
    val exactM = inFp
      .join(catalogFp.select(col("fp"), col("doc_id").as("cid")), Seq("fp"))
      .groupBy(col("doc_id")).agg(min(col("cid")).as("ex_id"))
    val nonExact = incoming
      .join(exactM.select(col("doc_id")), Seq("doc_id"), "left_anti")
    val inSig = minhashSignatures(nonExact).cache()
    val catBands = Skew.capByFrequency(
      bandsOfSigArray(catalogSig)
        .withColumn("bkey", concat_ws(":", col("band"), col("bh"))),
      "bkey", "doc_id", maxDf,
      logDropsAs = Some("dedup_incremental_sig"), distinctPairs = true)
    val cand = bandsOfSigArray(inSig)
      .join(catBands.select(col("doc_id").as("cid"), col("band"), col("bh")),
        Seq("band", "bh"))
      .select(col("doc_id"), col("cid")).distinct()
    val wBest = Window.partitionBy(col("doc_id"))
      .orderBy(col("est").desc, col("cid"))
    val nearM = cand
      .join(inSig.select(col("doc_id"), col("sig").as("siga")), Seq("doc_id"))
      .join(catalogSig.select(col("doc_id").as("cid"), col("sig").as("sigb")), Seq("cid"))
      .select(col("doc_id"), col("cid"),
        round(aggregate(
          zip_with(col("siga"), col("sigb"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (a, x) => a + x).cast("double") / 32.0, 6).as("est"))
      .filter(col("est") >= minEst)
      .withColumn("rn", row_number().over(wBest)).filter(col("rn") === 1)
      .select(col("doc_id"), col("cid").as("near_id"), col("est"))
    val verdicts = incoming.select(col("doc_id"))
      .join(exactM, Seq("doc_id"), "left")
      .join(nearM, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("ex_id").isNotNull, "exact_dup")
          .when(col("near_id").isNotNull, "near_dup")
          .otherwise("novel").as("status"),
        coalesce(col("ex_id"), col("near_id")).as("match_id"),
        col("est").as("est_jaccard"))
      .orderBy(col("doc_id"))
    // Materialize the (batch-sized) verdicts so inSig's cache can be
    // RELEASED here — in the nightly-driver loop this method is called per
    // batch, and an unreleased signature cache per batch accumulates
    // executor storage forever. The returned frame stays cached (4 narrow
    // columns × batch rows); loop drivers should unpersist it after
    // consuming if batches are large.
    val out = verdicts.cache()
    out.count()
    inSig.unpersist()
    out
  }

  /** Append-merge for the signature catalog — rebuild-equivalent like
    * [[mergeIntoCatalog]] (signatures are per-doc, the catalog side is
    * never re-read); `novelOnly` trades future near-dup recall for not
    * storing redundant signatures, exactly the shingle catalog's
    * documented trade. */
  def mergeIntoSigCatalog(catalogFp: DataFrame, catalogSig: DataFrame,
                          incoming: DataFrame, verdicts: DataFrame,
                          novelOnly: Boolean = false): (DataFrame, DataFrame) = {
    val keep =
      if (novelOnly)
        incoming.join(verdicts.filter(col("status") === "novel").select(col("doc_id")),
          Seq("doc_id"), "left_semi")
      else incoming
    val (fp, sigs) = buildSigCatalog(keep)
    (catalogFp.unionByName(fp), catalogSig.unionByName(sigs))
  }

  /** Persisted flavor of [[mergeIntoSigCatalog]] — batch-keyed
    * idempotent appends exactly like [[appendToCatalog]] (same
    * `batch-<id>/` overwrite semantics, same [[readCatalog]] reader,
    * same [[compactCatalog]] compaction). O(batch) write cost. */
  def appendToSigCatalog(fpPath: String, sigPath: String,
                         incoming: DataFrame, verdicts: DataFrame,
                         novelOnly: Boolean = false,
                         batchId: Option[Long] = None): Unit = {
    val keep =
      if (novelOnly)
        incoming.join(verdicts.filter(col("status") === "novel").select(col("doc_id")),
          Seq("doc_id"), "left_semi")
      else incoming
    val (fp, sigs) = buildSigCatalog(keep)
    batchId match {
      case Some(id) =>
        fp.write.mode("overwrite").parquet(s"$fpPath/batch-$id")
        sigs.write.mode("overwrite").parquet(s"$sigPath/batch-$id")
      case None =>
        fp.write.mode("append").parquet(fpPath)
        sigs.write.mode("append").parquet(sigPath)
    }
  }

  /** Compact a batch-grown catalog (round 15): rewrite the CURRENT
    * catalog view into one `base/` generation under a new root. Years
    * of nightly `batch-<id>/` appends leave thousands of
    * subdirectories — harmless to reads (recursive listing) but a
    * growing driver listing in [[readCatalog]]'s excludeBatch path and
    * a small-files tax on the FS. Compaction is O(catalog), so it runs
    * on an ops cadence, not nightly; the caller swaps the root pointer
    * when both writes commit (write-beside-then-swap, the external-
    * table convention). Classification against the compacted catalog
    * is IDENTICAL by construction — the catalog is a bag of rows and
    * only the file layout changes (spec-proven). */
  def compactCatalog(spark: SparkSession, fpPath: String, shPath: String,
                     outFpPath: String, outShPath: String): Unit = {
    readCatalog(spark, fpPath).write.mode("overwrite").parquet(s"$outFpPath/base")
    readCatalog(spark, shPath).write.mode("overwrite").parquet(s"$outShPath/base")
  }

  def incremental(spark: SparkSession, dir: String): DataFrame = {
    // the oracle SQL pins DefaultMaxShingleDf; a conf override here would
    // make query and oracle silently diverge at the correctness gate, so
    // the GATED entry fails fast. The conf stays a production knob for
    // direct incrementalOf callers.
    spark.conf.getOption("spark.graft.dedup.incrementalMaxDf")
      .filter(_.toLong != DefaultMaxShingleDf).foreach { v =>
        throw new IllegalStateException(
          s"dedup_incremental's oracle mirrors the default shingle-df cap " +
          s"($DefaultMaxShingleDf); unset spark.graft.dedup.incrementalMaxDf " +
          s"(= $v) before running the gated entry")
      }
    incrementalAt(spark, dir, IncrementalCut)
  }

  /** The gated entry's body with the catalog/incoming split point
    * exposed: the gated cut (250) bounds the catalog at 250 docs, so
    * the default df cap (256) can NEVER fire through the gate —
    * `tools.CapGate` runs this at a higher cut over a crafted corpus to
    * prove the cap flips near_dup→novel IDENTICALLY on both engines
    * (paired with [[incrementalOracleFor]] at the same parameters). */
  private[graft] def incrementalAt(spark: SparkSession, dir: String, cut: Long): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val (catFp, catSh) = buildCatalog(docs.filter(col("doc_id") < cut))
    incrementalOf(catFp.cache(), catSh.cache(), // harness clears
      docs.filter(col("doc_id") >= cut))
  }

  /** [[incrementalAt]]'s oracle at the same (cut, maxDf) parameters. */
  private[graft] def incrementalOracleFor(cut: Long, maxDf: Long): String = s"""
    WITH $shinglesSqlCte,
    fp AS (SELECT doc_id, md5(array_to_string(t, ' ')) AS fp FROM toks),
    ex AS (SELECT i.doc_id, min(c.doc_id) AS match_id
           FROM fp i JOIN fp c ON i.fp = c.fp AND c.doc_id < $cut
           WHERE i.doc_id >= $cut GROUP BY i.doc_id),
    -- mirrors Skew.capByFrequency on the catalog side: shingles in more
    -- than maxDf catalog docs leave candidate generation (and the inter
    -- count) on BOTH engines
    keep AS (SELECT s FROM sh WHERE doc_id < $cut
             GROUP BY s HAVING count(DISTINCT doc_id) <= $maxDf),
    cand AS (SELECT a.doc_id, b.doc_id AS cid, count(*) AS inter
             FROM sh a JOIN sh b ON a.s = b.s AND b.doc_id < $cut
             JOIN keep k ON a.s = k.s
             WHERE a.doc_id >= $cut
               AND a.doc_id NOT IN (SELECT doc_id FROM ex)
             GROUP BY 1, 2),
    near0 AS (SELECT cand.doc_id, cid,
                round(CAST(inter AS DOUBLE) / CAST(x.n + y.n - inter AS DOUBLE), 6) AS j
              FROM cand JOIN sz x ON cand.doc_id = x.doc_id
                        JOIN sz y ON cid = y.doc_id),
    near1 AS (SELECT doc_id, cid,
                row_number() OVER (PARTITION BY doc_id ORDER BY j DESC, cid) AS rn
              FROM near0 WHERE j >= 0.5),
    nr AS (SELECT doc_id, cid AS match_id FROM near1 WHERE rn = 1)
    SELECT i.doc_id,
      CASE WHEN ex.doc_id IS NOT NULL THEN 'exact_dup'
           WHEN nr.doc_id IS NOT NULL THEN 'near_dup'
           ELSE 'novel' END AS status,
      coalesce(ex.match_id, nr.match_id) AS match_id
    FROM (SELECT doc_id FROM documents WHERE doc_id >= $cut) i
    LEFT JOIN ex USING (doc_id) LEFT JOIN nr USING (doc_id)
    ORDER BY i.doc_id"""

  val incrementalOracle: String = incrementalOracleFor(IncrementalCut, DefaultMaxShingleDf)

  // ---- containment dedup (round 11) -----------------------------------
  // ASYMMETRIC near-dup: containment = |A∩B| / min(|A|,|B|) catches a
  // short document subsumed by a longer one (quote expansion, excerpt
  // + commentary, boilerplate-wrapped reposts) that symmetric Jaccard
  // structurally misses — a 5-shingle doc inside a 100-shingle doc has
  // containment 1.0 but Jaccard ≈ 0.05. Same bounded candidate
  // machinery as ngramJaccard (shared-shingle equi-join, default df
  // cap); only the score and threshold differ. The organic corpus has
  // no containment-only pairs (measured: all 25 pairs ≥ 0.8
  // containment are also ≥ 0.5 Jaccard), so the gate seeds one — a
  // short text whose shingles are a strict subset of a longer seed's
  // (containment 1.0, Jaccard 3/8) — proving the operator catches what
  // dedup_ngram_jaccard provably cannot.

  private[graft] val ContainSeeds: Seq[(Long, String)] = Seq(
    (9100001L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
    (9100002L, "alpha bravo charlie delta echo"))
  private val ContainT = 0.8

  def containmentPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .unionByName(ContainSeeds.toDF("doc_id", "text"))
    val sh = shingleSets(docs).repartition(col("s")).cache()
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val joinable = Skew.capByFrequency(sh, "s", "doc_id", DefaultMaxShingleDf,
      Some("dedup_containment"), distinctPairs = true)
    val inter = joinable.select(col("doc_id").as("da"), col("s"))
      .join(joinable.select(col("doc_id").as("db"), col("s")), Seq("s"))
      .filter(col("da") < col("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter"))
    inter
      .join(sz.select(col("doc_id").as("da"), col("n").as("na")), Seq("da"))
      .join(sz.select(col("doc_id").as("db"), col("n").as("nb")), Seq("db"))
      .select(col("da"), col("db"),
        round(col("inter").cast("double") / least(col("na"), col("nb")).cast("double"), 6)
          .as("containment"),
        round(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double"), 6).as("jaccard"))
      .filter(col("containment") >= ContainT)
      .orderBy(col("da"), col("db"))
  }

  val containmentOracle: String = {
    val seedVals = ContainSeeds
      .map { case (id, t) => s"(CAST($id AS BIGINT), '$t')" }.mkString(", ")
    s"""
    WITH docs2 AS (
      SELECT doc_id, text FROM documents
      UNION ALL SELECT doc_id, text FROM (VALUES $seedVals) s(doc_id, text)),
    toks AS (SELECT doc_id, $tokensSql AS t FROM docs2),
    sh AS (SELECT DISTINCT doc_id, s FROM (
      SELECT doc_id, unnest(list_transform(range(len(t)-2),
        i -> array_to_string(t[i+1:i+3], ' '))) AS s
      FROM toks WHERE len(t) >= 3)),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    keep AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= $DefaultMaxShingleDf),
    pairs AS (
      SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      JOIN keep k ON a.s = k.s
      GROUP BY 1, 2)
    SELECT da, db,
      round(CAST(inter AS DOUBLE) / CAST(least(x.n, y.n) AS DOUBLE), 6) AS containment,
      round(CAST(inter AS DOUBLE) / CAST(x.n + y.n - inter AS DOUBLE), 6) AS jaccard
    FROM pairs JOIN sz x ON da = x.doc_id JOIN sz y ON db = y.doc_id
    WHERE CAST(inter AS DOUBLE) / CAST(least(x.n, y.n) AS DOUBLE) >= $ContainT
    ORDER BY da, db"""
  }

  // ---- Bloom-prefiltered catalog probe (round 11) ---------------------
  // The 100 TB shape of "is this document already in the catalog?":
  // at scale the catalog is billions of fingerprints, and the naive
  // answer — shuffle-join every incoming batch against it — moves the
  // whole batch over the wire to discover that MOST documents are
  // novel. A Bloom filter inverts that: one broadcastable bit array
  // answers "definitely novel" for the overwhelming majority NARROWLY
  // (no shuffle, no catalog scan per batch), and only the maybe-members
  // pay the exact confirm join. Built on Spark's own runtime-filter
  // expressions (functions/Bloom.scala) so the engine's tested
  // xxhash64/bit-merge machinery does the work.
  //
  // Sizing is the codebook trade stated in bits: numBits is the
  // broadcast budget (8 bits/key ≈ 2% fpp → 1 MB/M keys; a 1 B-key
  // catalog at 8 bits/key is ~1 GB — past broadcast comfort, so beyond
  // ~100 M keys fall back to the shuffle semi-join of
  // [[incrementalOf]], or shard the filter by key range). fpp only
  // moves the confirm join's input volume, NEVER the answer.

  /** Exact anti-join served through a Bloom prefilter: returns the
    * incoming rows whose `keyCol` is NOT in `catalogKeys`. Definite
    * Bloom misses pass straight through (no false negatives = truth);
    * maybe-members are confirmed by an exact anti-join whose input is
    * only the (true dups + false positives) sliver. Output EQUALS the
    * plain anti-join for every filter size — exactness is
    * gate-checked, pruning is spec-checked. */
  def bloomAntiJoin(incoming: DataFrame, catalogKeys: DataFrame, keyCol: String,
                    expectedItems: Long, numBits: Long): DataFrame = {
    import graft.functions.Bloom
    val row = catalogKeys
      .agg(Bloom.bloomAgg(col(keyCol), expectedItems, numBits).as("bf")).head()
    if (row.isNullAt(0)) return incoming // empty catalog: everything novel
    bloomAntiJoinWith(incoming, catalogKeys, keyCol, row.getAs[Array[Byte]](0))
  }

  /** The SERVE form: probe with a PREBUILT serialized filter (persisted
    * next to the catalog, built once by `functions.Bloom.bloomAgg`) —
    * the per-batch cost never includes the filter build. The filter may
    * be stale-but-superset-safe: a filter missing recently-appended
    * catalog keys would be WRONG (false negatives admit true dups), so
    * refresh on append; a filter containing extra retired keys only
    * fattens the confirm sliver.
    *
    * Confirm-join plan shape (the actual scale win, measured in
    * ScaleBloom): the maybe sliver is SMALL by construction (true dups
    * + fpp·batch), so it broadcasts — the catalog is only ever
    * SCANNED (broadcast semi-join against the sliver's keys), never
    * shuffled or distinct'd. A first cut that anti-joined the sliver
    * against `catalog.distinct()` shuffled all 10 M catalog keys per
    * batch and lost to the plain anti-join 22 s vs 5.5 s; this shape
    * wins 3.3 s vs 5.5 s and, at a real 1000-executor catalog, moves
    * O(sliver) bytes per batch instead of O(catalog). If the sliver
    * outgrows the broadcast budget (a mostly-duplicate batch), fall
    * back to the plain shuffle anti-join — exactness is identical. */
  def bloomAntiJoinWith(incoming: DataFrame, catalogKeys: DataFrame,
                        keyCol: String, filterBytes: Array[Byte]): DataFrame =
    bloomAntiJoinBc(incoming, catalogKeys, keyCol,
      graft.functions.Bloom.broadcastFilter(incoming.sparkSession, filterBytes))

  /** [[bloomAntiJoinWith]] from an ALREADY-broadcast filter — the
    * long-lived serve handle: broadcast once, probe from every later
    * batch without re-shipping the bytes. */
  def bloomAntiJoinBc(incoming: DataFrame, catalogKeys: DataFrame, keyCol: String,
                      filter: org.apache.spark.broadcast.Broadcast[Array[Byte]]): DataFrame = {
    import graft.functions.Bloom
    val maybe = incoming.filter(Bloom.mightContainBc(filter, col(keyCol)))
    val maybeKeys = maybe.select(col(keyCol)).distinct()
    // catalog-side broadcast semi: one narrow catalog scan, no exchange
    val matched = catalogKeys.join(broadcast(maybeKeys), Seq(keyCol), "left_semi")
      .select(col(keyCol)).distinct()
    val novelMaybes = maybe.join(broadcast(matched), Seq(keyCol), "left_anti")
    incoming.filter(!Bloom.mightContainBc(filter, col(keyCol)))
      .unionByName(novelMaybes.select(incoming.columns.map(col).toSeq: _*))
  }

  /** Seeds shared verbatim by the gated entry and its oracle (the
    * DhashSeeds pattern): the organic corpus has ~no exact-text dups
    * across the [[IncrementalCut]], so without seeds the probe would be
    * a vacuous identity. Two incoming texts collide with catalog seeds
    * (must be dropped), one is novel (must survive). */
  private[graft] val BloomCatalogSeeds: Seq[(Long, String)] = Seq(
    (-1L, "graft bloom seed alpha"),
    (-2L, "graft bloom seed beta"),
    (-3L, "graft bloom seed gamma"))
  private[graft] val BloomIncomingSeeds: Seq[(Long, String)] = Seq(
    (9000001L, "graft bloom seed alpha"),
    (9000002L, "graft bloom seed beta"),
    (9000003L, "graft bloom novel delta"))

  /** Gated entry: novel documents (by exact md5(text) fingerprint)
    * among `doc_id >= cut` + incoming seeds, probed against the
    * catalog of `doc_id < cut` + catalog seeds through [[bloomAntiJoin]]. */
  def bloomProbe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val cat = docs.filter(col("doc_id") < IncrementalCut)
      .unionByName(BloomCatalogSeeds.toDF("doc_id", "text"))
      .select(md5(col("text")).as("fp"))
    val inc = docs.filter(col("doc_id") >= IncrementalCut)
      .unionByName(BloomIncomingSeeds.toDF("doc_id", "text"))
      .select(col("doc_id"), md5(col("text")).as("fp"))
    bloomAntiJoin(inc, cat, "fp", expectedItems = 4096, numBits = 32768)
      .orderBy(col("doc_id"))
  }

  /** Exact twin of [[bloomProbe]] — a PLAIN anti-join: the Bloom stage
    * is pure routing (definite-miss vs confirm-join) and provably never
    * changes the result set. */
  val bloomProbeOracle: String = {
    def vals(s: Seq[(Long, String)]) =
      s.map { case (id, t) => s"(CAST($id AS BIGINT), '$t')" }.mkString(", ")
    s"""
    WITH cat AS (
      SELECT md5(text) AS fp FROM (
        SELECT text FROM documents WHERE doc_id < $IncrementalCut
        UNION ALL SELECT text FROM (VALUES ${vals(BloomCatalogSeeds)}) s(doc_id, text))),
    inc AS (
      SELECT doc_id, md5(text) AS fp FROM (
        SELECT doc_id, text FROM documents WHERE doc_id >= $IncrementalCut
        UNION ALL SELECT doc_id, text FROM (VALUES ${vals(BloomIncomingSeeds)}) s(doc_id, text)))
    SELECT doc_id, fp FROM inc
    WHERE NOT EXISTS (SELECT 1 FROM cat WHERE cat.fp = inc.fp)
    ORDER BY doc_id"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_bloom_probe"   -> (bloomProbe _),
    "dedup_exact"         -> (exact _),
    "dedup_ngram_jaccard" -> (ngramJaccard _),
    "dedup_containment"   -> (containmentPairs _),
    "dedup_minhash_lsh"   -> (minhashLsh _),
    "dedup_simhash"       -> (simhash _),
    "dedup_pipeline"      -> (dedupPipeline _),
    "dedup_pipeline_survivorship" -> (dedupPipelineSurvivorship _),
    "dedup_clusters"      -> (dedupClusters _),
    "dedup_survivorship"  -> (survivorship _),
    "dedup_incremental"   -> (incremental _))

  val oracle: Map[String, String] = Map(
    "dedup_bloom_probe"   -> bloomProbeOracle,
    "dedup_exact"         -> exactOracle,
    // capped gate since round 8: the oracle's keep CTE mirrors the
    // default df cap the gated entry now runs with
    "dedup_ngram_jaccard" -> ngramJaccardOracleFor(Some(DefaultMaxShingleDf)),
    "dedup_containment"   -> containmentOracle,
    // LSH affects recall only (precision is exact-verified); with 8 bands
    // × 4 rows, pairs at J≥0.8 are caught w.p. ≥1-(1-0.8⁴)⁸ ≈ 0.985 per
    // pair and the planted near-dups at the oracle SF are all caught
    // (verified: LSH output == exact set-similarity output at sf0.01),
    // so the exact-join oracle applies verbatim — same reasoning gives
    // the pipeline oracle its exact-jaccard stand-in for the LSH stage.
    "dedup_minhash_lsh"   -> ngramJaccardOracle,
    "dedup_incremental"   -> incrementalOracle,
    "dedup_simhash"       -> simhashOracle,
    "dedup_pipeline"      -> dedupPipelineOracle,
    "dedup_pipeline_survivorship" -> dedupPipelineSurvivorshipOracle,
    "dedup_clusters"      -> dedupClustersOracle,
    "dedup_survivorship"  -> survivorshipOracle)

  // Exact twin of `simhash`: the md5-derived 60-bit token hash makes the
  // signature, the 4-block pigeonhole candidate join, and the Hamming
  // filter all portable — CAST('0x'||substr(md5,1,15) AS BIGINT) in
  // DuckDB == conv(substring(md5,1,15),16,10) in Spark (verified bit-
  // identical). Majority vote 2·ones > n matches Spark's sum(±1) > 0.
  lazy val simhashOracle: String = s"""
    WITH tok AS (SELECT doc_id, unnest($tokensSql) AS t FROM documents),
    th AS (SELECT doc_id,
             CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) AS h
           FROM tok),
    bits AS (
      SELECT doc_id, i,
        CASE WHEN 2 * sum((h >> CAST(i AS INT)) & 1) > count(*)
             THEN CAST(1 AS BIGINT) << CAST(i AS INT) ELSE 0 END AS bitval
      FROM th, range(60) r(i)
      GROUP BY doc_id, i),
    sh AS (SELECT doc_id, CAST(sum(bitval) AS BIGINT) AS simhash
           FROM bits GROUP BY doc_id),
    blocks AS (
      SELECT doc_id, simhash, k,
        (simhash >> CAST(k * 16 AS INT)) & 65535 AS bv
      FROM sh, range(4) r(k)),
    cand AS (
      SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
        a.simhash AS sa, b.simhash AS sb
      FROM blocks a JOIN blocks b
        ON a.k = b.k AND a.bv = b.bv AND a.doc_id < b.doc_id)
    SELECT da, db, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
    FROM cand
    WHERE bit_count(xor(sa, sb)) <= 3
    ORDER BY da, db"""

  lazy val dedupPipelineOracle: String = s"""
    WITH RECURSIVE
    fp AS (SELECT doc_id, md5(array_to_string($tokensSql, ' ')) AS content_fp
                FROM documents),
    eg AS (SELECT content_fp, min(doc_id) AS exact_rep FROM fp GROUP BY content_fp),
    wr AS (SELECT fp.doc_id, eg.exact_rep FROM fp JOIN eg USING (content_fp)),
    repdocs AS (SELECT d.* FROM documents d JOIN wr ON d.doc_id = wr.doc_id
                WHERE wr.doc_id = wr.exact_rep),
    toks AS (SELECT doc_id, $tokensSql AS t FROM repdocs),
    sh AS (SELECT DISTINCT doc_id, s FROM (
      SELECT doc_id, unnest(list_transform(range(len(t)-2),
        i -> array_to_string(t[i+1:i+3], ' '))) AS s
      FROM toks WHERE len(t) >= 3)),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    near AS (
      SELECT da, db FROM pairs JOIN sz x ON da = x.doc_id JOIN sz y ON db = y.doc_id
      WHERE CAST(inter AS DOUBLE) / CAST(x.n + y.n - inter AS DOUBLE) >= 0.5),
    e2 AS (SELECT da AS a, db AS b FROM near UNION ALL SELECT db, da FROM near),
    reach(a, b) AS (
      SELECT a, b FROM e2
      UNION
      SELECT r.a, e.b FROM reach r JOIN e2 e ON r.b = e.a),
    mr AS (SELECT a, min(b) AS mb FROM reach GROUP BY a)
    SELECT wr.doc_id,
      least(wr.exact_rep, coalesce(mr.mb, wr.exact_rep)) AS survivor_id,
      CASE
        WHEN wr.doc_id = least(wr.exact_rep, coalesce(mr.mb, wr.exact_rep)) THEN 'kept'
        WHEN least(wr.exact_rep, coalesce(mr.mb, wr.exact_rep)) <> wr.exact_rep THEN 'near_dup'
        WHEN wr.doc_id <> wr.exact_rep THEN 'exact_dup'
        ELSE 'kept'
      END AS status
    FROM wr LEFT JOIN mr ON wr.exact_rep = mr.a
    ORDER BY wr.doc_id"""
}
