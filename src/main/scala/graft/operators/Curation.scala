package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.functions.TextFns

/** Training-corpus curation (round 3) — the two pipeline stages a
  * pretraining corpus needs beyond dedup/quality/similarity:
  *
  *  - source MIXING: deterministic domain-weighted subsampling (take
  *    the first n docs per source in portable md5-hash order — the
  *    engine-agnostic analog of weighted reservoir sampling; rerunnable
  *    on any cluster layout with identical output).
  *  - benchmark DECONTAMINATION: find corpus docs sharing an n-gram
  *    with a probe (benchmark) set — the overlap check run before
  *    training on scraped data.
  */
object Curation {

  private val tokensSql =
    "list_filter(regexp_split_to_array(lower(regexp_replace(text, '[^\\w\\s]', ' ', 'g')), '\\s+'), x -> x <> '')"

  private val MixPerSource = 10

  /** Top-[[MixPerSource]] docs per source by md5 hash order. One
    * shuffle on the group key; Spark 4's WindowGroupLimit keeps each
    * partition's local top-n before the exchange, so no source's full
    * row set ever sorts globally. */
  def stratifiedMix(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("hk"), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        md5(concat(lit("mix:"), col("doc_id").cast("string"))).as("hk"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= MixPerSource)
      .select(col("doc_id"), col("source"), col("rk"))
      .orderBy(col("source"), col("rk"))
  }

  val stratifiedMixOracle: String = """
    WITH h AS (SELECT doc_id, source,
                 md5('mix:' || CAST(doc_id AS VARCHAR)) AS hk FROM documents),
    r AS (SELECT doc_id, source,
            CAST(row_number() OVER (PARTITION BY source ORDER BY hk, doc_id) AS INT) AS rk
          FROM h)
    SELECT doc_id, source, rk FROM r WHERE rk <= 10
    ORDER BY source, rk"""

  private val ContamN = 4
  private val ProbeDocs = 5

  /** Corpus docs (outside the probe set) sharing at least one
    * [[ContamN]]-gram with the probe docs, with the distinct shared-gram
    * count. The probe set is benchmark-sized (tiny) → its distinct
    * shingles broadcast; the corpus side is one shingle explode + a
    * broadcast join + a countDistinct on doc_id. countDistinct makes the
    * result immune to probe-side multiplicity, so the probe needs no
    * pre-dedup shuffle. */
  def contamination(spark: SparkSession, dir: String): DataFrame = {
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("__ts"))
      .select(col("doc_id"),
        explode(array_distinct(TextFns.shinglesFromTokens(col("__ts"), ContamN))).as("s"))
    val probe = sh.filter(col("doc_id") < ProbeDocs).select(col("s"))
    sh.filter(col("doc_id") >= ProbeDocs)
      .join(broadcast(probe), Seq("s"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("s")).as("n_shared"))
      .orderBy(col("doc_id"))
  }

  val contaminationOracle: String = s"""
    WITH toks AS (SELECT doc_id, $tokensSql AS t FROM documents),
    sh AS (SELECT DISTINCT doc_id, s FROM (
      SELECT doc_id, unnest(list_transform(range(len(t)-${ContamN - 1}),
        i -> array_to_string(t[i+1:i+$ContamN], ' '))) AS s
      FROM toks WHERE len(t) >= $ContamN)),
    probe AS (SELECT s FROM sh WHERE doc_id < $ProbeDocs)
    SELECT sh.doc_id, count(DISTINCT sh.s) AS n_shared
    FROM sh JOIN probe USING (s)
    WHERE sh.doc_id >= $ProbeDocs
    GROUP BY sh.doc_id
    ORDER BY sh.doc_id"""

  // ---- sequence packing (round 4) --------------------------------------
  // GPT-style concat-and-chunk: the corpus token stream in doc_id order
  // is cut into fixed BlockTokens-token training blocks; each doc maps
  // to the [first_block, last_block] span its tokens land in. The core
  // is a global prefix sum over doc order — which Spark's window API
  // would plan as ONE unpartitioned WindowExec (every row through a
  // single task: the classic 100 TB straggler). Instead, a distributed
  // prefix sum: range-partition by doc_id, per-partition local cumsums
  // in one mapPartitions pass, per-partition subtotals (one tiny row
  // each) collected and turned into broadcast offsets, global cumsum =
  // offset(partition) + local cumsum. The only driver traffic is
  // numPartitions subtotal rows.
  private val BlockTokens = 1024L

  final case class TokRow(doc_id: Long, n: Long)
  final case class CumRow(doc_id: Long, n: Long, pid: Int, localCum: Long)

  /** (doc_id, n_tokens, first_block, last_block) per non-empty doc. */
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val parts = spark.sessionState.conf.numShufflePartitions
    val counts = Tables.documents(spark, dir)
      .select(col("doc_id"), size(TextFns.tokens(col("text"))).cast("long").as("n"))
      .filter(col("n") > 0)
      .repartitionByRange(parts, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .as[TokRow]
    val local = counts.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var cum = 0L
      it.map { r => cum += r.n; CumRow(r.doc_id, r.n, pid, cum) }
    }.cache() // feeds the subtotal action AND the final join (Verify/Bench clear it)
    val subtotals = local.groupBy(col("pid")).agg(max(col("localCum")).as("sub"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = {
      var acc = 0L
      (0 until parts).map { p => val o = acc; acc += subtotals.getOrElse(p, 0L); (p, o) }
    }
    val offDf = offsets.toDF("pid", "offset")
    local.join(broadcast(offDf), Seq("pid"))
      .select(col("doc_id"), col("n").as("n_tokens"),
        expr(s"(offset + localCum - n) div $BlockTokens").as("first_block"),
        expr(s"(offset + localCum - 1) div $BlockTokens").as("last_block"))
      .orderBy(col("doc_id"))
  }

  val packSequencesOracle: String = s"""
    WITH t AS (SELECT doc_id, len($tokensSql) AS n FROM documents),
    f AS (SELECT doc_id, n FROM t WHERE n > 0),
    c AS (SELECT doc_id, n,
            CAST(sum(n) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
          FROM f)
    SELECT doc_id, n AS n_tokens,
      (cum - n) // $BlockTokens AS first_block,
      (cum - 1) // $BlockTokens AS last_block
    FROM c
    ORDER BY doc_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "curation_stratified_mix" -> (stratifiedMix _),
    "curation_contamination"  -> (contamination _),
    "curation_pack_sequences" -> (packSequences _))

  val oracle: Map[String, String] = Map(
    "curation_stratified_mix" -> stratifiedMixOracle,
    "curation_contamination"  -> contaminationOracle,
    "curation_pack_sequences" -> packSequencesOracle)
}
