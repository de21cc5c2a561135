package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: the reference's whole point — sample + detect + render
    * markdown docs — on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RefCore.markdownRender(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Analytics.queries ++ RefCore.queries ++ Dedup.queries ++
      Similarity.queries ++ TextAnalysis.queries ++ Multimodal.queries ++
      AsOfJoin.queries ++ RangeJoin.queries ++ Curation.queries ++
      Retrieval.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Analytics.oracle ++ RefCore.oracle ++ Dedup.oracle ++
      Similarity.oracle ++ TextAnalysis.oracle ++ Multimodal.oracle ++
      AsOfJoin.oracle ++ RangeJoin.oracle ++ Curation.oracle ++
      Retrieval.oracle
}
