package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog over a scale-factor directory of parquet tables.
  *
  * Plain `spark.read.parquet` is deliberate: Spark's vectorized parquet
  * reader gives column pruning + predicate pushdown for free, which is the
  * whole scale story for the reference's `pd.read_parquet` (main.py:27) —
  * a 100 TB table is only ever read for the columns/rows a query needs.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String)     = apply(s, d, "region")
  def nation(s: SparkSession, d: String)     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String)   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String)   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String)       = apply(s, d, "part")
  def orders(s: SparkSession, d: String)     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String)   = apply(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects;
    * read it as a raw nanosecond long and do exact integer time math
    * downstream (a double cannot hold a ns epoch — 1.7e18 > 2^53). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events")
  }
  def documents(s: SparkSession, d: String)  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = apply(s, d, "embeddings")
}
