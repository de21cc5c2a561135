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
  /** events.ts — schema-adaptive read, normalized to a NANOSECOND LONG.
    *
    * The generator has shipped `ts` as parquet TIMESTAMP(NANOS) (which
    * Spark's reader only accepts as a raw long via `nanosAsLong`) and as
    * timestamp[us] `isAdjustedToUTC=false` (which Spark reads as
    * TIMESTAMP_NTZ). Downstream event-time operators do exact integer
    * math (a double cannot hold a ns epoch — 1.7e18 > 2^53), so both
    * encodings are normalized here to one contract: `ts` is epoch
    * nanoseconds as LONG. The ntz→ltz cast is wall-clock-preserving only
    * under UTC, so the session time zone is pinned; DuckDB's naive
    * `epoch_us(CAST(ts AS TIMESTAMP))` oracle then agrees bit-for-bit.
    *
    * UTC is the responsibility of SESSION CONSTRUCTION — every entry
    * point (GraftSession, Verify, Bench, the tools mains) pins
    * `spark.sql.session.timeZone=UTC` in its builder. The set below is
    * a defensive no-op for a caller who built a session elsewhere, and
    * runs UNCONDITIONALLY (not just on the ntz path) so session
    * behavior never depends on which ts encoding the data carries or
    * whether `events` was read first. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw // TIMESTAMP(NANOS) as raw ns
      case _ =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr("unix_micros(cast(ts as timestamp_ltz)) * 1000L"))
    }
  }
  def documents(s: SparkSession, d: String)  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = apply(s, d, "embeddings")
}
