package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic, engine-portable sampling (replaces main.py:63-70's
  * driver-side `random.sample`).
  *
  * Orders by `md5(seed ‖ key)` and takes the first N. Properties:
  *  - reproducible across engines (md5 is md5 everywhere) and across
  *    partitionings/cluster sizes — unlike `rand(seed)`, whose stream
  *    depends on partition layout;
  *  - scalable: Spark plans ORDER BY + LIMIT as TakeOrderedAndProject
  *    (per-partition top-N, then an N×partitions driver merge) — no
  *    global sort shuffle, no driver-side index materialization.
  */
object Sampling {
  def hashKey(seed: Int, key: Column): Column =
    md5(concat(lit(seed.toString), lit(":"), key.cast("string")))

  /** First n rows by hash order, with a 1-based `sample_rank` column
    * (rank window runs post-limit, over n rows only). */
  def sampleN(df: DataFrame, key: Column, n: Int, seed: Int = 42): DataFrame = {
    val h = hashKey(seed, key)
    df.withColumn("__h", h)
      .orderBy(col("__h"), key)
      .limit(n)
      .withColumn("sample_rank",
        row_number().over(Window.orderBy(col("__h"), key)))
      .drop("__h")
  }
}
