package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{VecNative, VectorFns}

/** Differential proof for the round-11 native assignment expressions
  * ([[graft.functions.NearestByD2]] / [[graft.functions.BestCosine6]]):
  * on arbitrary and adversarial inputs they are BIT-IDENTICAL to the
  * higher-order-function formulation they replaced
  * (`transform(sequence(..), i => d2/cosine6(vec, element_at(cb, i)))`
  * + `array_position(_, array_min/max(_))`), so every Lloyd trainer,
  * PQ/IVF encoder, and cluster assigner keeps its DuckDB-exact gate
  * while the per-row loop runs native instead of interpreted.
  *
  * Adversarial rows covered: exact codeword match (d2 == 0.0 exactly),
  * duplicated codewords (tie → FIRST position must win), near-identical
  * vectors (d2 rounding to ±0.0), and the zero vector (cosine 0/0 →
  * NaN, the array_max "NaN greatest" regime).
  */
class NativeAssignSpec extends AnyFunSuite {
  lazy val spark = GraftSession.test
  import spark.implicits._

  private val Dim = 8
  private val K = 13

  /** Deterministic pseudo-random codebook; cid 4 == cid 9 (a tie pair). */
  private val cents: Seq[Seq[Double]] = (0 until K).map { c =>
    val base = if (c == 8) 3 else c // duplicate: cid 9 repeats cid 4
    (0 until Dim).map(d => math.sin(base * 2.13 + d * 0.71)): Seq[Double]
  }

  /** Rows: pseudo-random + codeword copies + a near-codeword + zero. */
  private def data(): DataFrame = {
    val rand = spark.range(400).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(Dim - 1)),
        j => sin(col("id") * lit(7.31) + j * lit(1.73))).as("vec"))
    val crafted = Seq(
      (1000L, cents(3)),                              // exact codeword (tie 4 vs 9)
      (1001L, cents(6)),                              // exact codeword
      (1002L, cents(6).map(_ + 1e-9)),                // near-identical → d2 ~ ±0
      (1003L, Seq.fill(Dim)(0.0)),                    // zero vector → cosine NaN
      (1004L, cents(3).map(_ * 2.0))                  // scaled copy: cosine tie 4 vs 9
    ).toDF("vec_id", "vec")
    rand.unionByName(crafted)
  }

  /** The pre-round-11 HOF formulations, rebuilt verbatim. */
  private def hofD2(df: DataFrame): DataFrame = {
    val cb = typedLit(cents)
    val d2s = transform(sequence(lit(1), lit(K)), i =>
      round(VectorFns.dot(col("vec"), col("vec"))
        + VectorFns.dot(element_at(cb, i), element_at(cb, i))
        - lit(2) * VectorFns.dot(col("vec"), element_at(cb, i)), 6))
    df.withColumn("__d2s", d2s)
      .withColumn("cid", array_position(col("__d2s"), array_min(col("__d2s"))).cast("int"))
      .select(col("vec_id"), col("cid"))
  }

  private def hofCos(df: DataFrame): DataFrame = {
    val cb = typedLit(cents)
    val sims = transform(sequence(lit(1), lit(K)), i =>
      VectorFns.cosine6(col("vec"), element_at(cb, i)))
    df.withColumn("__sims", sims)
      .withColumn("cid", array_position(col("__sims"), array_max(col("__sims"))).cast("int"))
      .withColumn("sim", array_max(col("__sims")))
      .select(col("vec_id"), col("cid"), col("sim"))
  }

  test("NearestByD2 == HOF argmin(round6 d2) on random + adversarial rows") {
    val df = data().cache()
    val native = df.select(col("vec_id"),
        VecNative.nearestByD2Col(col("vec"), typedLit(cents)).as("cid"))
      .as[(Long, Int)].collect().sortBy(_._1).toSeq
    val hof = hofD2(df).as[(Long, Int)].collect().sortBy(_._1).toSeq
    assert(native == hof)
    // the tie rows must land on the FIRST of the duplicated codewords
    val byId = native.toMap
    assert(byId(1000L) == 4, "exact-codeword tie must pick the first duplicate")
    df.unpersist()
  }

  test("BestCosine6 == HOF (argmax(round6 cosine), max)") {
    // the zero vector is excluded here: under ANSI mode the HOF's 0/0
    // cosine THROWS (so production can never have relied on a NaN
    // regime — emb's normalize would already have thrown upstream);
    // the native expression returns NaN instead of erroring, which is
    // its documented behavior for the regime production excludes
    val df = data().filter(col("vec_id") =!= 1003L).cache()
    val native = df.select(col("vec_id"),
        VecNative.bestCosine6Col(col("vec"), typedLit(cents)).as("b"))
      .select(col("vec_id"), col("b").getField("cid").as("cid"),
        col("b").getField("sim").as("sim"))
      .as[(Long, Int, Double)].collect().sortBy(_._1).toSeq
    val hof = hofCos(df).as[(Long, Int, Double)].collect().sortBy(_._1).toSeq
    assert(native.size == hof.size)
    native.zip(hof).foreach { case ((idN, cidN, simN), (idH, cidH, simH)) =>
      assert(idN == idH)
      assert(cidN == cidH, s"cid mismatch at vec_id=$idN")
      assert(simN == simH || (simN.isNaN && simH.isNaN),
        s"sim mismatch at vec_id=$idN: $simN vs $simH")
    }
    val byId = native.map(t => t._1 -> t._2).toMap
    assert(byId(1004L) == 4, "scaled-copy cosine tie must pick the first duplicate")
    df.unpersist()
  }

  test("round6 matches Spark round(_, 6) on representative doubles") {
    val vals = Seq(0.1234565, -0.1234565, 1.9999995, -1e-9, 0.0, -0.0,
      123456.789.toDouble, 2.5e-7, -2.5e-7, 1.0 / 3.0, math.Pi)
    val sparkRounded = vals.toDF("v").select(round(col("v"), 6)).as[Double].collect()
    vals.zip(sparkRounded).foreach { case (v, r) =>
      assert(java.lang.Double.compare(VecNative.round6(v), r) == 0 ||
        VecNative.round6(v) == r, s"round6($v): ${VecNative.round6(v)} vs $r")
    }
  }
}
