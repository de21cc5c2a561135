package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.ZOrder
import graft.api.Extractor

/** Z-order layout: bit math pinned exactly, and the property that makes
  * the layout worth a shuffle — per-file min/max stays narrow in EVERY
  * interleaved dimension, so parquet stats can prune scans on any of
  * them (a lexicographic sort only ever prunes its leading column). */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = GraftSession.test
  import spark.implicits._

  test("zkey: exact bit interleaving, two and three columns") {
    def morton2(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    val rows = Seq((0L, 0L), (5L, 3L), (7L, 0L), (255L, 255L), (170L, 85L))
    val got = rows.toDF("x", "y")
      .select(ZOrder.zkey(Seq(col("x"), col("y")), 8).as("z"))
      .as[Long].collect().toSeq
    assert(got == rows.map { case (x, y) => morton2(x, y, 8) })
    // 3 columns: bit i*3+j = bit i of col j
    val z3 = Seq((1L, 1L, 1L)).toDF("a", "b", "c")
      .select(ZOrder.zkey(Seq(col("a"), col("b"), col("c")), 2).as("z"))
      .as[Long].head()
    assert(z3 == 7L) // low bits of a,b,c land at positions 0,1,2
  }

  test("bucketize: clamps to edge buckets, degenerate range collapses to 0") {
    val got = Seq(-5.0, 0.0, 50.0, 100.0, 250.0).toDF("v")
      .select(ZOrder.bucketize(col("v"), 0.0, 100.0, 4).as("b"))
      .as[Long].collect().toSeq
    assert(got == Seq(0L, 0L, 8L, 15L, 15L))
    val flat = Seq(3.0).toDF("v")
      .select(ZOrder.bucketize(col("v"), 7.0, 7.0, 4).as("b")).as[Long].head()
    assert(flat == 0L)
  }

  test("z-ordered files prune on BOTH dimensions; lexicographic prunes only its leader") {
    // 64x64 grid of (x, y) points
    val grid = spark.range(64L * 64L)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    val nFiles = 16
    val zDir = "target/tmp/zorder_spec/z"
    val lexDir = "target/tmp/zorder_spec/lex"
    Extractor.writeCorpusZOrdered(grid, zDir, Seq("x", "y"), nFiles, bits = 6)
    // baseline: lexicographic (y, x) range layout — same file count
    grid.repartitionByRange(nFiles, col("y"), col("x"))
      .sortWithinPartitions(col("y"), col("x"))
      .write.mode("overwrite").parquet(lexDir)

    // files whose [min,max] span overlaps a narrow predicate CANNOT be
    // skipped by stats — count them per layout per dimension
    def overlapping(dir: String, c: String, lo: Long, hi: Long): Int = {
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
      files.count { f =>
        val r = spark.read.parquet(f).agg(min(col(c)), max(col(c))).head()
        r.getLong(0) <= hi && r.getLong(1) >= lo
      }
    }
    val zx = overlapping(zDir, "x", 10, 13)
    val zy = overlapping(zDir, "y", 10, 13)
    val lx = overlapping(lexDir, "x", 10, 13)
    val ly = overlapping(lexDir, "y", 10, 13)
    // lexicographic: perfect on the leader, useless on the trailer
    assert(ly <= 2, s"lex leader should prune hard, touched $ly/$nFiles")
    assert(lx >= nFiles - 1, s"lex trailer should span ~all files, touched $lx/$nFiles")
    // z-order: real pruning on BOTH (≈ sqrt(nFiles) of the files each)
    assert(zx <= nFiles / 2, s"z-order x touched $zx/$nFiles")
    assert(zy <= nFiles / 2, s"z-order y touched $zy/$nFiles")
  }
}
