package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.sources.CsvSource

/** CsvSource roundtrip semantics on exactly the payloads CSV is known
  * to mangle: embedded quotes/commas/newlines, empty string vs NULL,
  * non-ASCII. The driver gate (csv_roundtrip) proves the full-table
  * identity on real data; this spec pins the adversarial corners. */
class CsvSourceSpec extends AnyFunSuite {
  lazy val spark = GraftSession.test
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("s", StringType)))

  private def roundtrip(rows: Seq[(Long, String)], multiLine: Boolean = false): Map[Long, String] = {
    val out = java.nio.file.Files.createTempDirectory("csvspec").toString + "/t"
    CsvSource.write(rows.toDF("id", "s"), out)
    CsvSource.read(spark, out, schema, multiLine = multiLine)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
  }

  test("quotes, commas, and the null token survive RFC-4180 quoting") {
    val rows = Seq(
      (1L, """she said "hi", twice"""),
      (2L, "plain"),
      (4L, "a,b,,c"),
      (5L, "trailing space "),
      (6L, "unicodé ✓"))
    assert(roundtrip(rows) == rows.toMap)
  }

  test("documented boundary: a literal \\N text field collapses to NULL") {
    // the null token is matched after unquoting, so no quoting protects
    // it — CsvSource's scaladoc routes sentinel-bearing data to JSONL
    assert(roundtrip(Seq((3L, "\\N"))) == Map(3L -> null))
  }

  test("empty string and NULL are distinct across the roundtrip") {
    val out = java.nio.file.Files.createTempDirectory("csvspec").toString + "/n"
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, ""),
        org.apache.spark.sql.Row(2L, null)),
      schema)
    CsvSource.write(df, out)
    val back = CsvSource.read(spark, out, schema)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) "<NULL>" else s"<${r.getString(1)}>")).toMap
    assert(back == Map(1L -> "<>", 2L -> "<NULL>"))
  }

  test("embedded newlines roundtrip under opt-in multiLine") {
    val rows = Seq((1L, "line one\nline two\r\nline three"), (2L, "flat"))
    assert(roundtrip(rows, multiLine = true) == rows.toMap)
  }

  test("ORC roundtrip: values and schema identical to the parquet frame") {
    // DuckDB can't read ORC, so this is the spec-only twin of the
    // csv/jsonl gated roundtrips: documents parquet → ORC → read back
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = java.nio.file.Files.createTempDirectory("orcspec").toString + "/docs"
    graft.sources.OrcSource.write(docs, out)
    val back = graft.sources.OrcSource.read(spark, out, docs.schema)
    assert(back.schema == docs.schema, "ORC read must rehydrate the exact schema")
    val a = docs.orderBy("doc_id").collect().toSeq
    val b = back.orderBy("doc_id").collect().toSeq
    assert(a == b, "ORC roundtrip must be value-identical")
    assert(a.nonEmpty)
  }
}
