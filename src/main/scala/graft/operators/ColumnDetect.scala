package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StringType

/** Content/title column auto-detection (main.py:34-61).
  *
  * Pure schema inspection plus — only when the preferred-name list misses —
  * a bounded `limit(1)` data probe per string column (the reference peeks at
  * `df[col].iloc[0]`; our probe reads one row through the parquet reader
  * with column pruning, so it stays O(1) regardless of table size).
  */
object ColumnDetect {
  val contentPreference: Seq[String] = Seq("text", "content", "markdown", "mmd", "body")
  val titlePreference: Seq[String]   = Seq("title", "name", "paper_title")

  final case class Detected(content: Option[String], title: Option[String]) {
    def roleOf(c: String): String =
      if (content.contains(c)) "content"
      else if (title.contains(c)) "title"
      else if (c == "id" || c.endsWith("_id")) "id"
      else "metadata"
  }

  def detect(df: DataFrame): Detected = {
    val cols = df.columns.toSeq
    val content = contentPreference.find(cols.contains).orElse {
      df.schema.fields.iterator
        .filter(_.dataType == StringType)
        .map(_.name)
        .find { c =>
          df.select(col(c)).filter(col(c).isNotNull).limit(1)
            .collect().headOption.exists(_.getString(0).length > 100)
        }
    }
    val title = titlePreference.find(cols.contains)
    Detected(content, title)
  }
}
