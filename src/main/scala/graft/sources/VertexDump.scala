package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * `Graph::saveVertexproperty` golden-output format (`include/Graph.h:338-350`,
 * `DenseSegment.h:774-791`): text lines `"<vertexid> <value>"`, sorted by id
 * (the reference re-shards to canonical layout; sorting gives the same
 * determinism). Used for conformance dumps of PageRank scores / component
 * ids / labels / triangle counts.
 */
object VertexDump {

  def write(state: DataFrame, valueCol: Column, path: String,
            decimals: Int = 6): Unit =
    lines(state, valueCol, decimals)
      .coalesce(1)
      .write.mode("overwrite").text(path)

  /** The formatted lines as a single-column DataFrame (testable without I/O). */
  def lines(state: DataFrame, valueCol: Column, decimals: Int = 6): DataFrame = {
    val v = valueCol.cast("double")
    // format_string, NOT format_number: the latter inserts grouping separators
    // ("1,234.500000") for values >= 1000, breaking the golden line format
    val formatted = when(v === v.cast("long"), v.cast("long").cast("string"))
      .otherwise(format_string(s"%.${decimals}f", v))
    state.select(col("id"), formatted.as("v"))
      .orderBy("id")
      .select(concat_ws(" ", col("id"), col("v")).as("value"))
  }
}
