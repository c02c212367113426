package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Text edge-list source/sink — the reference's `"src dst [val]"` line format
 * (`include/GMDP/utils/edgelist.h:89-133`, writer `:208-240`). The reference
 * shards files round-robin per MPI rank; Spark's multi-part directory output
 * is the same layout with saner naming.
 */
object TextEdgeList {

  /** Read whitespace-separated `src dst [weight]` lines; missing weight = 1.0.
    * Lines failing to parse (e.g. a header) are dropped, matching the loader's
    * tolerance for the optional `m n nnz` header line. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(StructType(Seq(StructField("line", StringType))))
      .text(path)
      .select(split(trim(col("line")), "\\s+").as("f"))
      .filter(size(col("f")) >= 2 && size(col("f")) <= 3)
      .select(
        try_element_at(col("f"), lit(1)).try_cast("long").as("src"),
        try_element_at(col("f"), lit(2)).try_cast("long").as("dst"),
        coalesce(try_element_at(col("f"), lit(3)).try_cast("double"), lit(1.0)).as("weight"))
      .filter(col("src").isNotNull && col("dst").isNotNull)

  /** Write `src dst weight` lines (integral weights printed without ".0",
    * matching the reference's integer payloads). */
  def write(edges: DataFrame, path: String): Unit =
    edges.select(concat_ws(" ",
        col("src"),
        col("dst"),
        when(col("weight") === col("weight").cast("long"),
          col("weight").cast("long").cast("string"))
          .otherwise(col("weight").cast("string"))).as("value"))
      .write.mode("overwrite").text(path)
}
