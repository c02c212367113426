package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/**
 * Distributed dense global ordinals WITHOUT a single-partition window.
 *
 * `row_number().over(Window.orderBy(...))` moves the whole input to one task
 * — at 10^9 keys that is one executor sorting the world. This helper gets the
 * same total order with range repartitioning + per-partition sort +
 * `zipWithIndex` (which numbers rows contiguously across partitions in
 * partition order, at the cost of one extra count job — the classic
 * per-partition-offsets/prefix-sum construction). Results are identical to
 * the global window: ord = 0-based rank of the row under `sortCols`.
 *
 * Determinism: callers must make `sortCols` a total order (append a unique
 * tie-break column); range boundaries only affect which partition computes a
 * rank, never the rank itself.
 */
object DenseRank {

  /** All input columns plus `ordCol` = 0-based global rank under `sortCols`. */
  def denseOrdBy(df: DataFrame, ordCol: String, sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val n = math.max(spark.sessionState.conf.numShufflePartitions, 1)
    val sorted = df
      .repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val outSchema = StructType(sorted.schema.fields :+ StructField(ordCol, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    spark.createDataFrame(rdd, outSchema)
  }
}
