package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling for training-data pipelines. A row's fate is a pure
 * function of (its id, the salt): u = first 8 hex digits of md5(id:salt) as
 * a 32-bit integer, kept iff u < rate·2³². That gives exact cross-engine
 * replayability (the DuckDB twin computes the identical integer), stable
 * samples under re-runs and repartitioning, and — because thresholds are
 * integers — zero float-comparison ambiguity at the keep boundary.
 *
 * Scale shape (100 TB): both samplers are a single narrow filter (no
 * shuffle, fully pushed into the scan's output batch); the coverage report
 * is one groupBy over the strata (tiny by construction). Nested sample
 * rates compose: because u is fixed per (id, salt), a 0.1 sample is a strict
 * subset of a 0.5 sample at the same salt — handy for deterministic
 * curriculum subsets.
 */
object Sampling {

  /** The 32-bit md5 bucket of (id, salt) — uniform on [0, 2³²). */
  def bucket(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(":" + salt))), 1, 8), 16, 10)
      .cast("long")

  /** Integer keep-threshold for a rate in [0, 1]. */
  def threshold(rate: Double): Long = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    (rate * 4294967296.0).toLong
  }

  /** Uniform deterministic sample: keep iff bucket(id, salt) < rate·2³². */
  def hashSample(df: DataFrame, id: Column, rate: Double, salt: String): DataFrame =
    df.filter(bucket(id, salt) < threshold(rate))

  /**
   * Stratified deterministic sample: per-stratum rates (fallback
   * `defaultRate` for strata not in the map). Typical use: rebalance a
   * multilingual corpus by downsampling over-represented languages.
   */
  def stratified(df: DataFrame, id: Column, stratum: Column,
                 rates: Map[String, Double], defaultRate: Double,
                 salt: String): DataFrame = {
    val thr = rates.toSeq.sortBy(_._1).foldLeft(lit(threshold(defaultRate))) {
      case (acc, (key, rate)) => when(stratum === key, lit(threshold(rate))).otherwise(acc)
    }
    df.filter(bucket(id, salt) < thr)
  }

  /**
   * Coverage report for a stratified sample: per stratum, the population,
   * the kept count, and the achieved rate — sampling that silently skews a
   * stratum should be visible in one small relation, same policy as the LSH
   * cap-drop coverage reports.
   */
  def stratifiedCoverage(df: DataFrame, id: Column, stratum: Column,
                         rates: Map[String, Double], defaultRate: Double,
                         salt: String): DataFrame = {
    val thr = rates.toSeq.sortBy(_._1).foldLeft(lit(threshold(defaultRate))) {
      case (acc, (key, rate)) => when(stratum === key, lit(threshold(rate))).otherwise(acc)
    }
    df.groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).as("n_rows"),
           sum(when(bucket(id, salt) < thr, 1L).otherwise(0L)).as("n_kept"))
      .select(col("stratum"), col("n_rows"), col("n_kept"),
              round(col("n_kept") / col("n_rows") + 1e-9, 6).as("achieved_rate"))
  }
}
