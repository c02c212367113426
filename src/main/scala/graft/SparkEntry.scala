package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Transcripts
import graft.algos.PageRank

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /**
   * Flagship: the minimum end-to-end slice (SURVEY.md §7.3) — synthesize a
   * deterministic transcript table (the BASELINE.json input_hint shape),
   * extract reply+tool edges, run GraphMat-semantics PageRank to convergence,
   * return per-vertex scores sorted by id. Driver smoke-checks rows>0.
   */
  def entry(spark: SparkSession): DataFrame = {
    val transcripts = Transcripts.synthesize(spark, conversations = 500)
    val graph = Transcripts.toGraph(transcripts)
    PageRank.run(graph).state
      .select(col("id"), col("degree"), round(col("pagerank"), 6).as("pagerank"))
      .orderBy("id")
  }

  /** One per implemented operator from SURVEY.md §2 (graph engine + edge ops
    * + relational anchors) and the training-data pipeline operator set. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.QueryCatalog.queries ++ graft.queries.PipelineQueries.queries ++
      graft.queries.AdvancedQueries.queries ++ graft.queries.StreamIoQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.QueryCatalog.oracleSql ++ graft.queries.PipelineQueries.oracleSql ++
      graft.queries.AdvancedQueries.oracleSql ++ graft.queries.StreamIoQueries.oracleSql
}
