package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.LinkGraph

/**
 * Community quality: Newman modularity of a vertex partition over the
 * undirected simple view — Q = Σ_c [ m_c/m − (d_c/(2m))² ] with m the
 * canonical edge count, m_c the intra-community edge count and d_c the
 * community degree sum. The standard score for the engine's label
 * propagation output (and any other partition column).
 *
 * Shape at scale: two broadcast-free aggregations — edges join the label
 * table on both endpoints (hash join on the vertex key), degrees are one
 * groupBy — then a K-row community fold; nothing is collected.
 */
object Modularity {

  /**
   * One-row (m, n_communities, modularity) for `labels` = (id, label).
   * Degrees count the undirected simple view (each canon edge contributes
   * one to both endpoints); vertices absent from `labels` would silently
   * drop edges, so callers pass a label per vertex (LP/CC output does).
   */
  def score(graph: LinkGraph, labels: DataFrame): DataFrame = {
    // `tagged` feeds THREE consumers (edge count, degree fold, intra fold);
    // materialize it once instead of re-running the upstream edge derivation
    // per branch (guide §2.4 — the fixtures derive edges through window
    // functions, so each re-evaluation was a full window pipeline)
    val canon = graph.edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val la = labels.select(col("id").as("a"), col("label").as("la"))
    val lb = labels.select(col("id").as("b"), col("label").as("lb"))
    val tagged = canon.join(la, "a").join(lb, "b").localCheckpoint()
    val m = tagged.count().toDouble
    // d_c: every canon edge credits 1 to each endpoint's community
    val degSum = tagged.select(explode(array(col("la"), col("lb"))).as("c"))
      .groupBy("c").agg(count(lit(1)).as("d"))
    val intra = tagged.filter(col("la") === col("lb"))
      .groupBy(col("la").as("c")).agg(count(lit(1)).as("e"))
    degSum.join(intra, Seq("c"), "left_outer")
      .select((coalesce(col("e"), lit(0L)) / m
        - pow(col("d") / (2.0 * m), 2)).as("q"))
      .agg(lit(m.toLong).as("m"), count(lit(1)).as("n_communities"),
        round(sum(col("q")) + 1e-9, 6).as("modularity"))
  }
}
