package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Graph state accessors and whole-graph maps — the `Graph<V,E>` method
 * surface (`include/Graph.h`, SURVEY.md §2.6) re-expressed over immutable
 * state DataFrames `(id, active, <props>)`. Point updates are `when`
 * projections (a narrow map, no shuffle); whole-graph maps are P5/P6/P9.
 */
object VertexOps {

  /** `setAllActive` / `setAllInactive` (`Graph.h:263-280`). */
  def setAllActive(state: DataFrame, active: Boolean = true): DataFrame =
    state.withColumn("active", lit(active))

  /** `setActive(v)` / `setInactive(v)` (`Graph.h:282-292`). */
  def setActive(state: DataFrame, id: Long, active: Boolean = true): DataFrame =
    state.withColumn("active",
      when(col("id") === id, lit(active)).otherwise(col("active")))

  /** `setAllVertexproperty` (`Graph.h:307-310`). */
  def setAll(state: DataFrame, prop: String, value: Column): DataFrame =
    state.withColumn(prop, value)

  /** `setVertexproperty(v, val)` (`Graph.h:312-316`). */
  def set(state: DataFrame, id: Long, prop: String, value: Column): DataFrame =
    state.withColumn(prop, when(col("id") === id, value).otherwise(col(prop)))

  /** `getVertexproperty(v)` (`Graph.h:358-364`). */
  def get(state: DataFrame, id: Long): org.apache.spark.sql.Row =
    state.filter(col("id") === id).head()

  /** `applyToAllVertices` — P5 (`Graph.h:371-374`): narrow map over state. */
  def mapVertices(state: DataFrame, cols: Column*): DataFrame =
    state.select(cols: _*)

  /** `applyReduceAllVertices` — P6 (`Graph.h:377-381`): global fold; Spark's
    * partial+final aggregation is the two-level thread/rank reduce. */
  def mapReduce(state: DataFrame, agg: Column): org.apache.spark.sql.Row =
    state.agg(agg).head()

  /**
   * `applyToAllEdges` — P9 (`Graph.h:389-402`, `multinode/applyedges.h`):
   * new edge weight from (old weight, src prop, dst prop). Two equi-joins
   * against the state (broadcast when the state is small, shuffle otherwise
   * — Catalyst/AQE picks); produces a NEW edge table (immutable, vs in-place
   * mutation in the reference).
   *
   * `f(weight, srcProps, dstProps)`: src/dst props exposed as `s_<prop>` /
   * `d_<prop>` columns.
   */
  def applyToAllEdges(graph: LinkGraph, state: DataFrame, f: Column): DataFrame = {
    val props = state.columns.filterNot(c => c == "id" || c == "active")
    val sSide = state.select(
      (col("id").as("src") +: props.map(c => col(c).as(s"s_$c"))): _*)
    val dSide = state.select(
      (col("id").as("dst") +: props.map(c => col(c).as(s"d_$c"))): _*)
    graph.edges
      .join(sSide, Seq("src"), "left_outer")
      .join(dSide, Seq("dst"), "left_outer")
      .select(col("src"), col("dst"), f.as("weight"))
  }

  /** `getVertexEdgelist`/`getEdgelist` (`Graph.h:318-335`) are `state` /
    * `graph.edges` themselves — stable Long ids need no native-id remap. */
}
