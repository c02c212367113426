package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.LinkGraph

/**
 * Deterministic random-walk corpus generation — the DeepWalk/node2vec front
 * half (Perozzi et al., KDD'14): emit fixed-length truncated random walks
 * from every vertex, the token stream an embedding trainer consumes. Beyond
 * the reference's algorithm set, but the canonical link-graph → LLM-training
 * -pipeline bridge at 10^12-edge scale.
 *
 * Every step is md5-derived, so walks are exactly replayable anywhere (the
 * g_walks DuckDB oracle replays them row-for-row): a walk at u on step t
 * moves to the neighbor at index md5("walk:t:u") mod outdeg(u) in dst-sorted
 * order, and stops early at sinks.
 *
 * Scale shape: the adjacency is indexed ONCE ((src, idx, dst, dstdeg) — one
 * row_number window + one degree join), then each step is a single two-key
 * equi-join (src, idx) because the walk state CARRIES the current vertex's
 * degree: the pick index is computable before the join, so no per-step
 * degree lookup and no join-then-filter fanout of deg(u) rows per walk.
 * Bucket the adjacency by src and every step co-locates; steps are
 * localCheckpointed so the final union replays nothing.
 */
object RandomWalks {

  /** (walk: string, step: long, v: long) — step 0 is the start vertex; a
    * walk that hits a sink simply has no later rows. `walk` = "<startId>#<i>"
    * for i in [0, walksPerVertex). */
  def corpus(graph: LinkGraph, walksPerVertex: Int = 1, length: Int = 10): DataFrame = {
    require(walksPerVertex >= 1 && length >= 1)
    // deg feeds the adjacency index AND every walk start; persist it so the
    // edge derivation + aggregate run once, not once per consumer (§2.4)
    val edges = graph.edges.select("src", "dst").distinct()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val adj = edges
      .withColumn("idx", row_number().over(Window.partitionBy("src").orderBy("dst")).cast("long") - 1)
      .join(deg.select(col("src").as("dst"), col("d").as("dstdeg")), Seq("dst"), "left")
      .select(col("src"), col("idx"), col("dst"),
        coalesce(col("dstdeg"), lit(0L)).as("dstdeg"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // one pass: each vertex explodes into its walksPerVertex start rows
    // (the old per-wi union re-ran the vertices⋈deg join per walk index)
    val starts = graph.vertices.join(deg, col("id") === col("src"), "left")
      .select(col("id"), coalesce(col("d"), lit(0L)).as("vdeg"),
        explode(sequence(lit(0), lit(walksPerVertex - 1))).as("wi"))
      .select(
        concat(col("id").cast("string"), lit("#"), col("wi").cast("string")).as("walk"),
        col("id").as("v"), col("vdeg"))

    var cur = starts.localCheckpoint(true)
    val segments = Seq.newBuilder[DataFrame]
    segments += cur.select(col("walk"), lit(0L).as("step"), col("v"))
    for (t <- 1 to length) {
      val pick = pmod(
        conv(substring(md5(concat_ws(":", col("walk"), lit(t), col("v"))), 1, 8),
          16, 10).cast("long"),
        col("vdeg"))
      cur = cur.filter(col("vdeg") > 0)
        .withColumn("pick", pick)
        .join(adj, col("v") === adj("src") && col("pick") === adj("idx"))
        .select(col("walk"), adj("dst").as("v"), adj("dstdeg").as("vdeg"))
        .localCheckpoint(true)
      segments += cur.select(col("walk"), lit(t.toLong).as("step"), col("v"))
    }
    val out = segments.result().reduce(_ unionAll _)
    adj.unpersist(blocking = false)
    deg.unpersist(blocking = false)
    out
  }

  /** Skip-gram (center, context) pairs from a walk corpus — the word2vec
    * training input (DeepWalk §4.2): every ordered pair of vertices within
    * `window` steps of each other on the same walk, with the signed offset.
    * One self-join on walk id with a bounded step-range predicate; at scale
    * both sides shuffle on the walk id once and the range predicate stays
    * inside the sort-merge join. */
  def skipGramPairs(corpus: DataFrame, window: Int = 2): DataFrame = {
    require(window >= 1)
    val a = corpus.as("a"); val b = corpus.as("b")
    a.join(b,
        col("a.walk") === col("b.walk") &&
          col("a.step") =!= col("b.step") &&
          abs(col("a.step") - col("b.step")) <= window)
      .select(
        col("a.v").as("center"), col("b.v").as("context"),
        (col("b.step") - col("a.step")).as("offset"))
  }
}
