package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.LinkGraph

/**
 * Link prediction by neighborhood overlap on the undirected simple view:
 * Adamic–Adar and raw common-neighbor counts for vertex pairs that share at
 * least one neighbor but are NOT adjacent —
 *
 *   AA(u,v) = Σ_{w ∈ N(u)∩N(v)} 1 / ln(deg(w))
 *
 * Beyond the reference's bundled apps, but the enumeration is exactly the
 * wedge pass of its triangle counter (`/root/reference/src/TriangleCounting
 * .cpp` walks the same w-centered adjacency products): one self-join of the
 * neighbor list keyed on the wedge center, aggregated on the outer pair.
 *
 * Scale shape (100 TB): wedge volume is Σ_w deg(w)², so `maxDegree` drops
 * hub centers deterministically BEFORE the self-join — the standard
 * link-prediction cut, principled here because a hub's 1/ln(deg) ≈ 0
 * contribution is the one being discarded. Both joins key on the center and
 * reuse its hash partitioning; the anti-join against existing edges keys on
 * the canonical pair. Scores are rounded to 6 decimals BEFORE ranking so the
 * top-k cut is reproducible across engines and summation orders.
 */
object LinkPrediction {

  /** Canonical simple undirected edges (a < b), one row per pair. */
  private def canonical(graph: LinkGraph): DataFrame =
    graph.edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
              greatest(col("src"), col("dst")).as("b"))
      .distinct()

  /**
   * Top-`k` non-adjacent pairs by Adamic–Adar score.
   * Returns (a, b, common, score) ordered by (score desc, a, b).
   */
  def adamicAdar(graph: LinkGraph, k: Int, maxDegree: Long = Long.MaxValue): DataFrame = {
    // canon feeds three consumers (two und directions + the final anti-join)
    // and `centered` both wedge sides — materialize each once instead of
    // re-running the upstream edge derivation per branch (guide §2.4); the
    // directed doubling is one explode, not a self-union
    val canon = canonical(graph).localCheckpoint(false)
    val und = canon.select(explode(array(
        struct(col("a").as("w"), col("b").as("n")),
        struct(col("b").as("w"), col("a").as("n")))).as("e"))
      .select(col("e.w").as("w"), col("e.n").as("n"))
    val deg = und.groupBy("w").agg(count(lit(1)).as("d"))
    val centered = und.join(deg.filter(col("d") <= maxDegree), "w").localCheckpoint(false)
    val wedges = centered.select(col("w"), col("n").as("u"), col("d"))
      .join(centered.select(col("w"), col("n").as("v")), "w")
      .filter(col("u") < col("v"))
    wedges.groupBy(col("u").as("a"), col("v").as("b"))
      .agg(count(lit(1)).as("common"),
           round(sum(lit(1.0) / log(col("d"))) + 1e-9, 6).as("score"))
      .join(canon, Seq("a", "b"), "left_anti")
      .orderBy(col("score").desc, col("a"), col("b"))
      .limit(k)
  }
}
