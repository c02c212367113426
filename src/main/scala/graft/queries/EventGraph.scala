package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.LinkGraph

/**
 * Deterministic link-graph derivations over the driver's `events` table —
 * the oracle-checkable stand-in for the transcript front end (same shape:
 * an actor stream with a stable ordering key). Every derivation here has an
 * exact SQL twin in QueryCatalog.oracleSql, so DuckDB can replay it.
 *
 * events(event_id, ts, user_id, event_type, value, props):
 *  - rn: row_number over (user_id ORDER BY ts, event_id) — the stable order
 *  - chain edges: rn → rn+1 within a user (the transcript reply edge)
 *  - skip edges:  rn → rn+2 within a user (second-order context link)
 *  - type edges:  consecutive same-type events within a user (the tool link)
 *  - bucket edges: chain edges that stay within ⌊(rn-1)/10⌋ buckets — bounded-
 *    diameter components for convergence-gated algorithms
 */
object EventGraph {

  def events(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/events.parquet")

  private val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
  private val byUserType = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")

  /** chain ∪ skip ∪ type, deduplicated — the rich graph for PageRank/degree/LP/triangles.
    *
    * Single-pass shape (r06, guide §2.4): the old form union'd three
    * filter/project branches of the same windowed base, and Catalyst executes
    * each union branch separately — ReuseExchange dedups the window's shuffle
    * write, but the sort + two window operators re-ran once per branch (3x).
    * One `explode` over the three lead columns yields the identical row
    * multiset (nulls dropped) from ONE evaluation of the windows, and the
    * `distinct` then sees the same set. Plan: 3 window/sort evaluations +
    * union → 1; same Exchange count at the distinct. */
  def richEdges(ev: DataFrame): DataFrame =
    ev.select(
        col("event_id"),
        lead("event_id", 1).over(byUser).as("nxt1"),
        lead("event_id", 2).over(byUser).as("nxt2"),
        lead("event_id", 1).over(byUserType).as("nxtT"))
      .select(col("event_id").as("src"),
        explode(array(col("nxt1"), col("nxt2"), col("nxtT"))).as("dst"))
      .filter(col("dst").isNotNull)
      .distinct().withColumn("weight", lit(1.0))

  /** Chain edges confined to 10-row buckets; weight = 1 + |value(dst)|. */
  def bucketEdges(ev: DataFrame): DataFrame =
    ev.select(
        col("event_id"),
        row_number().over(byUser).as("rn"),
        lead("event_id", 1).over(byUser).as("nxt"),
        lead("value", 1).over(byUser).as("nxtVal"))
      .filter(col("nxt").isNotNull && (col("rn") % 10 =!= 0))
      .select(col("event_id").as("src"), col("nxt").as("dst"),
              (lit(1.0) + abs(col("nxtVal"))).as("weight"))

  /** Head event of every bucket chain that has at least one edge (the
    * vertices of bucketEdges at chain position 1) — shares byUser so the
    * selection can never diverge from the graph derivation. */
  def bucketHeads(ev: DataFrame): DataFrame =
    ev.select(
        col("event_id"),
        row_number().over(byUser).as("rn"),
        lead("event_id", 1).over(byUser).as("nxt"))
      .filter((col("rn") - 1) % 10 === 0 && col("nxt").isNotNull)
      .select("event_id")

  /** The first `k` edges of every bucket chain — the deterministic "graph
    * before growth" for the warm-start gate: adding the remaining bucket
    * edges extends each chain's tail with brand-new vertices AND re-seeds
    * the junction vertex, exactly the shape of an ingest batch. */
  def bucketPrefixEdges(ev: DataFrame, k: Int): DataFrame =
    ev.select(
        col("event_id"),
        row_number().over(byUser).as("rn"),
        lead("event_id", 1).over(byUser).as("nxt"),
        lead("value", 1).over(byUser).as("nxtVal"))
      .filter(col("nxt").isNotNull && (col("rn") % 10 =!= 0) &&
              ((col("rn") - 1) % 10 < k))
      .select(col("event_id").as("src"), col("nxt").as("dst"),
              (lit(1.0) + abs(col("nxtVal"))).as("weight"))

  /** Every bucket chain WITHOUT its first `k` edges — the "graph after
    * deletion" for the shrink gate: each surviving chain head just LOST its
    * in-edge, so its rank must fall from 1−0.7^2 back to 0.3 and the
    * correction cascade NEGATIVE residuals down the whole chain. */
  def bucketSuffixEdges(ev: DataFrame, k: Int): DataFrame =
    ev.select(
        col("event_id"),
        row_number().over(byUser).as("rn"),
        lead("event_id", 1).over(byUser).as("nxt"),
        lead("value", 1).over(byUser).as("nxtVal"))
      .filter(col("nxt").isNotNull && (col("rn") % 10 =!= 0) &&
              ((col("rn") - 1) % 10 >= k))
      .select(col("event_id").as("src"), col("nxt").as("dst"),
              (lit(1.0) + abs(col("nxtVal"))).as("weight"))

  /**
   * Directed CYCLIC bucket graph — the SCC fixture. Each 10-row bucket is
   * closed into a cycle (its chain edges plus one wrap edge last→first),
   * with forward chords rn→rn+2 and rn→rn+4 inside the bucket to keep the
   * cycle's diameter small, and one cross edge from each bucket's first
   * vertex to the next bucket's first vertex — confined to groups of 8
   * buckets, so each weakly-connected piece is a path of ≤8 cycles and the
   * graph diameter is BOUNDED at any events-per-user (an unbounded cross
   * chain would make the SCC refinement's first forward HashMin walk the
   * whole user stream). Every cross edge goes strictly forward in bucket
   * order, so the SCCs are EXACTLY the buckets and the oracle has the
   * closed form scc = min(event_id) per (user_id, bucket) —
   * algorithm-independent, no unrolling.
   */
  def cyclicBucketEdges(ev: DataFrame): DataFrame = {
    // Two-pass shape (r06, guide §2.4): the old form union'd FIVE branches
    // over the windowed base (chain/chord2/chord4 plus wrap/cross over a
    // second 3-window `marked` frame), re-evaluating the window pipeline per
    // branch. Now: one explode emits the three chord families from a single
    // base evaluation, and wrap+cross come from ONE per-bucket aggregate
    // (min_by/max_by over rn ≡ the old first/last-over-window) with one lead
    // window for the cross edges — identical row sets, branch by branch.
    val base = ev.select(
        col("event_id"), col("user_id"),
        row_number().over(byUser).as("rn"),
        lead("event_id", 1).over(byUser).as("nxt1"),
        lead("event_id", 2).over(byUser).as("nxt2"),
        lead("event_id", 4).over(byUser).as("nxt4"))
      .withColumn("bkt", floor((col("rn") - 1) / 10).cast("long"))
    val chords = base.select(col("event_id").as("src"),
        explode(array(
          when(col("nxt1").isNotNull && col("rn") % 10 =!= 0, col("nxt1")),
          when(col("nxt2").isNotNull && (col("rn") - 1) % 10 <= 7, col("nxt2")),
          when(col("nxt4").isNotNull && (col("rn") - 1) % 10 <= 5, col("nxt4")))).as("dst"))
      .filter(col("dst").isNotNull)
    // per-bucket summary: first/last event in rn order + bucket size
    val bsum = base.groupBy(col("user_id"), col("bkt")).agg(
      min_by(col("event_id"), col("rn")).as("first_id"),
      max_by(col("event_id"), col("rn")).as("last_id"),
      count(lit(1)).as("bsz"))
    val wU = Window.partitionBy("user_id").orderBy("bkt")
    val wrapCross = bsum.select(
        col("first_id"), col("last_id"), col("bsz"), col("bkt"),
        lead("first_id", 1).over(wU).as("nfid"),
        lead("bsz", 1).over(wU).as("nbsz"))
      .select(explode(array(
        // wrap edge last→first (cycles need ≥2 vertices)
        when(col("bsz") >= 2,
          struct(col("last_id").as("src"), col("first_id").as("dst"))),
        // cross edge first→next bucket's first; group boundary: cut every
        // 8th cross edge — EXCEPT into a trailing singleton bucket (wrap
        // needs ≥2, so cutting would isolate that vertex; keeping it adds
        // ≤1 hop to the group)
        when(col("nfid").isNotNull && (col("bkt") % 8 =!= 7 || col("nbsz") === 1),
          struct(col("first_id").as("src"), col("nfid").as("dst"))))).as("e"))
      .filter(col("e").isNotNull)
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    // the four sets are pairwise disjoint by construction (distinct rn gaps;
    // wrap runs backward; cross spans a 10-row boundary chain never crosses)
    chords.union(wrapCross).withColumn("weight", lit(1.0))
  }

  def richGraph(spark: SparkSession, dir: String): LinkGraph =
    LinkGraph(richEdges(events(spark, dir)))

  def bucketGraph(spark: SparkSession, dir: String): LinkGraph =
    LinkGraph(bucketEdges(events(spark, dir)))

  /** Shared SQL WITH-clause prologue for the DuckDB oracles (kept in one
    * place so every oracle uses identical derivations). */
  val sqlBase: String =
    """WITH base AS (
      |  SELECT event_id,
      |         lead(event_id,1) OVER w AS nxt1,
      |         lead(event_id,2) OVER w AS nxt2,
      |         lead(event_id,1) OVER wt AS nxtt,
      |         lead(value,1)    OVER w AS nxtval,
      |         row_number()     OVER w AS rn,
      |         user_id, value
      |  FROM events
      |  WINDOW w  AS (PARTITION BY user_id ORDER BY ts, event_id),
      |         wt AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
      |),
      |rich AS (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT event_id AS src, nxt1 AS dst FROM base WHERE nxt1 IS NOT NULL
      |    UNION ALL SELECT event_id, nxt2 FROM base WHERE nxt2 IS NOT NULL
      |    UNION ALL SELECT event_id, nxtt FROM base WHERE nxtt IS NOT NULL)
      |),
      |rv AS (SELECT DISTINCT id FROM (SELECT src AS id FROM rich UNION ALL SELECT dst FROM rich)),
      |bucket AS (
      |  SELECT event_id AS src, nxt1 AS dst, 1.0 + abs(nxtval) AS weight,
      |         user_id, rn, CAST(floor((rn-1)/10) AS BIGINT) AS bkt
      |  FROM base WHERE nxt1 IS NOT NULL AND rn % 10 <> 0
      |)
      |""".stripMargin
}
