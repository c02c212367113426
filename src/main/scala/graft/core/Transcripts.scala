package graft.core

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
// (Window still used by `edges`' per-conversation lead)

/**
 * The graft-specific front end (SURVEY.md §7.2): multi-turn conversation /
 * agent transcripts — Iceberg table shape
 * `(conv_id string, turn_idx int, role string, text string, tool string, ts timestamp)`
 * — from which the link graph is derived.
 *
 * At production scale this is `spark.read.format("iceberg").load(table)`;
 * in this sandbox (no Iceberg jars) the same schema is read from parquet or
 * synthesized deterministically below.
 */
object Transcripts {

  final case class Turn(
      conv_id: String, turn_idx: Int, role: String,
      text: String, tool: String, ts: Timestamp)

  private val toolVocab = Array(
    "search", "search", "search", "search",   // Zipf-ish skew: hub tools
    "read", "read", "bash", "python", "edit", "browse")

  /**
   * Deterministic seeded synthesis — NO external data. `conversations`
   * conversations of 3..maxTurns turns; roles cycle user → assistant
   * [→ tool]; every 2nd assistant turn invokes a tool drawn with skew from a
   * fixed vocabulary (creates hot vertices for the skew path).
   * text = "conv:turn:role:<seeded suffix>" so equality checks are meaningful.
   */
  def synthesize(spark: SparkSession, conversations: Int, maxTurns: Int = 12,
                 seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val epoch = 1700000000000L
    val nPart = math.max(spark.sessionState.conf.numShufflePartitions,
                         math.min(conversations / 1000 + 1, 256))
    spark.range(0, conversations.toLong, 1, nPart).as[Long].flatMap { c =>
      // splitmix64-style per-conversation PRNG: deterministic, partition-count invariant
      var s = seed ^ (c * 0x9E3779B97F4A7C15L)
      def next(): Long = {
        s += 0x9E3779B97F4A7C15L
        var z = s
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^ (z >>> 31)
      }
      val convId = f"c$c%08d"
      val nTurns = 3 + (math.abs(next()) % (maxTurns - 2)).toInt
      var assistantCount = 0
      var pendingTool: String = null
      (0 until nTurns).map { t =>
        val (role, tool) =
          if (pendingTool != null) { val tl = pendingTool; pendingTool = null; ("tool", tl) }
          else if (t % 2 == 0) ("user", null)
          else {
            assistantCount += 1
            if (assistantCount % 2 == 0) {
              val tl = toolVocab((math.abs(next()) % toolVocab.length).toInt)
              pendingTool = tl
              ("assistant", tl)
            } else ("assistant", null)
          }
        val suffix = java.lang.Long.toHexString(next())
        Turn(convId, t, role, s"$convId:$t:$role:$suffix", tool,
             new Timestamp(epoch + c * 86400000L + t * 60000L))
      }
    }.toDF()
  }

  /**
   * Vertex table: dense stable vertex id per turn. Stable ordering key is
   * (conv_id, turn_idx) — the per-row invariant "per-turn text equality under
   * stable turn ordering" is tested by re-projecting turns from this table.
   *
   * Scale note: the id is built hierarchically — dense conversation ordinals
   * (DenseRank: range-partition + zipWithIndex, NO single-partition window),
   * then id = convOrd * 2^20 + turn_idx. Collision-free for conversations
   * under 2^20 turns (transcripts are), monotone in the stable ordering, and
   * every stage stays fully parallel at 10^9-conversation scale.
   */
  def vertices(transcripts: DataFrame): DataFrame = {
    val convs = DenseRank.denseOrdBy(
      transcripts.select("conv_id").distinct(), "conv_ord", col("conv_id"))
    transcripts.join(convs, "conv_id")
      .withColumn("id", col("conv_ord") * (1L << 20) + col("turn_idx"))
      .drop("conv_ord")
  }

  /**
   * Edge extraction (SURVEY.md §7.2):
   *  - reply edges: turn k → turn k+1 within a conversation (window lead);
   *  - tool edges: invoking assistant turn (tool != null) → the next turn in
   *    the same conversation with role='tool' and the same tool name.
   * Both deterministic. Weight 1.0.
   */
  def edges(verts: DataFrame): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    val reply = verts
      .withColumn("nxt", lead(col("id"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("id").as("src"), col("nxt").as("dst"), lit(1.0).as("weight"))
    val invokes = verts.filter(col("role") === "assistant" && col("tool").isNotNull)
      .select(col("conv_id"), col("turn_idx").as("inv_idx"), col("id").as("src"), col("tool"))
    val replies = verts.filter(col("role") === "tool")
      .select(col("conv_id"), col("turn_idx").as("rep_idx"), col("id").as("dst"), col("tool"))
    val toolEdges = invokes.join(replies, Seq("conv_id", "tool"))
      .filter(col("rep_idx") > col("inv_idx"))
      .groupBy(col("src"))
      .agg(min_by(col("dst"), col("rep_idx")).as("dst"))
      .select(col("src"), col("dst"), lit(1.0).as("weight"))
    reply.union(toolEdges).dropDuplicates("src", "dst")
  }

  /** Convenience: transcripts → LinkGraph. */
  def toGraph(transcripts: DataFrame, numPartitions: Int = 0): LinkGraph =
    LinkGraph(edges(vertices(transcripts)), numPartitions)
}
