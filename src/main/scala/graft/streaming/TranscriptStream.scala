package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.Edge

/**
 * Structured-Streaming front end for the transcript graft: turns arrive as a
 * stream and the link graph grows incrementally.
 *
 *  - `edges`: stateful per-conversation extractor
 *    (`flatMapGroupsWithState`): buffers out-of-order turns, drains them in
 *    `turn_idx` order, and emits reply edges (k → k+1) and tool edges
 *    (invoking assistant turn → next same-tool tool turn) exactly as the
 *    batch extractor — batch-boundary invariant.
 *  - `toolRates`: watermarked sliding-window aggregation of tool
 *    invocations (the conventional streaming-agg surface).
 *
 * Streaming vertex ids: a stream cannot assign global dense ranks, so
 * id = mix64(conv_id) & ~0xFFFFF | turn_idx — same low-20-bit turn encoding
 * as the batch scheme, conversation block from a 64-bit string hash.
 */
object TranscriptStream {

  final case class TurnEvent(conv_id: String, turn_idx: Int, role: String,
                             text: String, tool: String, ts: Timestamp)

  /** Buffered per-conversation state: next expected turn, pending turns by
    * idx, last drained turn id, pending tool invocations (tool → src id). */
  final case class ConvState(
      nextIdx: Int,
      lastId: Long,
      pending: Map[Int, (String, String)], // idx -> (role, tool)
      openTools: Map[String, List[Long]])  // tool -> open invoking turn ids

  /**
   * Conversation block from a full 64-bit string hash: two independent
   * 32-bit murmur passes (different seeds) concatenated, then finalized.
   * A single 32-bit hash gives 50% collision odds by ~80k conversations;
   * with 44 effective block bits the birthday bound moves to ~5M live
   * conversations (expected colliding pairs ≈ n²/2^45 — at 10^9
   * conversations route through the batch dense-ordinal scheme or key state
   * by the conv_id string itself, as this extractor does).
   */
  def vertexId(convId: String, turnIdx: Int): Long = {
    import scala.util.hashing.MurmurHash3
    val h1 = MurmurHash3.stringHash(convId, 0xA5A5A5A5).toLong
    val h2 = MurmurHash3.stringHash(convId, 0x5EED5EED).toLong & 0xFFFFFFFFL
    var z = ((h1 << 32) | h2) * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= (z >>> 31)
    (z & ~0xFFFFFL) | (turnIdx & 0xFFFFF)
  }

  private def drain(convId: String, st: ConvState): (ConvState, List[Edge]) = {
    var s = st
    var out = List.empty[Edge]
    while (s.pending.contains(s.nextIdx)) {
      val (role, tool) = s.pending(s.nextIdx)
      val id = vertexId(convId, s.nextIdx)
      if (s.nextIdx > 0) out ::= Edge(s.lastId, id, 1.0) // reply edge
      var open = s.openTools
      if (role == "tool" && tool != null && open.contains(tool)) {
        // every open invocation's nearest later reply is this turn (matches
        // the batch extractor's min_by(rep_idx) per invocation)
        open(tool).foreach(src => if (src != id) out ::= Edge(src, id, 1.0))
        open -= tool
      }
      if (role == "assistant" && tool != null)
        open += (tool -> (open.getOrElse(tool, Nil) :+ id))
      s = ConvState(s.nextIdx + 1, id, s.pending - s.nextIdx, open)
    }
    (s, out)
  }

  /** Incremental edge extraction; dedup of coincident reply/tool edges is the
    * caller's `dropDuplicates` on the sink (idempotent upsert in production). */
  def edges(turns: Dataset[TurnEvent]): Dataset[Edge] = {
    import turns.sparkSession.implicits._
    turns.groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (convId: String, rows: Iterator[TurnEvent], state: GroupState[ConvState]) =>
          val st0 = state.getOption.getOrElse(ConvState(0, -1L, Map.empty, Map.empty))
          val buffered = rows.foldLeft(st0) { (s, t) =>
            s.copy(pending = s.pending + (t.turn_idx -> (t.role, t.tool)))
          }
          val (st1, out) = drain(convId, buffered)
          state.update(st1)
          out.reverseIterator
      }
  }

  /** Tool-invocation rate per sliding window, 10-minute watermark. */
  def toolRates(turns: DataFrame): DataFrame =
    turns.filter(col("role") === "assistant" && col("tool").isNotNull)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes", "1 minute"), col("tool"))
      .agg(count("*").as("invocations"))
}
