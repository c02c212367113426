package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.core.Transcripts
import graft.streaming.TranscriptStream
import graft.streaming.TranscriptStream.TurnEvent

class StreamingSpec extends AnyFunSuite {
  lazy val s = SparkTestBase.spark
  import s.implicits._

  test("streaming edge extraction == batch extraction, across batch boundaries and out-of-order turns") {
    implicit val sq = s.sqlContext
    val t = Transcripts.synthesize(s, 40)
    val events = t.as[Transcripts.Turn].collect()
      .map(x => TurnEvent(x.conv_id, x.turn_idx, x.role, x.text, x.tool, x.ts))

    // shuffle deterministically within conversations and split into 3 batches
    val rnd = new scala.util.Random(7)
    val shuffled = rnd.shuffle(events.toSeq)
    val batches = shuffled.grouped(math.max(shuffled.size / 3, 1)).toSeq

    val input = MemoryStream[TurnEvent]
    val q = TranscriptStream.edges(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_edges")
      .start()
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()

    // compare conv-relative (srcIdx within conv block, dstIdx) pairs:
    // batch ids are dense ranks, streaming ids are hash blocks — both put
    // turn_idx in the low 20 bits
    def relPairs(df: org.apache.spark.sql.DataFrame) = df
      .select(
        (col("src") - (col("src").bitwiseAND(lit(0xFFFFFL)))).as("sblk"),
        col("src").bitwiseAND(lit(0xFFFFFL)).as("si"),
        col("dst").bitwiseAND(lit(0xFFFFFL)).as("di"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val got = relPairs(s.table("stream_edges").dropDuplicates("src", "dst"))
    val want = relPairs(Transcripts.edges(Transcripts.vertices(t)))
    assert(got.size === want.size)
    assert(got.map(x => (x._2, x._3)).groupBy(identity).view.mapValues(_.size).toMap ===
           want.map(x => (x._2, x._3)).groupBy(identity).view.mapValues(_.size).toMap)
  }

  test("watermarked sliding-window tool rates aggregate a replayed stream") {
    implicit val sq = s.sqlContext
    val input = MemoryStream[TurnEvent]
    val base = 1700000000000L
    val q = TranscriptStream.toolRates(input.toDS().toDF())
      .writeStream.outputMode("complete")
      .format("memory").queryName("tool_rates")
      .start()
    input.addData(
      TurnEvent("c1", 1, "assistant", "t", "search", new Timestamp(base)),
      TurnEvent("c2", 1, "assistant", "t", "search", new Timestamp(base + 60000)),
      TurnEvent("c3", 1, "assistant", "t", "bash", new Timestamp(base + 120000)))
    q.processAllAvailable()
    q.stop()
    val rates = s.table("tool_rates")
      .groupBy("tool").agg(max("invocations").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rates("search") === 2L && rates("bash") === 1L)
  }

  test("continuous rank over a growing edge stream equals a cold PageRank on the final graph") {
    implicit val sq = s.sqlContext
    // edges of the reference fixture arriving over 4 micro-batches: the
    // maintainer must warm-start each batch and still land on the exact
    // fixpoint of the FULL graph (sequential reference oracle)
    val all = SparkTestBase.testGraphEdges.map { case (a, b) => graft.core.Edge(a, b, 1.0) }
    val input = MemoryStream[graft.core.Edge]
    val m = new graft.streaming.ContinuousRank.RankMaintainer(numPartitions = 4)
    val q = graft.streaming.ContinuousRank.attach(input.toDS().toDF(), m).start()
    all.grouped(4).foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    val got = m.current.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    m.close()
    val want = SparkTestBase.refPageRank(SparkTestBase.testGraphEdges, tol = 1e-8)
    assert(got.keySet === want.keySet)
    for ((id, w) <- want)
      assert(math.abs(got(id) - w) < 1e-5, s"vertex $id: got ${got(id)}, want $w")
  }

  test("rank maintainer state is BOUNDED: plan size and pinned blocks constant across 20 batches") {
    implicit val sq = s.sqlContext
    // an unbounded stream must not accumulate per-batch state: the
    // maintainer folds each micro-batch into ONE accumulated edge table and
    // ONE rank snapshot, freeing everything the previous batch pinned
    val edges = (1L to 200L).map(i => graft.core.Edge(i, i + 1, 1.0))
    val pinnedBefore = s.sparkContext.getPersistentRDDs.size
    val input = MemoryStream[graft.core.Edge]
    val m = new graft.streaming.ContinuousRank.RankMaintainer(numPartitions = 2)
    val q = graft.streaming.ContinuousRank.attach(input.toDS().toDF(), m).start()
    var planSizes = Vector.empty[Int]
    var pinned = Vector.empty[Int]
    edges.grouped(10).foreach { b =>
      input.addData(b); q.processAllAvailable()
      planSizes :+= m.current.queryExecution.logical.collect { case p => p }.size
      pinned :+= s.sparkContext.getPersistentRDDs.size
    }
    q.stop()
    m.close()
    assert(planSizes.size === 20)
    // constant plan size: the ranks are always one materialized snapshot
    assert(planSizes.distinct.size === 1,
      s"logical plan size grew across batches: $planSizes")
    // pinned-block count bounded: the last 15 batches may not pin more than
    // the 5th did (startup allocates the steady-state set)
    val steady = pinned(4)
    assert(pinned.drop(5).forall(_ <= steady),
      s"persistent RDD count grew across batches: $pinned (steady=$steady)")
    assert(s.sparkContext.getPersistentRDDs.size <= pinnedBefore,
      "close() must release every cache the maintainer added")
  }

  test("streaming exact dedup: final state is batch-boundary invariant (3 batches vs 1)") {
    implicit val sq = s.sqlContext
    case class Doc(doc_id: Long, text: String)
    // planted dup groups whose members land in DIFFERENT micro-batches
    val docs = (1L to 30L).map(i => (i, s"text-${i % 7}"))
    def dedupOver(batches: Seq[Seq[(Long, String)]]): Map[String, (Long, Long)] = {
      val input = MemoryStream[(Long, String)]
      val name = "st_dedup_" + batches.size
      val agg = input.toDS().toDF("doc_id", "text")
        .groupBy(md5(col("text").cast("binary")).as("text_md5"))
        .agg(count("*").as("n_docs"), min("doc_id").as("keeper"))
      val q = agg.writeStream.outputMode("complete").format("memory")
        .queryName(name).start()
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      q.stop()
      s.table(name).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    }
    val threeBatches = dedupOver(docs.grouped(10).toSeq)
    val oneBatch = dedupOver(Seq(docs))
    assert(threeBatches === oneBatch)
    assert(threeBatches.values.map(_._1).sum === 30L)
    // keeper is the group minimum regardless of arrival order
    assert(threeBatches.values.forall { case (_, keeper) => keeper <= 7L })
  }
}
