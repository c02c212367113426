package graft.queries

import java.nio.file.Files
import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.{MtxReader, TextEdgeList}
import graft.streaming.TranscriptStream
import graft.streaming.TranscriptStream.TurnEvent

/**
 * Driver-gated queries for the two surfaces that previously lived only in
 * sbt tests: the Structured-Streaming front end and the text/binary edge-list
 * I/O round-trips. Each runs the REAL machinery (a streaming query with
 * micro-batches / an actual file write+read) and lands on a deterministic,
 * SQL-replayable result so DuckDB can gate it.
 */
object StreamIoQueries {
  import EventGraph._

  /** Run a streaming DataFrame to a uniquely-named memory sink with
    * Trigger.AvailableNow and return the sink's contents. */
  private def runToMemory(df: DataFrame, mode: String): DataFrame = {
    val name = "sink_" + UUID.randomUUID().toString.replace("-", "")
    val q = df.writeStream.outputMode(mode).format("memory")
      .queryName(name).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    df.sparkSession.table(name)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Watermarked tumbling-window aggregation as a STREAM over the events
    // table (file source, AvailableNow). Complete mode to a memory sink: the
    // final trigger's state equals the batch group-by, which is what the
    // oracle replays (windows align to the epoch, so start = ⌊epoch/300⌋·300).
    "st_rates" -> ((s, dir) => {
      val schema = events(s, dir).schema
      // the file-stream source wants a DIRECTORY; the sf tables are single
      // parquet files, so stage a link/copy into a temp dir
      val src = java.nio.file.Paths.get(s"$dir/events.parquet")
      val streamDir =
        if (java.nio.file.Files.isDirectory(src)) src.toString
        else {
          val d = Files.createTempDirectory("graft-strates")
          try java.nio.file.Files.createSymbolicLink(d.resolve("events.parquet"), src)
          catch { case _: Exception =>
            java.nio.file.Files.copy(src, d.resolve("events.parquet"))
          }
          d.toString
        }
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(streamDir)
        // the table stores TIMESTAMP_NTZ; watermarks need TIMESTAMP, and with
        // the session pinned to UTC the epoch seconds agree with DuckDB's
        // naive reading of the same column
        .withColumn("ts", col("ts").cast("timestamp"))
      val agg = stream.withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
        .agg(count("*").as("n"))
      runToMemory(agg, "complete")
        .select(col("window.start").cast("long").as("w_start"),
          col("event_type"), col("n"))
    }),

    // The INCREMENTAL stateful edge extractor (flatMapGroupsWithState) over a
    // transcript-turn stream derived from events: conv = user, turn = rank-1,
    // even turns "assistant" invoking tool = event_type, odd turns "tool".
    // Turns are scattered across micro-batches by a hash (out-of-order
    // arrival exercises the pending-turn buffer); the emitted reply+tool
    // edges are mapped back to (conv_id, src_turn, dst_turn), which the
    // oracle replays: reply k-1→k, plus each assistant turn → the next
    // same-tool tool-role turn.
    "st_edges" -> ((s, dir) => {
      import s.implicits._
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val turns = events(s, dir).select(
          col("user_id").cast("string").as("conv_id"),
          (row_number().over(byUser) - 1).cast("int").as("turn_idx"),
          col("event_type").as("tool"),
          col("ts"))
        .withColumn("role",
          when(col("turn_idx") % 2 === 0, "assistant").otherwise("tool"))
        .withColumn("text", col("tool"))
      val tmp = Files.createTempDirectory("graft-stedges").toString
      turns.repartition(8, pmod(xxhash64(col("conv_id"), col("turn_idx")), lit(8)))
        .write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(turns.schema)
        .option("maxFilesPerTrigger", 2).parquet(tmp)
      val edges = TranscriptStream.edges(stream.as[TurnEvent]).toDF()
      val out = runToMemory(edges, "append")
      // Scala UDF — the tree's ONE deliberate exemption from its no-UDF rule:
      // vertexId is murmur3+splitmix over (conv_id, turn) with no builtin
      // Column equivalent, and this mapping runs over the K-row RESULT of the
      // streaming query (fixture-scale), never inside the hot path.
      val vid = udf((c: String, t: Int) => TranscriptStream.vertexId(c, t))
      val ids = turns.select(col("conv_id"), col("turn_idx"),
        vid(col("conv_id"), col("turn_idx")).as("vid"))
      out.join(ids.select(col("vid").as("src"), col("conv_id"),
          col("turn_idx").as("src_turn")), "src")
        .join(ids.select(col("vid").as("dst"), col("turn_idx").as("dst_turn")), "dst")
        .select("conv_id", "src_turn", "dst_turn").distinct()
    }),

    // text edge-list round-trip: write the bucket edges as "src dst weight"
    // lines, read them back — the driver-gated proof the sink and source
    // invert each other
    "io_text" -> ((s, dir) => {
      val tmp = Files.createTempDirectory("graft-iotext").toString + "/edges"
      TextEdgeList.write(bucketEdges(events(s, dir)), tmp)
      TextEdgeList.read(s, tmp)
        .select(col("src"), col("dst"), round(col("weight") + 1e-9, 6).as("weight"))
    }),

    // binary mtx round-trip: int32 header + records through MtxReader.write /
    // readMtx (the reference's WriteEdges/ReadEdges format)
    "io_mtx" -> ((s, dir) => {
      val tmp = Files.createTempDirectory("graft-iomtx").toString + "/edges.mtx"
      MtxReader.write(richEdges(events(s, dir)), tmp)
      MtxReader.readMtx(s, tmp).edges
        .select(col("src"), col("dst"), col("weight").cast("long").as("weight"))
    }),

    // Continuous PageRank over a GROWING edge stream (foreachBatch +
    // DeltaPageRank.warmStart — streaming/ContinuousRank.scala): the bucket
    // edges arrive in micro-batches scattered by (src,dst) hash, so every
    // batch extends many chains at once and each trigger warm-starts from
    // the previous ranks, converging only the affected region. At quiescence
    // the maintainer's ranks must equal the FULL graph's exact fixpoint —
    // the same closed form the batch g_deltapr oracle replays — proving the
    // streaming composition lands on truth, not near it.
    "st_rank" -> ((s, dir) => {
      val edges = bucketEdges(events(s, dir))
      val tmp = Files.createTempDirectory("graft-strank").toString
      edges.repartition(4, pmod(xxhash64(col("src"), col("dst")), lit(4)))
        .write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(edges.schema)
        .option("maxFilesPerTrigger", 1).parquet(tmp)
      val m = new graft.streaming.ContinuousRank.RankMaintainer()
      val q = graft.streaming.ContinuousRank.attach(stream, m)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val out = m.current
        .select(col("id"), round(col("pagerank") + 1e-9, 6).as("pr"))
        .localCheckpoint(true)
      m.close()
      out
    }),

    // streaming exact dedup — the ingest-time twin of d_dedup_exact: the
    // documents table arrives as micro-batches (rows scattered across files
    // by doc_id hash, so batch boundaries cut through every dup group) and
    // a streaming groupBy(content hash) keeps (keeper = min doc_id, count).
    // Complete mode to a memory sink: the final trigger's state equals the
    // batch group-by regardless of arrival order, which is what the oracle
    // replays. At 100 TB the same plan runs in update mode with the state
    // store sharded by hash; keeper-by-min makes late arrivals idempotent.
    "st_dedup" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val tmp = Files.createTempDirectory("graft-stdedup").toString
      docs.repartition(8, pmod(xxhash64(col("doc_id")), lit(8)))
        .write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 2).parquet(tmp)
      val agg = stream
        .groupBy(md5(col("text").cast("binary")).as("text_md5"))
        .agg(count("*").as("n_docs"), min("doc_id").as("keeper"))
      runToMemory(agg, "complete")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "st_rates" ->
      """SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS w_start,
        |       event_type, count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,

    "st_edges" ->
      """WITH t AS (
        |  SELECT CAST(user_id AS VARCHAR) AS conv_id,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS turn,
        |         event_type AS tool
        |  FROM events),
        |turns AS (
        |  SELECT conv_id, turn, tool,
        |         CASE WHEN turn % 2 = 0 THEN 'assistant' ELSE 'tool' END AS role
        |  FROM t),
        |reply AS (
        |  SELECT conv_id, turn - 1 AS src_turn, turn AS dst_turn
        |  FROM turns WHERE turn > 0),
        |tooledge AS (
        |  SELECT a.conv_id, a.turn AS src_turn, min(b.turn) AS dst_turn
        |  FROM turns a JOIN turns b
        |    ON b.conv_id = a.conv_id AND b.turn > a.turn
        |   AND b.role = 'tool' AND b.tool = a.tool
        |  WHERE a.role = 'assistant'
        |  GROUP BY 1, 2)
        |SELECT DISTINCT conv_id, CAST(src_turn AS INT) AS src_turn, CAST(dst_turn AS INT) AS dst_turn
        |FROM (SELECT * FROM reply UNION ALL SELECT * FROM tooledge)""".stripMargin,

    "io_text" -> (EventGraph.sqlBase +
      "SELECT src, dst, round(weight + 1e-9, 6) AS weight FROM bucket"),

    "io_mtx" -> (EventGraph.sqlBase +
      "SELECT src, dst, CAST(1 AS BIGINT) AS weight FROM rich"),

    // identical to the g_deltapr closed form: chains are trees, so the
    // delta fixpoint is the geometric series 1 - 0.7^position
    "st_rank" -> (EventGraph.sqlBase +
      """, mrn AS (
        |  SELECT src AS id, user_id, bkt, rn FROM bucket
        |  UNION SELECT dst, user_id, bkt, rn + 1 FROM bucket)
        |SELECT id,
        |  round(1 - pow(0.7, rn - min(rn) OVER (PARTITION BY user_id, bkt) + 1) + 1e-9, 6) AS pr
        |FROM mrn""".stripMargin),

    "st_dedup" ->
      "SELECT md5(text) AS text_md5, count(*) AS n_docs, min(doc_id) AS keeper FROM documents GROUP BY 1"
  )
}
