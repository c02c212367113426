package graft.engine

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.LinkGraph

/**
 * Message direction — the reference's `edges_t` order flag
 * (`include/GraphProgram.h:33`, dispatch `GraphMatRuntime.h:160-176`).
 * GraphMat's tiles store row=src, col=dst (`DCSCTile.h:241-275`), so:
 *  - OUT_EDGES → SpMTSpV over `AT` (`SPMV.h:80-95`): message travels along
 *    the sender's out-edges; receiver = dst.
 *  - IN_EDGES → SpMSpV over `A` (`SPMV.h:63-78`): receiver = src, gathering
 *    from its out-neighbors (so the bundled Degree program computes
 *    OUT-degree — `src/PageRank.cpp:53-79`).
 *  - ALL_EDGES → both reduced into one result (`GraphMatRuntime.h:168-175`).
 */
sealed trait Direction
object Direction {
  case object Out extends Direction
  case object In extends Direction
  case object All extends Direction
}

/** `ALL_VERTICES` vs `ACTIVE_ONLY` (`include/GraphProgram.h:36`). */
sealed trait Activity
object Activity {
  case object AllVertices extends Activity
  case object ActiveOnly extends Activity
}

/**
 * A vertex program over column expressions — the Spark-native re-expression
 * of `GraphProgram<T,U,V,E>` (`include/GraphProgram.h:38-101`). Everything is
 * declarative DataFrame algebra so Catalyst/Tungsten keep the whole superstep
 * in codegen; no Scala UDFs in the hot path.
 *
 * State contract: `(id: long, active: boolean, <program columns>)`.
 *
 *  - `send`: frontier (state rows to send from) → messages `(id, <msg cols>)`
 *    where id = SENDER. The reference's `send_message` bool gate is a
 *    `.filter`. Msg col names must avoid `id/src/dst/weight/_send/_recv`.
 *  - `gather`: per-edge transform of the routed frame
 *    `(_send, _recv, weight, <msg cols>[, v_<state> when needsRecvState])` —
 *    the ⊗ (`process_message`). Default identity.
 *  - `reduce`: routed frame → `(_recv, <acc cols>)`, normally
 *    `Reduce.byAggs(...)` — the ⊕ (`reduce_function`); must be
 *    commutative+associative (Spark's partial+final agg = the reference's
 *    per-thread partials + cross-rank `union_received`).
 *  - `apply`: (state cols ++ acc cols (null when nothing received), iteration)
 *    → new state incl. `active` and a boolean `_changed`. The reference calls
 *    `apply` ONLY for vertices that received a message and derives `changed`
 *    from `operator!=` (`GraphMatRuntime.h:195-225`) — replicate by keying
 *    changes off acc nullability.
 */
final case class VertexProgramSpec(
    direction: Direction,
    activity: Activity,
    send: DataFrame => DataFrame,
    reduce: DataFrame => DataFrame,
    apply: (DataFrame, Int) => DataFrame,
    gather: DataFrame => DataFrame = identity,
    needsRecvState: Boolean = false,
    maxIterations: Int = -1, // -1 = UNTIL_CONVERGENCE (`GraphMatRuntime.h:51`)
    /** false = fixed-iteration run: skip the per-superstep changed-count job
      * (one action instead of two); convergence is then budget-only. */
    trackChanges: Boolean = true,
    /** Fixed-iteration runs only (`trackChanges=false`, no checkpointing):
      * number of supersteps to CHAIN lazily before materializing, executing a
      * segment as ONE pipelined Spark job. MEASURED on the 7.8M-edge bench
      * graph (SqlProbe): k=1 6.18s, k=2 6.15s, k=4 11.6s for 5 supersteps —
      * ReuseExchange does dedup each intermediate state's ⊕ exchange, but
      * everything ABOVE the exchange (sort-merge of the apply join, the apply
      * projection) re-executes once per consuming branch and the branch count
      * doubles per chained superstep, so chaining k>2 LOSES. Default 1; the
      * knob stays for narrow-state programs where the recompute is cheaper
      * than the job-launch + checkpoint serialization it saves.
      * Tracked/checkpointed runs pin this to 1 (the changed count is an
      * action per superstep by definition).
      * Default 0 = AUTO (r06): chain 2 when the graph's partition count sits
      * BELOW the session's shuffle width (a small graph, where the
      * per-superstep floor is Catalyst planning + job latency and halving
      * the action count halves the floor), 1 once the size-adaptive
      * partitioning hits the cap (a large graph, where the recompute above
      * the reused exchange is real data — measured at 7.8M edges k=2 swings
      * between ~equal and 40% SLOWER with the host window, so big graphs
      * keep one job per superstep). Explicit values are honored as given. */
    chainDepth: Int = 0)

object Reduce {
  /** Standard ⊕ as aggregate expressions over the gathered frame, grouped by receiver. */
  def byAggs(aggs: Column*): DataFrame => DataFrame =
    df => df.groupBy("_recv").agg(aggs.head, aggs.tail: _*)

  /**
   * Two-phase salted ⊕ for hub receivers: pre-aggregate on (_recv, salt) —
   * the salt hashes the SENDER, so a hub's in-messages split into `salts`
   * independent partials — then fold the partials by _recv. For Spark's
   * algebraic aggregates (sum/min/max/count) map-side partial aggregation
   * already bounds hub fan-in to one row per map task, so `byAggs` is the
   * right default there; use this for ⊕ whose partials the planner cannot
   * form itself (collect-style or high-cardinality intermediate state).
   * `partial` runs over the raw messages grouped by (_recv, _salt);
   * `merge` folds the partial columns grouped by _recv.
   */
  def saltedByAggs(salts: Int, partial: Seq[Column], merge: Seq[Column]): DataFrame => DataFrame =
    df => df
      .groupBy(col("_recv"), pmod(xxhash64(col("_send")), lit(salts.toLong)).as("_salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy("_recv")
      .agg(merge.head, merge.tail: _*)
}

final case class IterationMetrics(iteration: Int, changed: Long, millis: Long)

final case class RunResult(
    state: DataFrame, iterations: Int, converged: Boolean,
    metrics: Seq[IterationMetrics])

/**
 * Durable checkpoint/resume (north rule): every `every` supersteps the full
 * vertex state (the frontier is its `active` column) is snapshotted to
 * `dir/runId/iter=N/state` as parquet, with per-partition row counts and
 * per-iteration metrics appended to `dir/runId/metrics.jsonl` and a
 * `latest.json` pointer enabling mid-algorithm resume. In production these
 * are Iceberg table snapshots; all durable IO goes through `store`
 * ([[SnapshotStore]]) so the Iceberg rendering is a drop-in — the default
 * [[HadoopSnapshotStore]] is the parquet-with-manifest sandbox stand-in
 * (no Iceberg jars in this image).
 */
final case class CheckpointConfig(dir: String, runId: String, every: Int = 8,
                                  store: SnapshotStore = HadoopSnapshotStore)

object Superstep {

  def run(graph: LinkGraph, init: DataFrame, spec: VertexProgramSpec,
          cp: Option[CheckpointConfig] = None): RunResult =
    loop(graph, init, spec, cp, startIteration = 0, priorMetrics = Nil)

  /** Resume a checkpointed run mid-algorithm from its latest snapshot. */
  def resume(graph: LinkGraph, spec: VertexProgramSpec, cp: CheckpointConfig): RunResult = {
    val spark = graph.edges.sparkSession
    val sc = spark.sparkContext
    val txt = cp.store.readText(sc, s"${cp.dir}/${cp.runId}/latest.json")
      .getOrElse(throw new java.util.NoSuchElementException(
        s"no committed checkpoint at ${cp.dir}/${cp.runId}/latest.json"))
    val iter = """"iteration"\s*:\s*(\d+)""".r.findFirstMatchIn(txt).get.group(1).toInt
    val state = cp.store.readState(spark, s"${cp.dir}/${cp.runId}/iter=$iter/state")
    // carry forward the pre-crash iteration history so metrics.jsonl stays complete
    val lineRe = """\{"iteration":(\d+),"changed":(-?\d+),"millis":(\d+)\}""".r
    val prior = cp.store.readText(sc, s"${cp.dir}/${cp.runId}/metrics.jsonl")
      .map(_.linesIterator.toSeq.collect {
        case lineRe(i, c, m) if i.toInt <= iter =>
          IterationMetrics(i.toInt, c.toLong, m.toLong)
      }).getOrElse(Nil)
    loop(graph, state, spec, Some(cp), startIteration = iter, priorMetrics = prior)
  }

  private def loop(graph: LinkGraph, init: DataFrame, spec: VertexProgramSpec,
                   cp: Option[CheckpointConfig], startIteration: Int,
                   priorMetrics: Seq[IterationMetrics]): RunResult = {
    val n = graph.numPartitions
    val stateCols = init.columns.toSeq
    require(stateCols.contains("id") && stateCols.contains("active"),
      s"state needs id+active, got $stateCols")
    require(spec.maxIterations >= 0 || spec.trackChanges,
      "trackChanges=false with maxIterations<0 can never converge (the changed count is the only stop rule)")

    // AQE re-plans and re-compiles codegen for every superstep's jobs, which
    // at graph scale costs more than it saves (measured ~2x per-superstep
    // wall); the loop's plans are static, so pin it off for the duration.
    // With AQE off the loop's ⊕/join exchanges fall back to the session's
    // spark.sql.shuffle.partitions — a constant (the core count in the
    // bench) that at fixture scale costs hundreds of near-empty tasks per
    // superstep. Pin it to the graph's own partition count for the loop:
    // that is the engine's one size-adaptive knob (LinkGraph derives it from
    // input bytes, capped at the session conf), so every per-superstep
    // exchange matches the state/edge partitioning — same width at scale,
    // far fewer tasks on small graphs, and the ⊕ output arrives already
    // co-partitioned with the state for the apply join (guide §2.2, §2.4).
    val spark = init.sparkSession
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val shufBefore = spark.conf.get("spark.sql.shuffle.partitions", "200")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try {

    // `cached` is always the exact DataFrame persist() was called on (the
    // only handle unpersist() frees); `state` may be a cheap projection of it.
    // localCheckpoint()ed states need separate handling: their storage is an
    // RDD-level persist that Dataset.unpersist (a CacheManager lookup) cannot
    // free, so we capture the backing RDD handles via a before/after diff of
    // getPersistentRDDs and unpersist those directly — otherwise every
    // superstep's serialized blocks linger until driver GC notices.
    val sc = spark.sparkContext
    var cached = init.repartition(n, col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    cached.count()
    var state = cached
    var cachedRdds: Iterable[org.apache.spark.rdd.RDD[_]] = Nil

    val metrics = ArrayBuffer[IterationMetrics](priorMetrics: _*)
    var iter = startIteration
    var converged = false

    // Effective chain length: only fixed-iteration, non-checkpointed runs can
    // defer materialization; 3-op programs put state in the plan 3x per
    // superstep (frontier + recv-state + apply join), so cap their growth.
    // chainDepth 0 = AUTO (see the field doc): chain small graphs only.
    val requested =
      if (spec.chainDepth > 0) spec.chainDepth
      else if (n < scala.util.Try(shufBefore.toInt).getOrElse(200)) 2
      else 1
    val chain =
      if (spec.trackChanges || cp.isDefined) 1
      else if (spec.needsRecvState) math.min(requested, 2)
      else math.max(1, requested)
    var sinceMat = 0

    while (!converged && (spec.maxIterations < 0 || iter - startIteration < spec.maxIterations)) {
      val t0 = System.nanoTime()

      val frontier = spec.activity match {
        case Activity.AllVertices => state
        case Activity.ActiveOnly  => state.filter(col("active"))
      }
      val msgs = spec.send(frontier)
      val routed = route(graph, msgs, spec.direction)
      val withRecvState =
        if (spec.needsRecvState) {
          val vp = state.select(
            (col("id").as("_recv") +: stateCols.filterNot(c => c == "id" || c == "active")
              .map(c => col(c).as(s"v_$c"))): _*)
          routed.join(vp, "_recv")
        } else routed
      val acc = spec.reduce(spec.gather(withRecvState))

      val accCols = acc.columns.filterNot(_ == "_recv").toSeq
      val s = state.alias("s")
      val a = acc.alias("a")
      val joined = s.join(a, col("s.id") === col("a._recv"), "left_outer")
        .select(stateCols.map(c => col(s"s.$c")) ++ accCols.map(c => col(s"a.$c")): _*)

      val applied = spec.apply(joined, iter)
      require(applied.columns.contains("_changed"), "apply must emit _changed")

      iter += 1
      val isLast = spec.maxIterations >= 0 && iter - startIteration >= spec.maxIterations
      var changed = -1L
      if (sinceMat + 1 >= chain || isLast || spec.trackChanges) {
        // Materialize: localCheckpoint truncates the lineage — `apply` joins
        // the state with an aggregate derived from the same state, so without
        // truncation the logical plan doubles per iteration (exponential
        // analysis time past the chain window). This is the reference's
        // scratch-vector reuse analog (SURVEY.md §4).
        // LAZY checkpoint + one explicit action = ONE job that computes every
        // superstep since the last materialization AND (tracked mode) the
        // changed count — the count reads the freshly persisted blocks in the
        // same job, not a second pass over the superstep's shuffles.
        // SERIALIZED storage is load-bearing: deserialized checkpoints keep
        // ~|V| live row objects resident per superstep and G1 old-gen
        // collection dominates task time (measured 70-90% GC); serialized =
        // one byte buffer per partition block.
        val rddsBefore = sc.getPersistentRDDs.keySet
        val persisted = applied.localCheckpoint(false, StorageLevel.MEMORY_AND_DISK_SER)
        changed =
          if (spec.trackChanges) persisted.filter(col("_changed")).count()
          else { persisted.count(); -1L }

        cached.unpersist()
        cachedRdds.foreach(_.unpersist(blocking = false))
        cachedRdds = sc.getPersistentRDDs.collect {
          case (id, r) if !rddsBefore.contains(id) => r
        }
        cached = persisted
        state = persisted.drop("_changed")
        sinceMat = 0
      } else {
        // Chained superstep: stays lazy; the previous materialized state
        // (`cached`) must remain persisted — every lazy superstep in the
        // segment reads it — so no unpersist until the next materialization.
        state = applied.drop("_changed")
        sinceMat += 1
      }

      converged = changed == 0
      metrics += IterationMetrics(iter, changed, (System.nanoTime() - t0) / 1000000)
      if (sys.env.contains("SPARK_GRAFT_ITERLOG"))
        System.err.println(s"[superstep] n=$n iter=$iter changed=$changed ms=${metrics.last.millis}")

      cp match {
        case Some(c) if iter % c.every == 0 || converged =>
          val reloaded = snapshot(c, iter, state, metrics.toSeq)
          cached.unpersist()
          cachedRdds.foreach(_.unpersist(blocking = false))
          cachedRdds = Nil
          cached = reloaded
          state = reloaded
        case _ => // durable snapshots only at the configured cadence
      }
    }
    RunResult(state, iter - startIteration, converged, metrics.toSeq)
    } finally {
      // exception-safe: a failed superstep must not leave the whole session
      // with AQE off (the toggles are loop-scoped, not session-scoped)
      spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
      spark.conf.set("spark.sql.shuffle.partitions", shufBefore)
    }
  }

  /** Join messages through the edge table toward the receiver — the SpMV
    * routing step. Edges are pre-clustered on the join key (LinkGraph), so
    * only the (small) frontier shuffles; hub senders take LinkGraph's
    * broadcast-over-salted-shards path so no partition owns a hub's whole
    * edge list; the ⊕ aggregation after `reduce` is the only full-width
    * shuffle per superstep. */
  private def route(graph: LinkGraph, msgs: DataFrame, dir: Direction): DataFrame = {
    def along(senderKey: String, recvKey: String) =
      graph.joinAlong(msgs.withColumnRenamed("id", "_send"), senderKey)
        .withColumn("_recv", col(recvKey))
        .drop("src", "dst")
    dir match {
      case Direction.Out => along("src", "dst")
      case Direction.In  => along("dst", "src")
      case Direction.All => along("src", "dst").unionByName(along("dst", "src"))
    }
  }

  private def snapshot(c: CheckpointConfig, iteration: Int, state: DataFrame,
                       metrics: Seq[IterationMetrics]): DataFrame = {
    val spark = state.sparkSession
    val sc = spark.sparkContext
    val root = s"${c.dir}/${c.runId}"
    val base = s"$root/iter=$iteration"
    c.store.writeState(state, s"$base/state")
    val reloaded = c.store.readState(spark, s"$base/state")
      .persist(StorageLevel.MEMORY_AND_DISK)
    reloaded.count()
    // per-partition lineage record + iteration metrics (north rule)
    val partRows = reloaded.groupBy(spark_partition_id().as("p")).count()
      .collect().map(r => s"""{"partition":${r.getInt(0)},"rows":${r.getLong(1)}}""")
    val mLines = metrics.map(m =>
      s"""{"iteration":${m.iteration},"changed":${m.changed},"millis":${m.millis}}""")
    c.store.writeText(sc, s"$root/metrics.jsonl", mLines.mkString("", "\n", "\n"))
    c.store.writeText(sc, s"$base/partitions.jsonl", partRows.mkString("", "\n", "\n"))
    // the pointer commits the snapshot — written LAST, so a crash during any
    // earlier write leaves the previous committed state resumable
    c.store.writeText(sc, s"$root/latest.json", s"""{"iteration":$iteration}""")
    reloaded
  }
}
