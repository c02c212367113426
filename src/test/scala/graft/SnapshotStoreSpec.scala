package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{CheckpointConfig, HadoopSnapshotStore, SnapshotStore, Superstep}

/**
 * The durable-IO seam ([[SnapshotStore]]): the Hadoop/parquet rendering's
 * own contract, and that a CUSTOM store really is a drop-in — every durable
 * byte of a checkpointed run must flow through the trait, none through a
 * hard-coded filesystem call.
 */
class SnapshotStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private def sc = spark.sparkContext

  test("HadoopSnapshotStore: text round-trip, overwrite, exists, delete") {
    val dir = Files.createTempDirectory("graft-snapstore").toString
    val p = s"$dir/nested/latest.json"
    assert(HadoopSnapshotStore.readText(sc, p).isEmpty)
    assert(!HadoopSnapshotStore.exists(sc, p))
    HadoopSnapshotStore.writeText(sc, p, """{"iteration":3}""")
    assert(HadoopSnapshotStore.readText(sc, p).contains("""{"iteration":3}"""))
    HadoopSnapshotStore.writeText(sc, p, """{"iteration":7}""") // overwrite
    assert(HadoopSnapshotStore.readText(sc, p).contains("""{"iteration":7}"""))
    HadoopSnapshotStore.deleteIfExists(sc, p)
    assert(!HadoopSnapshotStore.exists(sc, p))
    HadoopSnapshotStore.deleteIfExists(sc, p) // idempotent on absent paths
  }

  test("HadoopSnapshotStore: partition-aligned block round-trip") {
    val dir = Files.createTempDirectory("graft-snapstore").toString
    val blocks = sc.parallelize(0 until 4, 4)
      .map(p => (p, Array.tabulate(3)(i => p * 10L + i)))
    HadoopSnapshotStore.writeBlocks(blocks, s"$dir/blocks")
    // second write to the same path must replace, not fail (crash recovery)
    HadoopSnapshotStore.writeBlocks(blocks, s"$dir/blocks")
    val back = HadoopSnapshotStore.readBlocks[Array[Long]](sc, s"$dir/blocks")
      .collect().sortBy(_._1)
    assert(back.map(_._1).toSeq == Seq(0, 1, 2, 3))
    assert(back.map(_._2.toSeq).toSeq ==
      Seq(Seq(0L, 1L, 2L), Seq(10L, 11L, 12L), Seq(20L, 21L, 22L), Seq(30L, 31L, 32L)))
  }

  /** Counting decorator: delegates to the Hadoop store, tallies calls. */
  private class CountingStore extends SnapshotStore {
    var texts = 0; var states = 0; var reads = 0
    def writeText(sc: org.apache.spark.SparkContext, path: String, text: String): Unit = {
      texts += 1; HadoopSnapshotStore.writeText(sc, path, text)
    }
    def readText(sc: org.apache.spark.SparkContext, path: String): Option[String] = {
      reads += 1; HadoopSnapshotStore.readText(sc, path)
    }
    def exists(sc: org.apache.spark.SparkContext, path: String): Boolean =
      HadoopSnapshotStore.exists(sc, path)
    def deleteIfExists(sc: org.apache.spark.SparkContext, path: String): Unit =
      HadoopSnapshotStore.deleteIfExists(sc, path)
    def writeState(state: org.apache.spark.sql.DataFrame, path: String): Unit = {
      states += 1; HadoopSnapshotStore.writeState(state, path)
    }
    def readState(spark: org.apache.spark.sql.SparkSession, path: String) =
      HadoopSnapshotStore.readState(spark, path)
    def writeBlocks[T: scala.reflect.ClassTag](
        blocks: org.apache.spark.rdd.RDD[(Int, T)], path: String): Unit =
      HadoopSnapshotStore.writeBlocks(blocks, path)
    def readBlocks[T: scala.reflect.ClassTag](
        sc: org.apache.spark.SparkContext, path: String) =
      HadoopSnapshotStore.readBlocks[T](sc, path)
  }

  test("a custom store is a drop-in: checkpointed run + resume flow through it") {
    import graft.core.LinkGraph
    val edges = spark.createDataFrame(
        SparkTestBase.testGraphEdges.map { case (s, d) => (s, d, 1.0) })
      .toDF("src", "dst", "weight")
    val g = LinkGraph(edges, 2)
    val dir = Files.createTempDirectory("graft-snapstore").toString
    val store = new CountingStore
    val cp = CheckpointConfig(dir, "runA", every = 2, store = store)
    val res = graft.algos.PageRank.run(g, tol = -1.0, maxIterations = 4, cp = Some(cp))
    res.state.count()
    assert(store.states >= 2, s"snapshots must go through the store (${store.states})")
    assert(store.texts >= 3, "metrics/lineage/pointer must go through the store")
    // the store-written pointer is the one resume reads
    val latest = HadoopSnapshotStore.readText(sc, s"$dir/runA/latest.json")
    assert(latest.exists(_.contains(""""iteration":4""")), s"latest=$latest")
    g.unpersistAll()
    res.state.unpersist()
  }
}
