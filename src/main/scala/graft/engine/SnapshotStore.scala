package graft.engine

import scala.reflect.ClassTag

import org.apache.spark.SparkContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Storage seam for every durable artifact the engine commits mid-run:
 * checkpoint manifests / latest-pointers / metrics (small driver-side
 * text), columnar state tables (the Column engine's per-iteration
 * snapshots), and partition-aligned binary state blocks (the CSR engine's
 * snapshots and mid-algorithm checkpoints).
 *
 * The north rule names Iceberg as the production substrate ("each superstep
 * checkpoints per-partition frontier state plus lineage and iteration
 * metrics to Iceberg"). This sandbox ships no Iceberg jars, so
 * [[HadoopSnapshotStore]] renders the same commit discipline — data files
 * first, the `latest` pointer LAST, so a crash mid-write always leaves the
 * previous committed state resumable — over Hadoop `FileSystem` paths
 * (local, hdfs://, s3a://) with parquet/object-file payloads. An Iceberg
 * implementation is a drop-in: `writeState`/`readState` become table
 * appends/snapshot reads, `writeBlocks` a table of (partition, blob) rows,
 * and the text manifests snapshot properties/tags; callers ([[Superstep]],
 * [[GatherScatter]]) see only this trait via the `store` field on
 * [[CheckpointConfig]] / [[CsrCheckpoint]].
 */
trait SnapshotStore extends Serializable {

  /** Small driver-side text artifact (manifest, metrics, latest pointer),
    * overwriting any existing content atomically enough that readers see
    * old-or-new, never half-written. */
  def writeText(sc: SparkContext, path: String, text: String): Unit

  /** None when the artifact does not exist. */
  def readText(sc: SparkContext, path: String): Option[String]

  def exists(sc: SparkContext, path: String): Boolean

  def deleteIfExists(sc: SparkContext, path: String): Unit

  /** Columnar state table, full overwrite (one committed version per path). */
  def writeState(state: DataFrame, path: String): Unit

  def readState(spark: SparkSession, path: String): DataFrame

  /** Partition-aligned binary blocks: element i of `blocks` carries its own
    * partition id so a reader can restore alignment via `partitionBy`. */
  def writeBlocks[T: ClassTag](blocks: RDD[(Int, T)], path: String): Unit

  def readBlocks[T: ClassTag](sc: SparkContext, path: String): RDD[(Int, T)]
}

/** The parquet/object-file rendering over Hadoop FileSystem — behaviorally
  * identical to the engine's original direct writes. */
object HadoopSnapshotStore extends SnapshotStore {

  private def fsOf(sc: SparkContext, path: String) = {
    val hp = new org.apache.hadoop.fs.Path(path)
    (hp, hp.getFileSystem(sc.hadoopConfiguration))
  }

  override def writeText(sc: SparkContext, path: String, text: String): Unit = {
    // write-to-temp + rename: an in-place truncate would corrupt the commit
    // pointer if the process dies mid-overwrite, breaking the written-LAST
    // resume discipline the trait contract promises (rename is atomic on
    // local and HDFS; object stores substitute their own atomic PUT)
    val (hp, fs) = fsOf(sc, path)
    val tmp = new org.apache.hadoop.fs.Path(
      hp.getParent, s".${hp.getName}.tmp-${System.nanoTime()}")
    val out = fs.create(tmp, true)
    try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    try {
      // FileContext rename with OVERWRITE is atomic on local/HDFS even when
      // the destination exists (plain FileSystem.rename is not)
      org.apache.hadoop.fs.FileContext.getFileContext(hp.toUri, sc.hadoopConfiguration)
        .rename(tmp, hp, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: UnsupportedOperationException =>
        if (fs.exists(hp)) fs.delete(hp, false)
        if (!fs.rename(tmp, hp))
          throw new java.io.IOException(s"rename $tmp -> $hp failed")
    }
  }

  override def readText(sc: SparkContext, path: String): Option[String] = {
    val (hp, fs) = fsOf(sc, path)
    if (!fs.exists(hp)) None
    else {
      val in = fs.open(hp)
      try Some(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  override def exists(sc: SparkContext, path: String): Boolean = {
    val (hp, fs) = fsOf(sc, path)
    fs.exists(hp)
  }

  override def deleteIfExists(sc: SparkContext, path: String): Unit = {
    val (hp, fs) = fsOf(sc, path)
    if (fs.exists(hp)) { fs.delete(hp, true); () }
  }

  override def writeState(state: DataFrame, path: String): Unit =
    state.write.mode("overwrite").parquet(path)

  override def readState(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  override def writeBlocks[T: ClassTag](blocks: RDD[(Int, T)], path: String): Unit = {
    deleteIfExists(blocks.sparkContext, path) // half-written blocks from a crash
    blocks.saveAsObjectFile(path)
  }

  override def readBlocks[T: ClassTag](sc: SparkContext, path: String): RDD[(Int, T)] =
    sc.objectFile[(Int, T)](path)
}
