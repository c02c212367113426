package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Edge

/**
 * Reader for the reference's packed-binary edge-list format
 * ("binary mtx": `include/GMDP/utils/edgelist.h:89-174`):
 * optional int32 header `(m, n, nnz)`, then records `(src:int32, dst:int32,
 * val:int32|float32)` with 1-based vertex ids.
 *
 * Honors the header count — `data/2_10_upper_triangle.bin.mtx` declares
 * nnz=15069 but contains 15070 records; the reference only *uses* the first
 * 15069 (allocation from header, `edgelist.h:269-288`), so we stop at the
 * header count for exact-match parity (see FIXTURES.md §2).
 *
 * Fixture-scale only (whole file on the driver, then parallelize). Web-scale
 * edge ingest goes through parquet/Iceberg — see Transcripts.
 */
object MtxReader {

  /** Parsed binary mtx: edges plus the header dims (both 0 when headerless). */
  final case class Mtx(edges: DataFrame, m: Long, n: Long)

  def readMtx(spark: SparkSession, path: String,
              header: Boolean = true, intWeights: Boolean = true): Mtx = {
    import spark.implicits._
    val bytes = Files.readAllBytes(Paths.get(path))
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var m = 0L; var nDim = 0L
    val nnz: Int =
      if (header) { m = buf.getInt().toLong; nDim = buf.getInt().toLong; buf.getInt() }
      else (bytes.length - buf.position()) / 12
    val n = math.min(nnz.toLong, (bytes.length - buf.position()) / 12L).toInt
    val edges = new Array[Edge](n)
    var i = 0
    while (i < n) {
      val s = buf.getInt().toLong
      val d = buf.getInt().toLong
      val w = if (intWeights) buf.getInt().toDouble else buf.getFloat().toDouble
      edges(i) = Edge(s, d, w)
      i += 1
    }
    Mtx(spark.createDataset(edges.toIndexedSeq).toDF(), m, nDim)
  }

  def read(spark: SparkSession, path: String,
           header: Boolean = true, intWeights: Boolean = true): DataFrame =
    readMtx(spark, path, header, intWeights).edges

  /** The ReadMTX square-ify step (`/root/reference/include/Graph.h:253-257`):
    * a rectangular header is promoted to the square hull m = n = max(m, n),
    * so bipartite inputs (e.g. SGD's ratings) get a square adjacency. */
  def readSquare(spark: SparkSession, path: String,
                 header: Boolean = true, intWeights: Boolean = true): Mtx = {
    val r = readMtx(spark, path, header, intWeights)
    val side = math.max(r.m, r.n)
    r.copy(m = side, n = side)
  }

  /**
   * Binary edge-list writer — the reference's `WriteEdges`
   * (`include/GMDP/utils/edgelist.h:208-240,454-457`): int32 header
   * `(m, n, nnz)` then `(src:int32, dst:int32, val:int32|float32)` records,
   * little-endian, 1-based ids. Dims default to max(src)/max(dst) when not
   * given. Fixture-scale only (single local file), like the reader.
   */
  def write(edges: DataFrame, path: String, m: Long = 0L, n: Long = 0L,
            header: Boolean = true, intWeights: Boolean = true): Unit = {
    val rows = edges.select("src", "dst", "weight").collect()
    val dimM = if (m > 0) m else rows.iterator.map(_.getLong(0)).foldLeft(0L)(math.max)
    val dimN = if (n > 0) n else rows.iterator.map(_.getLong(1)).foldLeft(0L)(math.max)
    // the format is int32 throughout; out-of-range inputs must fail loudly,
    // not wrap (ids) or overflow the buffer size (nnz past ~178M records)
    require(dimM <= Int.MaxValue && dimN <= Int.MaxValue,
      s"mtx dims ($dimM x $dimN) exceed the format's int32 range")
    require(rows.length <= (Int.MaxValue - 12) / 12,
      s"${rows.length} edges exceed the single-buffer writer's capacity; this writer is fixture-scale")
    require(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) <= Int.MaxValue &&
                             r.getLong(1) >= 0 && r.getLong(1) <= Int.MaxValue),
      "edge endpoints must fit in the format's int32 range")
    val buf = ByteBuffer.allocate((if (header) 12 else 0) + rows.length * 12)
      .order(ByteOrder.LITTLE_ENDIAN)
    if (header) { buf.putInt(dimM.toInt); buf.putInt(dimN.toInt); buf.putInt(rows.length) }
    rows.foreach { r =>
      buf.putInt(r.getLong(0).toInt); buf.putInt(r.getLong(1).toInt)
      if (intWeights) buf.putInt(r.getDouble(2).toInt) else buf.putFloat(r.getDouble(2).toFloat)
    }
    Files.write(Paths.get(path), buf.array())
  }
}
