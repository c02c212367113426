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

  def read(spark: SparkSession, path: String,
           header: Boolean = true, intWeights: Boolean = true): DataFrame = {
    import spark.implicits._
    val bytes = Files.readAllBytes(Paths.get(path))
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nnz: Int =
      if (header) { buf.getInt(); buf.getInt(); buf.getInt() }
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
    spark.createDataset(edges.toIndexedSeq).toDF()
  }
}
