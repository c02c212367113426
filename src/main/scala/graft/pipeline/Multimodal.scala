package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: images/audio/video ride as opaque `binary`
 * columns with typed metadata, and per-asset processing (decode, feature
 * extraction, resize, frame sampling) runs as batched partition-local
 * functions — the Scala analog of `mapInPandas` (iterator of rows per
 * partition in, iterator out; decode libraries are initialized once per
 * partition, not per row).
 *
 * The codec libraries are not in this container, so `decodeStub` is a
 * STUB: a deterministic fake deriving "decoded" features from the asset
 * bytes. The Spark-side plumbing — binary schema, partitioning, partition
 * iteration, output schema — is real and tested; swap `decodeStub` for an
 * actual decoder at deployment.
 */
object Multimodal {

  val assetSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("content", BinaryType, nullable = false)))

  final case class AssetFeatures(id: Long, width: Int, height: Int, mean_byte: Double)

  /** Build a deterministic fake asset table from a text corpus: content =
    * md5 bytes of the text (a stand-in for real image/audio payloads). */
  def fakeAssets(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("id"), lit("image/fake").as("media_type"),
      unhex(md5(text)).as("content"))

  /** STUB decoder: deterministic features from the asset bytes. A real
    * implementation decodes pixels here. */
  private def decodeStub(id: Long, content: Array[Byte]): AssetFeatures = {
    val b0 = content(0) & 0xff
    val b1 = content(1) & 0xff
    val mean = content.map(_ & 0xff).sum.toDouble / content.length
    AssetFeatures(id, b0 % 64 + 1, b1 % 64 + 1, mean)
  }

  /** Batched partition-local feature extraction over the asset table. */
  def extractFeatures(assets: DataFrame): DataFrame = {
    implicit val inEnc: Encoder[(Long, Array[Byte])] =
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    implicit val outEnc: Encoder[AssetFeatures] = Encoders.product[AssetFeatures]
    assets.select(col("id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init happens here (decoder handles, model weights, ...)
        it.map { case (id, content) => decodeStub(id, content) }
      }
      .toDF()
  }
}
