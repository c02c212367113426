package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Does localCheckpoint preserve HashPartitioning through the planner? */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = spark.range(0, 1000).select(col("id"), (col("id") % 7).as("v"))
      .repartition(4, col("id")).localCheckpoint(true)

    println("=== groupBy(id) after localCheckpoint(repartition(id)) ===")
    base.groupBy("id").count().explain()

    println("=== self-join on id after checkpoint ===")
    val agg = base.groupBy("id").agg(sum("v").as("s"))
    base.alias("l").join(agg.alias("r"), col("l.id") === col("r.id"), "left_outer").explain()

    println("=== after drop+rename ===")
    val renamed = base.withColumnRenamed("id", "_send")
    renamed.groupBy("_send").count().explain()
    spark.stop()
  }
}
