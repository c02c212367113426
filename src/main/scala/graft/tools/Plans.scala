package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans of representative catalog queries so scan
  * pruning/pushdown and codegen coverage can be reviewed. */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (q <- args) {
      println(s"========== $q ==========")
      graft.SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
