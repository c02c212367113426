package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftExtensions, GraftFunctions}

/** SQL-side availability of graft's native functions: programmatic
  * registration on a live session, and the conf/`SparkSessionExtensions`
  * injection path a spark-submit user would take. */
class GraftFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("register(spark) makes vector_sum callable from spark.sql") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq((1L, Array(1.0, 2.0)), (1L, Array(0.5, 0.5)), (2L, Array(3.0, 4.0)))
      .toDF("id", "v").createOrReplaceTempView("vs_sql_in")
    val got = spark.sql(
      "SELECT id, vector_sum(v) AS n FROM vs_sql_in GROUP BY id ORDER BY id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got(1L) == Seq(1.5, 2.5))
    assert(got(2L) == Seq(3.0, 4.0))
  }

  test("register(spark) makes vector_bitor callable from spark.sql") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq((1L, Array(1L, 8L)), (1L, Array(2L, 8L)), (2L, Array(5L, 0L)))
      .toDF("id", "v").createOrReplaceTempView("vbo_sql_in")
    val got = spark.sql(
      "SELECT id, vector_bitor(v) AS n FROM vbo_sql_in GROUP BY id ORDER BY id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L) == Seq(3L, 8L))
    assert(got(2L) == Seq(5L, 0L))
  }

  test("vector_bitor rejects mixed lengths instead of truncating") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq((1L, Array(1L)), (1L, Array(1L, 2L)))
      .toDF("id", "v").createOrReplaceTempView("vbo_mixed_in")
    val e = intercept[Exception] {
      spark.sql("SELECT id, vector_bitor(v) FROM vbo_mixed_in GROUP BY id").collect()
    }
    assert(e.getMessage.contains("mixed array lengths") ||
      e.getCause != null && e.getCause.getMessage.contains("mixed array lengths"))
  }

  test("wrong arity reports a clear error") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT vector_sum(array(1.0), array(2.0))").collect()
    }
    assert(e.getMessage.contains("exactly 1 argument"))
  }

  test("GraftExtensions injects vector_sum into a fresh session (conf path)") {
    spark.sparkContext // force the shared context to exist first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions()) // == spark.sql.extensions conf
        .getOrCreate()
      import s2.implicits._
      Seq((1L, Array(1.0, 1.0)), (1L, Array(2.0, 3.0)))
        .toDF("id", "v").createOrReplaceTempView("vs_ext_in")
      val r = s2.sql("SELECT vector_sum(v) AS n FROM vs_ext_in")
        .head().getSeq[Double](0)
      assert(r == Seq(3.0, 4.0))
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
