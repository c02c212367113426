package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.pipeline.Sampling

class SamplingSpec extends AnyFunSuite {
  import SparkTestBase._
  lazy val s = spark

  private def corpus(n: Int) = {
    import s.implicits._
    (0 until n).map(i => (i.toLong, Seq("en", "en", "de", "fr")(i % 4)))
      .toDF("id", "lang")
  }

  /** The operator's keep rule, recomputed independently in JVM Scala. */
  private def keeps(id: Long, salt: String, rate: Double): Boolean = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$id:$salt".getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16) < Sampling.threshold(rate)
  }

  test("hashSample keeps exactly the rows the md5 rule says, repeatably") {
    val df = corpus(2000)
    val got = Sampling.hashSample(df, col("id"), 0.3, "t")
      .select("id").collect().map(_.getLong(0)).toSet
    val want = (0L until 2000L).filter(keeps(_, "t", 0.3)).toSet
    assert(got === want)
    // deterministic: a second run returns the identical set
    assert(Sampling.hashSample(df, col("id"), 0.3, "t")
      .select("id").collect().map(_.getLong(0)).toSet === want)
    // roughly the requested rate on a uniform id space
    assert(math.abs(want.size / 2000.0 - 0.3) < 0.05)
  }

  test("nested rates: the 10% sample is a strict subset of the 50% sample") {
    val df = corpus(2000)
    val small = Sampling.hashSample(df, col("id"), 0.1, "t")
      .select("id").collect().map(_.getLong(0)).toSet
    val big = Sampling.hashSample(df, col("id"), 0.5, "t")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big))
    assert(small.size < big.size)
  }

  test("different salts decorrelate") {
    val df = corpus(2000)
    val a = Sampling.hashSample(df, col("id"), 0.5, "sa")
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(df, col("id"), 0.5, "sb")
      .select("id").collect().map(_.getLong(0)).toSet
    val overlap = a.intersect(b).size.toDouble / math.max(a.size, 1)
    assert(overlap > 0.3 && overlap < 0.7, s"overlap $overlap should be ~0.5")
  }

  test("stratified honors per-stratum rates and the default") {
    val df = corpus(4000)
    val rates = Map("en" -> 0.2, "de" -> 0.9)
    val kept = Sampling.stratified(df, col("id"), col("lang"), rates, 0.5, "st")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val langOf = (id: Long) => Seq("en", "en", "de", "fr")((id % 4).toInt)
    val want = (0L until 4000L).filter { id =>
      keeps(id, "st", rates.getOrElse(langOf(id), 0.5))
    }.map(id => (id, langOf(id))).toSet
    assert(kept.toSet === want)
  }

  test("coverage report counts agree with the sample itself") {
    val df = corpus(4000)
    val rates = Map("en" -> 0.2, "de" -> 0.9)
    val cov = Sampling.stratifiedCoverage(df, col("id"), col("lang"), rates, 0.5, "st")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val kept = Sampling.stratified(df, col("id"), col("lang"), rates, 0.5, "st")
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cov.keySet === Set("en", "de", "fr"))
    assert(cov("en")._1 === 2000L && cov("de")._1 === 1000L && cov("fr")._1 === 1000L)
    for ((lang, (_, nKept)) <- cov) assert(nKept === kept.getOrElse(lang, 0L), lang)
  }
}
