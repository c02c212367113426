package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.pipeline.Spans

class SpansSpec extends AnyFunSuite {
  import SparkTestBase._
  lazy val s = spark

  private def docsOf(rows: (Long, String)*) = {
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private def dup(rows: (Long, String)*): Set[(Long, Int, Long)] =
    Spans.duplicatedSpans(docsOf(rows: _*), col("doc_id"), col("text"), 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(3))).toSet

  test("a 4-gram shared by two docs is flagged at both sites, nothing else") {
    val shared = "alpha beta gamma delta"
    val got = dup(
      1L -> s"one two three $shared x y z",
      2L -> s"$shared completely different tail here",
      3L -> "unrelated words only appearing once each time")
    // doc1: shared starts at token 4; doc2: at token 1; both count 2
    assert(got === Set((1L, 4, 2L), (2L, 1, 2L)))
  }

  test("in-document repetition is caught (same window twice in one doc)") {
    val got = dup(7L -> "a b c d junk a b c d")
    // tokens: a b c d junk a b c d -> window 'a b c d' at pos 1 and 6
    assert(got === Set((7L, 1, 2L), (7L, 6, 2L)))
  }

  test("documents shorter than the window yield no rows and no errors") {
    val got = Spans.duplicatedSpans(
      docsOf(1L -> "only three tokens", 2L -> "only three tokens"),
      col("doc_id"), col("text"), 4).collect()
    assert(got.isEmpty)
    // but the profile still reports them with zero windows
    val prof = Spans.spanProfile(
      docsOf(1L -> "only three tokens", 2L -> ""),
      col("doc_id"), col("text"), 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(prof === Map(1L -> 0, 2L -> 0))
  }

  test("overlapping windows of a long duplicated passage all flag") {
    val passage = "p1 p2 p3 p4 p5 p6" // 6 tokens -> 3 windows of 4
    val got = dup(1L -> passage, 2L -> s"lead $passage")
    assert(got === Set(
      (1L, 1, 2L), (1L, 2, 2L), (1L, 3, 2L),
      (2L, 2, 2L), (2L, 3, 2L), (2L, 4, 2L)))
  }

  test("profile aggregates sites per document") {
    val passage = "p1 p2 p3 p4 p5"
    val prof = Spans.spanProfile(
      docsOf(1L -> passage, 2L -> passage, 3L -> s"$passage $passage"),
      col("doc_id"), col("text"), 4)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
    // passage has 2 windows of width 4; doc3 has 7 windows, several duplicated
    assert(prof(1L)._1 === 2 && prof(2L)._1 === 2 && prof(3L)._1 === 7)
    assert(prof(1L)._2 === 2L && prof(2L)._2 === 2L)
    // 'p1 p2 p3 p4' occurs 2 (docs 1,2) + 2 (doc3 twice) = 4 times
    assert(prof(1L)._3 === 4L)
    assert(prof(3L)._2 >= 4L) // doc3's own duplicated windows
  }

  test("whitespace runs and surrounding blanks don't shift positions") {
    val got = dup(
      1L -> "  w1   w2  w3 w4  ",
      2L -> "w1 w2 w3 w4")
    assert(got === Set((1L, 1, 2L), (2L, 1, 2L)))
  }
}
