package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Span-level exact duplicate detection: find every n-token window whose
 * text occurs more than once corpus-wide, and where. This is the n-gram-
 * granular form of exact-substring training-data dedup (the suffix-array
 * approach of Lee et al., "Deduplicating Training Data Makes Language
 * Models Better", 2022, discretized to fixed-width windows so it becomes
 * pure relational algebra): a duplicated 50-token passage shows up as a run
 * of consecutive duplicated windows, which a downstream pass can cut or
 * mask per-span instead of dropping whole documents.
 *
 * Scale shape (100 TB): one narrow projection explodes each document into
 * (tokens − n + 1) md5'd windows — no data is carried beyond the 16-byte
 * hash and a position — then ONE hash shuffle groups window counts and an
 * inner join (same key, same partitioning, no second shuffle) maps hot
 * windows back to their (doc, pos) sites. Window text never leaves the
 * mapper; collisionless-md5 is the same standing assumption as every dedup
 * operator here.
 */
object Spans {

  /** md5 of each n-token window, with its 1-based token position:
    * (doc_id, pos, h). Documents shorter than n tokens yield no rows
    * (guarded explicitly — Spark's `sequence(1, 0)` would DESCEND). */
  def windowHashes(docs: DataFrame, id: Column, text: Column, n: Int): DataFrame = {
    require(n >= 2, s"window width must be >= 2 tokens, got $n")
    val toks = split(trim(text), "\\s+")
    docs.select(id.as("doc_id"), toks.as("t"))
      .filter(size(col("t")) >= n)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(1), size(col("t")) - (n - 1)),
          i => md5(concat_ws(" ", slice(col("t"), i, lit(n)))))))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("h"))
  }

  /**
   * Every window occurring more than once corpus-wide, at every site:
   * (doc_id, pos, h, n_occurrences). A self-overlapping repeat inside ONE
   * document counts too — that is the in-document repetition loop the
   * t_repeat analysis scores, caught here at exact-match precision.
   */
  def duplicatedSpans(docs: DataFrame, id: Column, text: Column, n: Int = 8): DataFrame = {
    val w = windowHashes(docs, id, text, n)
    val hot = w.groupBy("h").agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") > 1)
    w.join(hot, "h").select("doc_id", "pos", "h", "n_occurrences")
  }

  /** Per-document duplication profile: how many of its windows are
    * duplicated elsewhere, and the worst window's occurrence count —
    * the document-level score used to rank candidates for span cutting. */
  def spanProfile(docs: DataFrame, id: Column, text: Column, n: Int = 8): DataFrame = {
    val toks = split(trim(text), "\\s+")
    val total = docs.select(id.as("doc_id"), greatest(size(toks) - (n - 1), lit(0)).as("n_windows"))
    val dup = duplicatedSpans(docs, id, text, n)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup_windows"), max("n_occurrences").as("max_occurrences"))
    total.join(dup, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("max_occurrences"), lit(0L)).as("max_occurrences"))
  }
}
