package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text analysis for training-data pipelines: language ID (stopword-marker
 * heuristic), quality scoring, token counting (whitespace + BPE-ish regex),
 * and document fingerprinting (min-hash over token 5-gram windows — a
 * winnowing-style content fingerprint). Pure Column algebra, one pass each.
 */
object TextAnalysis {

  /** # occurrences of `marker` in `padded` (both-ends-padded lowered text). */
  private def occ(padded: Column, marker: String): Column =
    ((length(padded) - length(replace(padded, lit(marker), lit("")))) / marker.length).cast("long")

  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "es" -> Seq(" la ", " el ", " los "),
    "de" -> Seq(" der ", " und ", " die "),
    "fr" -> Seq(" le ", " et ", " les "))

  /**
   * Heuristic language ID: per-language stopword-marker hit counts over the
   * lowered, space-padded text; predicted = argmax count, alphabetical-first
   * tie-break, "und" (undetermined) when all counts are zero.
   */
  def langId(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    val scored = docs.select(
      (id.as("id") +: langMarkers.map { case (lang, ms) =>
        ms.map(occ(padded, _)).reduce(_ + _).as(s"score_$lang")
      }): _*)
    // argmax with alphabetical tie-break = greatest of (score, reverse-alpha rank) structs
    val best = langMarkers.zipWithIndex.map { case ((lang, _), i) =>
      struct(col(s"score_$lang").as("s"), lit(langMarkers.size - i).as("r"), lit(lang).as("l"))
    }
    val outCols = Seq(col("id"),
      when(col("_best.s") > 0, col("_best.l")).otherwise("und").as("lang_pred")) ++
      langMarkers.map { case (l, _) => col(s"score_$l") }
    scored.withColumn("_best", greatest(best: _*)).select(outCols: _*)
  }

  /** Whitespace token count (0 for blank text). */
  def wsTokens(text: Column): Column =
    when(length(trim(text)) === 0, 0L)
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** BPE-ish subword count: letter runs, digit runs, and single punctuation
    * marks each count as one token (a cheap proxy for byte-pair vocabularies). */
  def bpeTokens(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("long")

  /**
   * Quality features + a deterministic composite score in [0,1]:
   * length band, alpha ratio, punctuation density, mean token length band.
   */
  def quality(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val nChars = length(text).cast("long")
    val nAlpha = nChars - length(regexp_replace(text, "[A-Za-z]", "")).cast("long")
    val nPunct = nChars - length(regexp_replace(text, "[.,;:!?]", "")).cast("long")
    val nTok = wsTokens(text)
    val alphaRatio = when(nChars > 0, nAlpha.cast("double") / nChars).otherwise(0.0)
    val punctRatio = when(nChars > 0, nPunct.cast("double") / nChars).otherwise(0.0)
    val meanTokLen = when(nTok > 0, nChars.cast("double") / nTok).otherwise(0.0)
    val score =
      when(nChars >= 100 && nChars <= 10000, 0.25).otherwise(0.0) +
      when(alphaRatio >= 0.6, 0.25).otherwise(0.0) +
      when(punctRatio <= 0.1, 0.25).otherwise(0.0) +
      when(meanTokLen >= 3 && meanTokLen <= 12, 0.25).otherwise(0.0)
    docs.select(id.as("id"), nChars.as("n_chars"), nTok.as("n_tokens"),
      nAlpha.as("n_alpha"), nPunct.as("n_punct"),
      round(alphaRatio + 1e-9, 6).as("alpha_ratio"),
      round(punctRatio + 1e-9, 6).as("punct_ratio"),
      score.as("quality"))
  }

  /** Min-md5 over token 5-gram windows — a stable content fingerprint that
    * survives local edits outside the minimal window. */
  def fingerprint(docs: DataFrame, id: Column, text: Column, k: Int = 5): DataFrame = {
    val toks = split(trim(lower(text)), "\\s+")
    val n = greatest(size(toks) - (k - 1), lit(1))
    docs.select(id.as("id"),
      array_min(transform(sequence(lit(1), n),
        i => md5(concat_ws(" ", slice(toks, i, lit(k)))))).as("fingerprint"))
  }
}
