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

  /** (id, token) pairs — lowered whitespace tokens, one row per occurrence.
    * The shared front end of the retrieval-shaped operators below; a single
    * explode, no shuffle until the caller aggregates. */
  def tokenRows(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("id"), explode(split(trim(lower(text)), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)

  /**
   * Inverted index summary: per term, document frequency, total term
   * frequency, and the smallest posting (doc id). One explode + one hash
   * aggregation — at 100 TB this is a single shuffle on the term key with
   * map-side partial aggregation; the full postings lists stay distributed
   * (this summary is what a driver would ever collect).
   */
  def invertedIndex(docs: DataFrame, id: Column, text: Column): DataFrame =
    tokenRows(docs, id, text)
      .groupBy("term")
      .agg(countDistinct("id").as("df"), count(lit(1)).as("tf_total"),
        min("id").as("min_doc"))

  /**
   * Top-k TF-IDF terms per document. Ranking is fully DISCRETE — (tf desc,
   * df asc, term asc) — so the cross-engine order never hinges on a last-ulp
   * `ln` difference; the reported tfidf = tf * ln(N/df) is rounded. The
   * window partitions by doc (bounded per-group width), the df side is one
   * small aggregate joined back on the term key.
   */
  def tfIdfTopK(docs: DataFrame, id: Column, text: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = tokenRows(docs, id, text)
    val tf = toks.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val df = toks.select("term", "id").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.select(id).distinct().count()
    val w = Window.partitionBy("id")
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(df, "term")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("id"), col("rk").cast("long").as("rk"), col("term"), col("tf"), col("df"),
        round(col("tf") * log(lit(n.toDouble) / col("df")) + 1e-9, 6).as("tfidf"))
  }

  /**
   * BM25 (k1=1.2, b=0.75) of a fixed bag-of-words query against every
   * document; rows with score 0 (no query term present) are dropped. The
   * query-term table is tiny → broadcast join against the exploded tokens;
   * df and avgdl are two scalar-sized aggregates. Lucene-style idf:
   * ln(1 + (N - df + 0.5)/(df + 0.5)).
   */
  def bm25(docs: DataFrame, id: Column, text: Column, queryTerms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = tokenRows(docs, id, text)
    val dl = toks.groupBy("id").agg(count(lit(1)).as("dl"))
    val n = docs.select(id).distinct().count()
    val avgdl = dl.agg(avg("dl")).head().getDouble(0)
    val q = queryTerms.toDF("term")
    val tf = toks.join(broadcast(q), "term").groupBy("id", "term")
      .agg(count(lit(1)).as("tf"))
    val df = toks.select("term", "id").distinct().join(broadcast(q), "term")
      .groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) + (lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5))
    val norm = col("tf") * (k1 + 1) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / avgdl))
    tf.join(broadcast(df), "term").join(dl, "id")
      .groupBy("id")
      .agg(round(sum(idf * norm) + 1e-9, 6).as("bm25"),
        count(lit(1)).as("n_terms_hit"))
  }

  /** Distinct lowered token n-grams per doc (the decontamination unit).
    * Docs with fewer than n tokens emit nothing — a shorter-than-n pseudo
    * n-gram would let unrelated short docs collide in decontamOverlap. */
  def ngramSet(docs: DataFrame, id: Column, text: Column, n: Int): DataFrame = {
    val toks = split(trim(lower(text)), "\\s+")
    docs.filter(size(toks) >= n)
      .select(id.as("id"),
        explode(transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n))))).as("ngram"))
      .distinct()
  }

  /**
   * Benchmark decontamination: flag corpus documents sharing any token
   * n-gram with a benchmark set. Returns (id, n_shared distinct n-grams,
   * min overlapping benchmark doc). At scale the benchmark side is small →
   * broadcast; the corpus side is one explode, no all-pairs anything.
   */
  def decontamOverlap(corpus: DataFrame, bench: DataFrame, n: Int): DataFrame =
    corpus.join(broadcast(bench.withColumnRenamed("id", "bench_id")), "ngram")
      .groupBy("id")
      .agg(countDistinct("ngram").as("n_shared"), min("bench_id").as("min_bench"))

  /**
   * Gopher-style repetition features: top-token fraction, distinct/total
   * token ratio, duplicate 3-gram fraction. All counts are integers; the
   * three reported ratios are rounded. Single pass per doc — Column algebra
   * over the token array, no shuffle at all.
   */
  def repetition(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = split(trim(lower(text)), "\\s+")
    val total = when(length(trim(text)) === 0, 0).otherwise(size(toks))
    val nDistinct = size(array_distinct(toks))
    // top-token count: max over distinct tokens of their occurrence count
    val topTok = array_max(transform(array_distinct(toks),
      t => size(filter(toks, x => x === t))))
    val n3 = greatest(size(toks) - 2, lit(0))
    val grams = transform(sequence(lit(1), greatest(n3, lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(3))))
    val dup3 = when(n3 > 0, n3 - size(array_distinct(grams))).otherwise(0)
    docs.select(id.as("id"), total.cast("long").as("n_tokens"),
      nDistinct.cast("long").as("n_distinct"), topTok.cast("long").as("top_tok"),
      dup3.cast("long").as("dup_3grams"),
      round(when(total > 0, topTok.cast("double") / total).otherwise(0.0) + 1e-9, 6)
        .as("top_tok_frac"),
      round(when(total > 0, nDistinct.cast("double") / total).otherwise(0.0) + 1e-9, 6)
        .as("distinct_frac"),
      round(when(n3 > 0, dup3.cast("double") / n3).otherwise(0.0) + 1e-9, 6)
        .as("dup_3gram_frac"))
  }
}
