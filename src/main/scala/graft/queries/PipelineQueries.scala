package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline._

/**
 * Training-data pipeline queries over the documents/embeddings tables, each
 * with an exact DuckDB twin. Sampled variants (`doc_id % k = 0`) keep the
 * brute-force oracles tractable; the scale paths (LSH banding, bucketed ANN)
 * are in graft.pipeline and covered by sbt tests.
 */
object PipelineQueries {

  private def docs(s: SparkSession, dir: String) =
    s.read.parquet(s"$dir/documents.parquet")
  private def vecs(s: SparkSession, dir: String) =
    s.read.parquet(s"$dir/embeddings.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d_dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(docs(s, dir), col("doc_id"), col("text"))),

    "d_minhash" -> ((s, dir) =>
      Dedup.minHash(Dedup.shingles(
        docs(s, dir).filter(col("doc_id") % 20 === 0), col("doc_id"), col("text"), 5), 8)),

    "d_lsh_buckets" -> ((s, dir) => {
      // 2-gram shingles + 1-row bands: this synthetic corpus has no real
      // near-dups, so the bucket signal needs the loosest LSH setting
      val sig = Dedup.minHash(Dedup.shingles(
        docs(s, dir).filter(col("doc_id") % 20 === 0), col("doc_id"), col("text"), 2), 8)
      Dedup.lshBands(sig, 8, 8)
        .groupBy("band", "bucket").agg(count("*").as("n_docs"))
        .filter(col("n_docs") > 1)
    }),

    // cap-drop visibility: the SAME banding as d_lsh_buckets with a tight
    // cap — the coverage row reports exactly what the cap would exclude
    "d_lsh_coverage" -> ((s, dir) => {
      val sig = Dedup.minHash(Dedup.shingles(
        docs(s, dir).filter(col("doc_id") % 20 === 0), col("doc_id"), col("text"), 2), 8)
      Dedup.lshCoverage(Dedup.lshBands(sig, 8, 8), maxBucket = 2)
    }),

    // transitive near-dup clustering: LSH banding → candidate pairs → the
    // REAL graph engine's connected components → (id, cluster=min doc id in
    // component); singletons keep themselves. 3-gram shingles / 1-row bands
    // on the %5 sample give non-trivial structure on this corpus (13
    // multi-doc clusters + 58 singletons, max cluster 9 — not one blob, not
    // all singletons). The oracle replays the closure with a recursive CTE.
    "d_dedup_cluster" -> ((s, dir) => {
      val sample = docs(s, dir).filter(col("doc_id") % 5 === 0)
      val sig = Dedup.minHash(Dedup.shingles(sample, col("doc_id"), col("text"), 3), 8)
      val pairs = Dedup.lshCandidates(Dedup.lshBands(sig, 8, 8), maxBucket = 1000)
      Dedup.clusters(sample.select(col("doc_id").as("id")), pairs)
    }),

    "d_simhash" -> ((s, dir) =>
      Dedup.simHash(docs(s, dir), col("doc_id"), col("text"), 16)),

    "d_jaccard" -> ((s, dir) => {
      val sample = docs(s, dir).filter(col("doc_id") % 5 === 0)
      Dedup.jaccardPairs(sample, col("doc_id"), col("text"), 3, 0.02)
        .select(col("a"), col("b"), round(col("jaccard") + 1e-9, 6).as("jaccard"))
    }),

    "d_embed_neardup" -> ((s, dir) => {
      // the scale path: banded-LSH candidates (capped buckets, never an
      // all-pairs join) + exact cosine re-check; the oracle replays the
      // banding bit-for-bit (integer quantized hyperplane sums)
      val v = vecs(s, dir).filter(col("vec_id") % 10 === 0)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      Similarity.lshNearDup(v, 0.35, bands = 16, planes = 2, maxBucket = 500)
        .select("a", "b", "cos")
    }),

    // cap-drop visibility for the embedding side: same banding as
    // d_embed_neardup, tight cap
    "s_lsh_coverage" -> ((s, dir) => {
      val v = vecs(s, dir).filter(col("vec_id") % 10 === 0)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      Similarity.bandedCoverage(v, bands = 16, planes = 2, maxBucket = 10)
    }),

    "s_ann_topk" -> ((s, dir) => {
      val q = vecs(s, dir).filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val c = vecs(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      Similarity.bruteTopK(q, c, 5)
    }),

    // IVF ANN: same query set as s_ann_topk but through the inverted-file
    // index (deterministic centroid sample, integer-dot assignment/probing,
    // cosine re-rank inside the probed lists only)
    "s_ivf_topk" -> ((s, dir) => {
      val all = vecs(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      val q = all.filter(col("id") % 100 === 0)
      Similarity.ivfTopK(q, all, 5, c = 8, nProbe = 2)
    }),

    // IVF with TRAINED centroids: two deterministic Lloyd iterations from the
    // md5-sample seeds, then the same probe/re-rank as s_ivf_topk — the full
    // index-build + search story behind one gate
    "s_kmeans_ivf" -> ((s, dir) => {
      val all = vecs(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      val q = all.filter(col("id") % 100 === 0)
      Similarity.ivfTopKWith(q, all, 5,
        Similarity.kmeansCentroids(all, c = 8, iters = 2), nProbe = 2)
    }),

    // the SCALABLE seeding in front of the trained index: k-means||
    // distance-weighted oversampling (2 rounds, l=8, md5-replayable
    // selection), heaviest-8 candidates, one Lloyd refinement, then the same
    // IVF probe/re-rank — seeding + training + search behind one gate
    "s_kmeanspar_ivf" -> ((s, dir) => {
      val all = vecs(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      val q = all.filter(col("id") % 100 === 0)
      val seeds = Similarity.kmeansParSeeds(all, c = 8, rounds = 2, l = 8)
      Similarity.ivfTopKWith(q, all, 5,
        Similarity.kmeansCentroids(all, c = 8, iters = 1, seeds = seeds), nProbe = 2)
    }),

    "t_lang" -> ((s, dir) =>
      TextAnalysis.langId(docs(s, dir), col("doc_id"), col("text"))),

    "t_quality" -> ((s, dir) =>
      TextAnalysis.quality(docs(s, dir), col("doc_id"), col("text"))),

    "t_tokens" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id").as("id"),
        TextAnalysis.wsTokens(col("text")).as("ws_tokens"),
        TextAnalysis.bpeTokens(col("text")).as("bpe_tokens"))),

    "t_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprint(docs(s, dir), col("doc_id"), col("text"), 5)),

    "m_features" -> ((s, dir) =>
      Multimodal.extractFeatures(
        Multimodal.fakeAssets(docs(s, dir), col("doc_id"), col("text")))),

    // ---- retrieval / decontamination / repetition (round-4 additions) ----

    // inverted-index summary: one explode + one term-key aggregation
    "t_invindex" -> ((s, dir) =>
      TextAnalysis.invertedIndex(docs(s, dir), col("doc_id"), col("text"))),

    // top-3 TF-IDF terms per doc; DISCRETE rank keys (tf desc, df asc,
    // term asc) so cross-engine order never hinges on a last-ulp ln()
    "t_tfidf" -> ((s, dir) =>
      TextAnalysis.tfIdfTopK(docs(s, dir), col("doc_id"), col("text"), 3)),

    // BM25 of a fixed bag-of-words query against the whole corpus
    "t_bm25" -> ((s, dir) =>
      TextAnalysis.bm25(docs(s, dir), col("doc_id"), col("text"),
        Seq("hash", "table", "merge", "scan"))),

    // benchmark decontamination: corpus docs sharing any token 4-gram with
    // the %97 benchmark sample (broadcast bench side)
    "t_decontam" -> ((s, dir) => {
      val d = docs(s, dir)
      val corpus = TextAnalysis.ngramSet(
        d.filter(col("doc_id") % 97 =!= 0), col("doc_id"), col("text"), 4)
      val bench = TextAnalysis.ngramSet(
        d.filter(col("doc_id") % 97 === 0), col("doc_id"), col("text"), 4)
      TextAnalysis.decontamOverlap(corpus, bench, 4)
    }),

    // Gopher-style repetition features, integer counts + rounded ratios
    "t_repeat" -> ((s, dir) =>
      TextAnalysis.repetition(docs(s, dir), col("doc_id"), col("text"))),

    // ---- deterministic sampling + span-level dedup ----

    // stratified md5-threshold sample: rebalance the corpus by language;
    // keep/drop is an exact integer compare, replayed bit-for-bit in SQL
    "d_sample" -> ((s, dir) =>
      Sampling.stratified(docs(s, dir), col("doc_id"), col("lang"),
          sampleRates, defaultRate = 0.5, salt = sampleSalt)
        .select("doc_id", "lang")),

    // coverage twin of d_sample: per-stratum population / kept / achieved
    // rate — skew introduced by sampling is visible in one small relation
    "d_sample_cov" -> ((s, dir) =>
      Sampling.stratifiedCoverage(docs(s, dir), col("doc_id"), col("lang"),
        sampleRates, defaultRate = 0.5, salt = sampleSalt)),

    // span-level exact dedup: every 8-token window occurring >1 time
    // corpus-wide, at every site (doc, position)
    "t_dupspans" -> ((s, dir) =>
      Spans.duplicatedSpans(docs(s, dir), col("doc_id"), col("text"), 8)),

    // per-document duplication profile over the same windows
    "t_spanprofile" -> ((s, dir) =>
      Spans.spanProfile(docs(s, dir), col("doc_id"), col("text"), 8))
  )

  /** d_sample strata: downsample the dominant language, keep the rest near
    * parity (rates chosen so every stratum exercises a distinct threshold). */
  private val sampleRates = Map("en" -> 0.35, "zh" -> 0.8, "fr" -> 0.6)
  private val sampleSalt = "r4"

  // ---------- DuckDB oracle twins ----------

  /** Shared shingle CTE (word k-grams, distinct per doc, sampled). */
  private def shingleSql(sampleMod: Int, k: Int = 5): String =
    s"""WITH sample AS (SELECT doc_id, text FROM documents WHERE doc_id % $sampleMod = 0),
       |toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM sample),
       |sh AS (
       |  SELECT DISTINCT doc_id, array_to_string(t[i:i+${k - 1}], ' ') AS shingle
       |  FROM toks, LATERAL (SELECT unnest(generate_series(1, greatest(len(t)-${k - 1}, 1))) AS i) g
       |)
       |""".stripMargin

  private val minhashSql: String =
    shingleSql(20) +
      """, mh AS (
        |  SELECT doc_id AS id, h, min(md5(CAST(h AS VARCHAR) || ':' || shingle)) AS minhash
        |  FROM sh, LATERAL (SELECT unnest(generate_series(0, 7)) AS h) hs
        |  GROUP BY 1, 2)
        |""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "d_dedup_exact" ->
      "SELECT md5(text) AS text_md5, count(*) AS n_docs, min(doc_id) AS keeper FROM documents GROUP BY 1",

    "d_minhash" -> (minhashSql + "SELECT id, h, minhash FROM mh"),

    "d_lsh_buckets" -> (shingleSql(20, 2) +
      """, mh AS (
        |  SELECT doc_id AS id, h, min(md5(CAST(h AS VARCHAR) || ':' || shingle)) AS minhash
        |  FROM sh, LATERAL (SELECT unnest(generate_series(0, 7)) AS h) hs
        |  GROUP BY 1, 2),
        |bands AS (
        |  SELECT CAST(floor(h / 1.0) AS INT) AS band, id,
        |         md5(string_agg(minhash, ',' ORDER BY h)) AS bucket
        |  FROM mh GROUP BY 1, 2)
        |SELECT band, bucket, count(*) AS n_docs FROM bands
        |GROUP BY 1, 2 HAVING count(*) > 1""".stripMargin),

    "d_lsh_coverage" -> (shingleSql(20, 2) +
      """, mh AS (
        |  SELECT doc_id AS id, h, min(md5(CAST(h AS VARCHAR) || ':' || shingle)) AS minhash
        |  FROM sh, LATERAL (SELECT unnest(generate_series(0, 7)) AS h) hs
        |  GROUP BY 1, 2),
        |bands AS (
        |  SELECT CAST(floor(h / 1.0) AS INT) AS band, id,
        |         md5(string_agg(minhash, ',' ORDER BY h)) AS bucket
        |  FROM mh GROUP BY 1, 2),
        |sized AS (SELECT band, bucket, count(*) AS bsz FROM bands GROUP BY 1, 2)
        |SELECT CAST(sum(bsz) AS BIGINT) AS n_rows, count(*) AS n_buckets,
        |  CAST(sum(CASE WHEN bsz > 2 THEN 1 ELSE 0 END) AS BIGINT) AS dropped_buckets,
        |  CAST(sum(CASE WHEN bsz > 2 THEN bsz ELSE 0 END) AS BIGINT) AS dropped_rows
        |FROM sized""".stripMargin),

    // same LSH front end as the Spark side, then the undirected transitive
    // closure as a recursive CTE (UNION dedups → terminates); min reachable
    // id under the undirected closure == min id of the connected component
    "d_dedup_cluster" -> (shingleSql(5, 3).replaceFirst("^WITH ", "WITH RECURSIVE ") +
      """, mh AS (
        |  SELECT doc_id AS id, h, min(md5(CAST(h AS VARCHAR) || ':' || shingle)) AS minhash
        |  FROM sh, LATERAL (SELECT unnest(generate_series(0, 7)) AS h) hs
        |  GROUP BY 1, 2),
        |bands AS (
        |  SELECT CAST(floor(h / 1.0) AS INT) AS band, id,
        |         md5(string_agg(minhash, ',' ORDER BY h)) AS bucket
        |  FROM mh GROUP BY 1, 2),
        |sized AS (SELECT band, bucket, id,
        |                 count(*) OVER (PARTITION BY band, bucket) AS bsz FROM bands),
        |cand AS (
        |  SELECT DISTINCT l.id AS a, r.id AS b
        |  FROM sized l JOIN sized r ON l.band = r.band AND l.bucket = r.bucket AND l.id < r.id
        |  WHERE l.bsz <= 1000 AND r.bsz <= 1000),
        |undir AS (SELECT a, b FROM cand UNION SELECT b AS a, a AS b FROM cand),
        |reach AS (
        |  SELECT DISTINCT doc_id AS id, doc_id AS comp FROM sample
        |  UNION
        |  SELECT u.b AS id, r.comp FROM reach r JOIN undir u ON u.a = r.id)
        |SELECT id, min(comp) AS cluster FROM reach GROUP BY 1""".stripMargin),

    "d_simhash" ->
      """WITH toks AS (
        |  SELECT doc_id, md5(tok) AS hx
        |  FROM (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |        FROM documents) t WHERE length(tok) > 0),
        |bits AS (
        |  SELECT doc_id, j,
        |         strpos('0123456789abcdef', substr(hx, CAST(floor(j/4.0) AS INT) + 1, 1)) - 1 AS digit
        |  FROM toks, LATERAL (SELECT unnest(generate_series(0, 15)) AS j) js),
        |votes AS (
        |  SELECT doc_id, j,
        |         sum((CAST(floor(digit / pow(2, 3 - j % 4)) AS INT) % 2) * 2 - 1) AS v
        |  FROM bits GROUP BY 1, 2)
        |SELECT doc_id AS id,
        |       CAST(sum(CASE WHEN v > 0 THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
        |FROM votes GROUP BY 1""".stripMargin,

    "d_jaccard" -> (shingleSql(5, 3) +
      """, sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |jac AS (
        |  SELECT inter.a, inter.b, inter.i * 1.0 / (sa.sz + sb.sz - inter.i) AS j
        |  FROM inter JOIN sizes sa ON sa.doc_id = inter.a JOIN sizes sb ON sb.doc_id = inter.b)
        |SELECT a, b, round(j + 1e-9, 6) AS jaccard FROM jac WHERE j >= 0.02""".stripMargin),

    "d_embed_neardup" ->
      """WITH v AS (SELECT vec_id AS id, embedding AS e FROM embeddings WHERE vec_id % 10 = 0),
        |dims AS (SELECT unnest(generate_series(0, 63)) AS d),
        |q AS (SELECT id, dims.d, CAST(round(CAST(e[dims.d + 1] AS DOUBLE) * 1000) AS BIGINT) AS qv
        |      FROM v CROSS JOIN dims),
        |bp AS (SELECT b AS band, p FROM (SELECT unnest(generate_series(0, 15)) AS b) bb
        |       CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS p) pp),
        |signs AS (SELECT band, p, dims.d,
        |  CASE WHEN (strpos('0123456789abcdef', substr(md5(band || ':' || p || ':' || dims.d), 1, 1)) - 1) % 2 = 0
        |       THEN 1 ELSE -1 END AS sg
        |  FROM bp CROSS JOIN dims),
        |sums AS (SELECT q.id, s.band, s.p, sum(q.qv * s.sg) AS t
        |         FROM q JOIN signs s ON s.d = q.d GROUP BY 1, 2, 3),
        |buckets AS (SELECT id, band,
        |  CAST(sum(CASE WHEN t > 0 THEN CAST(pow(2, p) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
        |  FROM sums GROUP BY 1, 2),
        |sized AS (SELECT *, count(*) OVER (PARTITION BY band, bucket) AS bsz FROM buckets),
        |cand AS (SELECT DISTINCT l.id AS a, r.id AS b
        |         FROM sized l JOIN sized r ON l.band = r.band AND l.bucket = r.bucket AND l.id < r.id
        |         WHERE l.bsz <= 500 AND r.bsz <= 500),
        |scored AS (SELECT c.a, c.b,
        |  round(list_cosine_similarity(CAST(va.e AS DOUBLE[]), CAST(vb.e AS DOUBLE[])) + 1e-9, 6) AS cos
        |  FROM cand c JOIN v va ON va.id = c.a JOIN v vb ON vb.id = c.b)
        |SELECT a, b, cos FROM scored WHERE cos >= 0.35""".stripMargin,

    "s_lsh_coverage" ->
      """WITH v AS (SELECT vec_id AS id, embedding AS e FROM embeddings WHERE vec_id % 10 = 0),
        |dims AS (SELECT unnest(generate_series(0, 63)) AS d),
        |q AS (SELECT id, dims.d, CAST(round(CAST(e[dims.d + 1] AS DOUBLE) * 1000) AS BIGINT) AS qv
        |      FROM v CROSS JOIN dims),
        |bp AS (SELECT b AS band, p FROM (SELECT unnest(generate_series(0, 15)) AS b) bb
        |       CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS p) pp),
        |signs AS (SELECT band, p, dims.d,
        |  CASE WHEN (strpos('0123456789abcdef', substr(md5(band || ':' || p || ':' || dims.d), 1, 1)) - 1) % 2 = 0
        |       THEN 1 ELSE -1 END AS sg
        |  FROM bp CROSS JOIN dims),
        |sums AS (SELECT q.id, s.band, s.p, sum(q.qv * s.sg) AS t
        |         FROM q JOIN signs s ON s.d = q.d GROUP BY 1, 2, 3),
        |buckets AS (SELECT id, band,
        |  CAST(sum(CASE WHEN t > 0 THEN CAST(pow(2, p) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
        |  FROM sums GROUP BY 1, 2),
        |sized AS (SELECT band, bucket, count(*) AS bsz FROM buckets GROUP BY 1, 2)
        |SELECT CAST(sum(bsz) AS BIGINT) AS n_sigs, count(*) AS n_buckets,
        |  CAST(sum(CASE WHEN bsz > 10 THEN 1 ELSE 0 END) AS BIGINT) AS dropped_buckets,
        |  CAST(sum(CASE WHEN bsz > 10 THEN bsz ELSE 0 END) AS BIGINT) AS dropped_sigs
        |FROM sized""".stripMargin,

    "s_ann_topk" ->
      """WITH scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) + 1e-9, 6) AS cos
        |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        |  WHERE q.vec_id % 100 = 0),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= 5""".stripMargin,

    "s_ivf_topk" ->
      """WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |cent AS (SELECT id AS cid, e AS ce FROM v ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT 8),
        |qd AS (
        |  SELECT v.id, c.cid,
        |    CAST(list_dot_product(list_transform(v.e, x -> round(x * 1000)),
        |                          list_transform(c.ce, x -> round(x * 1000))) AS BIGINT) AS s
        |  FROM v CROSS JOIN cent c),
        |assign AS (
        |  SELECT id, cid FROM (
        |    SELECT id, cid, row_number() OVER (PARTITION BY id ORDER BY s DESC, cid) AS rk FROM qd)
        |  WHERE rk = 1),
        |probe AS (
        |  SELECT id AS query_id, cid FROM (
        |    SELECT id, cid, row_number() OVER (PARTITION BY id ORDER BY s DESC, cid) AS rk
        |    FROM qd WHERE id % 100 = 0)
        |  WHERE rk <= 2),
        |cand AS (
        |  SELECT p.query_id, a.id AS neighbor_id
        |  FROM probe p JOIN assign a ON a.cid = p.cid AND a.id <> p.query_id),
        |scored AS (
        |  SELECT c.query_id, c.neighbor_id,
        |         round(list_cosine_similarity(q.e, n.e) + 1e-9, 6) AS cos
        |  FROM cand c JOIN v q ON q.id = c.query_id JOIN v n ON n.id = c.neighbor_id)
        |SELECT query_id, neighbor_id, cos, rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM scored) WHERE rank <= 5""".stripMargin,

    // two unrolled Lloyd iterations (assignment by exact integer-quantized
    // dot; update = mean of quantized members, re-rounded to 1e-6), then the
    // identical IVF probe/re-rank as s_ivf_topk
    "s_kmeans_ivf" -> {
      def lloyd(t: Int): String = {
        val prev = if (t == 1) "cent0" else s"cent${t - 1}"
        s"""s$t AS (
           |  SELECT qv.id, c.cid,
           |    CAST(list_dot_product(qv.q, list_transform(c.ce, x -> round(x * 1000))) AS BIGINT) AS s
           |  FROM qv CROSS JOIN $prev c),
           |a$t AS (
           |  SELECT id, cid FROM (
           |    SELECT id, cid, row_number() OVER (PARTITION BY id ORDER BY s DESC, cid) AS rk FROM s$t)
           |  WHERE rk = 1),
           |u$t AS (
           |  SELECT a.cid, g.i, sum(qv.q[g.i]) AS sx, count(*) AS n
           |  FROM a$t a JOIN qv USING (id),
           |       LATERAL (SELECT unnest(generate_series(1, len(qv.q))) AS i) g
           |  GROUP BY 1, 2),
           |cent$t AS (
           |  SELECT c.cid, coalesce(nu.ce, c.ce) AS ce
           |  FROM $prev c LEFT JOIN (
           |    SELECT cid, list(round(sx / (n * 1000.0) + 1e-9, 6) ORDER BY i) AS ce
           |    FROM u$t GROUP BY cid) nu USING (cid)),
           |""".stripMargin
      }
      s"""WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |qv AS (SELECT id, list_transform(e, x -> round(x * 1000)) AS q FROM v),
         |cent0 AS (SELECT id AS cid, e AS ce FROM v ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT 8),
         |${lloyd(1)}${lloyd(2)}qd AS (
         |  SELECT qv.id, c.cid,
         |    CAST(list_dot_product(qv.q, list_transform(c.ce, x -> round(x * 1000))) AS BIGINT) AS s
         |  FROM qv CROSS JOIN cent2 c),
         |assign AS (
         |  SELECT id, cid FROM (
         |    SELECT id, cid, row_number() OVER (PARTITION BY id ORDER BY s DESC, cid) AS rk FROM qd)
         |  WHERE rk = 1),
         |probe AS (
         |  SELECT id AS query_id, cid FROM (
         |    SELECT id, cid, row_number() OVER (PARTITION BY id ORDER BY s DESC, cid) AS rk
         |    FROM qd WHERE id % 100 = 0)
         |  WHERE rk <= 2),
         |cand AS (
         |  SELECT p.query_id, a.id AS neighbor_id
         |  FROM probe p JOIN assign a ON a.cid = p.cid AND a.id <> p.query_id),
         |scored AS (
         |  SELECT c.query_id, c.neighbor_id,
         |         round(list_cosine_similarity(q.e, n.e) + 1e-9, 6) AS cos
         |  FROM cand c JOIN v q ON q.id = c.query_id JOIN v n ON n.id = c.neighbor_id)
         |SELECT query_id, neighbor_id, cos, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM scored) WHERE rank <= 5""".stripMargin
    },

    // k-means|| seeding replayed exactly: 2 distance-weighted oversampling
    // rounds (u(t,id)·total < l·cost on exact-integer squared L2), candidates
    // weighted by argmin assignment (ties → lowest cid), heaviest 8 kept
    // (ties → md5(cid), cid), one Lloyd iteration, then the identical IVF
    // probe/re-rank as s_kmeans_ivf
    "s_kmeanspar_ivf" -> {
      // first 8 md5 hex digits → uniform [0,1) — same machinery as the
      // SGD/LDA oracles (exact integer terms, order-free)
      def hexU(hexExpr: String): String =
        (1 to 8).map(i =>
          s"(strpos('0123456789abcdef', substr($hexExpr, $i, 1)) - 1) * ${math.pow(16, 8 - i).toLong}.0")
          .mkString("(", " + ", ") / 4294967296.0")
      // exact integer squared L2 between quantized vectors a and b
      def d2(a: String, b: String): String =
        s"CAST(list_dot_product($a, $a) + list_dot_product($b, $b) - 2 * list_dot_product($a, $b) AS BIGINT)"
      // one oversampling round: cost vs seeds$p, exact total, md5 selection
      def round(t: Int): String = {
        val p = t - 1
        s"""c$t AS (
           |  SELECT qv.id, min(${d2("qv.q", "s.sq")}) AS cost
           |  FROM qv CROSS JOIN seeds${p}q s GROUP BY 1),
           |t$t AS (SELECT CAST(sum(CAST(cost AS HUGEINT)) AS DOUBLE) AS tot FROM c$t),
           |sel$t AS (
           |  SELECT c.id FROM c$t c, t$t
           |  WHERE ${hexU(s"md5('$t:' || c.id)")} * t$t.tot < 8.0 * CAST(c.cost AS DOUBLE)),
           |seeds$t AS (SELECT cid FROM seeds$p UNION ALL SELECT id AS cid FROM sel$t),
           |seeds${t}q AS (SELECT s.cid, qv.q AS sq FROM seeds$t s JOIN qv ON qv.id = s.cid),
           |""".stripMargin
      }
      // one Lloyd iteration (same fragment shape as the s_kmeans_ivf twin)
      def lloyd(t: Int): String = {
        val prev = s"cent${t - 1}"
        s"""s$t AS (
           |  SELECT qv.id, c.cid,
           |    CAST(list_dot_product(qv.q, list_transform(c.ce, x -> round(x * 1000))) AS BIGINT) AS s
           |  FROM qv CROSS JOIN $prev c),
           |a$t AS (
           |  SELECT id, cid FROM (
           |    SELECT id, cid, row_number() OVER (PARTITION BY id ORDER BY s DESC, cid) AS rk FROM s$t)
           |  WHERE rk = 1),
           |u$t AS (
           |  SELECT a.cid, g.i, sum(qv.q[g.i]) AS sx, count(*) AS n
           |  FROM a$t a JOIN qv USING (id),
           |       LATERAL (SELECT unnest(generate_series(1, len(qv.q))) AS i) g
           |  GROUP BY 1, 2),
           |cent$t AS (
           |  SELECT c.cid, coalesce(nu.ce, c.ce) AS ce
           |  FROM $prev c LEFT JOIN (
           |    SELECT cid, list(round(sx / (n * 1000.0) + 1e-9, 6) ORDER BY i) AS ce
           |    FROM u$t GROUP BY cid) nu USING (cid)),
           |""".stripMargin
      }
      s"""WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |qv AS (SELECT id, e, list_transform(e, x -> round(x * 1000)) AS q FROM v),
         |seeds0 AS (SELECT id AS cid FROM qv ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT 1),
         |seeds0q AS (SELECT s.cid, qv.q AS sq FROM seeds0 s JOIN qv ON qv.id = s.cid),
         |${round(1)}${round(2)}cand AS (
         |  SELECT s.cid, qv.q AS sq, qv.e AS se FROM seeds2 s JOIN qv ON qv.id = s.cid),
         |asg AS (
         |  SELECT id, cid FROM (
         |    SELECT qv.id, c.cid,
         |      row_number() OVER (PARTITION BY qv.id ORDER BY ${d2("qv.q", "c.sq")} ASC, c.cid ASC) AS rk
         |    FROM qv CROSS JOIN cand c) WHERE rk = 1),
         |wt AS (SELECT cid, count(*) AS w FROM asg GROUP BY 1),
         |cent0 AS (
         |  SELECT c.cid, c.se AS ce FROM cand c LEFT JOIN wt USING (cid)
         |  ORDER BY coalesce(wt.w, 0) DESC, md5(CAST(c.cid AS VARCHAR)), c.cid LIMIT 8),
         |${lloyd(1)}qd AS (
         |  SELECT qv.id, c.cid,
         |    CAST(list_dot_product(qv.q, list_transform(c.ce, x -> round(x * 1000))) AS BIGINT) AS s
         |  FROM qv CROSS JOIN cent1 c),
         |assign AS (
         |  SELECT id, cid FROM (
         |    SELECT id, cid, row_number() OVER (PARTITION BY id ORDER BY s DESC, cid) AS rk FROM qd)
         |  WHERE rk = 1),
         |probe AS (
         |  SELECT id AS query_id, cid FROM (
         |    SELECT id, cid, row_number() OVER (PARTITION BY id ORDER BY s DESC, cid) AS rk
         |    FROM qd WHERE id % 100 = 0)
         |  WHERE rk <= 2),
         |cnd AS (
         |  SELECT p.query_id, a.id AS neighbor_id
         |  FROM probe p JOIN assign a ON a.cid = p.cid AND a.id <> p.query_id),
         |scored AS (
         |  SELECT c.query_id, c.neighbor_id,
         |         round(list_cosine_similarity(q.e, n.e) + 1e-9, 6) AS cos
         |  FROM cnd c JOIN v q ON q.id = c.query_id JOIN v n ON n.id = c.neighbor_id)
         |SELECT query_id, neighbor_id, cos, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM scored) WHERE rank <= 5""".stripMargin
    },

    "t_lang" -> {
      val occ = (m: String) =>
        s"CAST((length(p) - length(replace(p, '$m', ''))) / ${m.length} AS BIGINT)"
      val scores = TextAnalysis.langMarkers.map { case (lang, ms) =>
        ms.map(occ).mkString(" + ") + s" AS score_$lang"
      }.mkString(",\n       ")
      s"""WITH padded AS (SELECT doc_id, ' ' || lower(text) || ' ' AS p FROM documents),
         |scored AS (
         |  SELECT doc_id AS id,
         |       $scores
         |  FROM padded)
         |SELECT id,
         |  CASE WHEN score_en >= score_es AND score_en >= score_de AND score_en >= score_fr AND score_en > 0 THEN 'en'
         |       WHEN score_es >= score_de AND score_es >= score_fr AND score_es > 0 THEN 'es'
         |       WHEN score_de >= score_fr AND score_de > 0 THEN 'de'
         |       WHEN score_fr > 0 THEN 'fr'
         |       ELSE 'und' END AS lang_pred,
         |  score_en, score_es, score_de, score_fr
         |FROM scored""".stripMargin
    },

    "t_quality" ->
      """WITH f AS (
        |  SELECT doc_id AS id,
        |    length(text) AS n_chars,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
        |    length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS n_alpha,
        |    length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct
        |  FROM documents),
        |r AS (
        |  SELECT *,
        |    CASE WHEN n_chars > 0 THEN n_alpha * 1.0 / n_chars ELSE 0.0 END AS ar,
        |    CASE WHEN n_chars > 0 THEN n_punct * 1.0 / n_chars ELSE 0.0 END AS pr,
        |    CASE WHEN n_tokens > 0 THEN n_chars * 1.0 / n_tokens ELSE 0.0 END AS mt
        |  FROM f)
        |SELECT id, n_chars, n_tokens, n_alpha, n_punct,
        |  round(ar + 1e-9, 6) AS alpha_ratio,
        |  round(pr + 1e-9, 6) AS punct_ratio,
        |  (CASE WHEN n_chars BETWEEN 100 AND 10000 THEN 0.25 ELSE 0.0 END +
        |   CASE WHEN ar >= 0.6 THEN 0.25 ELSE 0.0 END +
        |   CASE WHEN pr <= 0.1 THEN 0.25 ELSE 0.0 END +
        |   CASE WHEN mt BETWEEN 3 AND 12 THEN 0.25 ELSE 0.0 END) AS quality
        |FROM r""".stripMargin,

    "t_tokens" ->
      """SELECT doc_id AS id,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE len(string_split_regex(trim(text), '\s+')) END AS ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe_tokens
        |FROM documents""".stripMargin,

    "t_fingerprint" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM documents)
        |SELECT doc_id AS id,
        |       min(md5(array_to_string(t[i:i+4], ' '))) AS fingerprint
        |FROM toks, LATERAL (SELECT unnest(generate_series(1, greatest(len(t)-4, 1))) AS i) g
        |GROUP BY 1""".stripMargin,

    "m_features" ->
      """WITH hexes AS (SELECT doc_id, md5(text) AS hx FROM documents),
        |bytes AS (
        |  SELECT doc_id, k,
        |    16 * (strpos('0123456789abcdef', substr(hx, 2*k - 1, 1)) - 1)
        |       + (strpos('0123456789abcdef', substr(hx, 2*k, 1)) - 1) AS b
        |  FROM hexes, LATERAL (SELECT unnest(generate_series(1, 16)) AS k) ks)
        |SELECT doc_id AS id,
        |  CAST(max(CASE WHEN k = 1 THEN b END) % 64 + 1 AS INT) AS width,
        |  CAST(max(CASE WHEN k = 2 THEN b END) % 64 + 1 AS INT) AS height,
        |  sum(b) * 1.0 / 16 AS mean_byte
        |FROM bytes GROUP BY 1""".stripMargin,

    // ---- retrieval / decontamination / repetition (round-4 additions) ----

    "t_invindex" -> (tokSql +
      """SELECT term, count(DISTINCT id) AS df, count(*) AS tf_total, min(id) AS min_doc
        |FROM toks GROUP BY 1""".stripMargin),

    "t_tfidf" -> (tokSql +
      """, tf AS (SELECT id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, count(DISTINCT id) AS df FROM toks GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |ranked AS (
        |  SELECT tf.id, tf.term, tf.tf, df.df,
        |         row_number() OVER (PARTITION BY tf.id
        |                            ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rk
        |  FROM tf JOIN df USING (term))
        |SELECT id, rk, term, tf, df,
        |       round(tf * ln(n.n * 1.0 / df) + 1e-9, 6) AS tfidf
        |FROM ranked, n WHERE rk <= 3""".stripMargin),

    "t_bm25" -> (tokSql +
      """, q AS (SELECT unnest(['hash', 'table', 'merge', 'scan']) AS term),
        |dl AS (SELECT id, count(*) AS dl FROM toks GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |avgdl AS (SELECT avg(dl) AS avgdl FROM dl),
        |tf AS (SELECT id, term, count(*) AS tf FROM toks JOIN q USING (term) GROUP BY 1, 2),
        |df AS (SELECT term, count(DISTINCT id) AS df
        |       FROM toks JOIN q USING (term) GROUP BY 1)
        |SELECT tf.id,
        |  round(sum(ln(1 + (n.n - df.df + 0.5) / (df.df + 0.5))
        |            * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / avgdl.avgdl)))
        |        + 1e-9, 6) AS bm25,
        |  count(*) AS n_terms_hit
        |FROM tf JOIN df USING (term) JOIN dl USING (id), n, avgdl
        |GROUP BY 1""".stripMargin),

    "t_decontam" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, array_to_string(t[i:i+3], ' ') AS ngram
        |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(t)-3)) AS i) g
        |  WHERE len(t) >= 4),
        |corpus AS (SELECT * FROM grams WHERE doc_id % 97 <> 0),
        |bench AS (SELECT * FROM grams WHERE doc_id % 97 = 0)
        |SELECT c.doc_id AS id, count(DISTINCT c.ngram) AS n_shared,
        |       min(b.doc_id) AS min_bench
        |FROM corpus c JOIN bench b USING (ngram)
        |GROUP BY 1""".stripMargin,

    "t_repeat" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t,
        |                  length(trim(text)) AS lt FROM documents),
        |base AS (
        |  SELECT doc_id,
        |    CASE WHEN lt = 0 THEN 0 ELSE len(t) END AS total,
        |    len(list_distinct(t)) AS n_distinct,
        |    list_max(list_transform(list_distinct(t),
        |                            x -> len(list_filter(t, y -> y = x)))) AS top_tok,
        |    greatest(len(t) - 2, 0) AS n3,
        |    len(list_distinct(list_transform(generate_series(1, greatest(len(t) - 2, 1)),
        |                                     i -> array_to_string(t[i:i+2], ' ')))) AS d3
        |  FROM t)
        |SELECT doc_id AS id, CAST(total AS BIGINT) AS n_tokens,
        |  CAST(n_distinct AS BIGINT) AS n_distinct, CAST(top_tok AS BIGINT) AS top_tok,
        |  CAST(CASE WHEN n3 > 0 THEN n3 - d3 ELSE 0 END AS BIGINT) AS dup_3grams,
        |  round(CASE WHEN total > 0 THEN top_tok * 1.0 / total ELSE 0 END + 1e-9, 6) AS top_tok_frac,
        |  round(CASE WHEN total > 0 THEN n_distinct * 1.0 / total ELSE 0 END + 1e-9, 6) AS distinct_frac,
        |  round(CASE WHEN n3 > 0 THEN (n3 - d3) * 1.0 / n3 ELSE 0 END + 1e-9, 6) AS dup_3gram_frac
        |FROM base""".stripMargin,

    // ---- deterministic sampling + span-level dedup ----

    "d_sample" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE ${hexI(s"md5(doc_id || ':$sampleSalt')")} < $sampleThrSql""".stripMargin,

    "d_sample_cov" ->
      s"""SELECT lang AS stratum, count(*) AS n_rows,
         |  CAST(sum(CASE WHEN ${hexI(s"md5(doc_id || ':$sampleSalt')")} < $sampleThrSql
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  round(CAST(sum(CASE WHEN ${hexI(s"md5(doc_id || ':$sampleSalt')")} < $sampleThrSql
         |             THEN 1 ELSE 0 END) AS BIGINT) * 1.0 / count(*) + 1e-9, 6) AS achieved_rate
         |FROM documents GROUP BY 1""".stripMargin,

    "t_dupspans" -> (spanSql +
      "SELECT doc_id, pos, h, n_occurrences FROM g JOIN hot USING (h)"),

    "t_spanprofile" -> (spanSql +
      """, d AS (SELECT doc_id, count(*) AS n_dup_windows,
        |               max(n_occurrences) AS max_occurrences
        |        FROM g JOIN hot USING (h) GROUP BY 1)
        |SELECT t.doc_id, greatest(len(t.t) - 7, 0) AS n_windows,
        |       coalesce(d.n_dup_windows, 0) AS n_dup_windows,
        |       coalesce(d.max_occurrences, 0) AS max_occurrences
        |FROM toks t LEFT JOIN d USING (doc_id)""".stripMargin)
  )

  /** md5 hex prefix → exact 32-bit integer (BIGINT arithmetic end to end —
    * the twin of Sampling.bucket's conv(substring(md5(..),1,8),16,10)). */
  private def hexI(hexExpr: String): String =
    (1 to 8).map(i =>
      s"(strpos('0123456789abcdef', substr($hexExpr, $i, 1)) - 1) * ${math.pow(16, 8 - i).toLong}")
      .mkString("(", " + ", ")")

  /** Per-stratum integer thresholds, generated from the SAME Map and the
    * SAME Sampling.threshold the Spark gate uses — the two sides cannot
    * drift. */
  private def sampleThrSql: String = {
    val cases = sampleRates.toSeq.sortBy(_._1)
      .map { case (k, r) => s"WHEN '$k' THEN ${Sampling.threshold(r)}" }.mkString(" ")
    s"(CASE lang $cases ELSE ${Sampling.threshold(0.5)} END)"
  }

  /** Shared 8-token-window CTE for the span twins — matches
    * Spans.windowHashes (trim + whitespace split, 1-based positions). */
  private def spanSql: String =
    """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
      |g AS (SELECT doc_id, i AS pos, md5(array_to_string(t[i:i+7], ' ')) AS h
      |      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t)-7)) AS i) u
      |      WHERE len(t) >= 8),
      |hot AS (SELECT h, count(*) AS n_occurrences FROM g GROUP BY 1 HAVING count(*) > 1)
      |""".stripMargin

  /** Shared lowered-whitespace-token CTE for the retrieval twins — matches
    * TextAnalysis.tokenRows (trim + lower + split, empty tokens dropped). */
  private def tokSql: String =
    """WITH toks AS (
      |  SELECT doc_id AS id, tok AS term
      |  FROM (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
      |        FROM documents) t
      |  WHERE length(tok) > 0)
      |""".stripMargin
}
