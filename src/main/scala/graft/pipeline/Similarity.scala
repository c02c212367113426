package graft.pipeline

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`). The dot
 * products are `zip_with` + `aggregate` higher-order functions — codegen'd,
 * no UDFs — with everything cast to double first so results are
 * engine-reproducible.
 *
 * Scale notes: `bruteTopK` is O(Q×N) — the correctness baseline and fine for
 * modest query sets broadcast against a large corpus. The banded multi-table
 * LSH below is the scale path: deterministic random-hyperplane signatures
 * bucket the corpus per band; candidates = same-bucket vectors, exactly
 * re-ranked. Hyperplane components derive from md5, so index and query sides
 * agree with no shared RNG state. Capped buckets are NOT silent: every capped
 * entry point has a `bandedCoverage` twin reporting dropped buckets/rows.
 */
object Similarity {

  /** Σ a_i·b_i, double-cast, sequential left fold (reproducible). Native
    * codegen'd expression — bit-identical to the old
    * `aggregate(zip_with(...))` fold but without the CodegenFallback
    * per-element interpretation or the intermediate product array. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorDot.vector_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /**
   * Brute-force cosine top-k: for each query vector, the k nearest corpus
   * vectors (self excluded), ranked by rounded cosine (6dp, +1e-9 nudge) with
   * id tie-break so the ranking is reproducible across engines.
   */
  def bruteTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"))
    val c = corpus.select(col("id").as("neighbor_id"), col("vec").as("cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")) + 1e-9, 6).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  // ---------------- banded multi-table LSH (the 100 TB path) ----------------
  //
  // A single-table LSH (one signature of `planes` bits over the whole corpus,
  // shipped in round 1 and since deleted) collapses every vector into
  // 2^planes global buckets — at corpus scale each bucket is a constant
  // fraction of the data and the in-bucket join is quadratic. The banded
  // scheme fixes both knobs
  // independently: `bands` hash tables (union of candidates → recall), each
  // keyed by `planes` sign bits (bucket granularity → precision), plus a
  // per-bucket size cap like Dedup.lshCandidates (hot-bucket guard; capped
  // drops are a documented recall tradeoff, not a silent crash).
  //
  // Hyperplane sums run over 1e-3-QUANTIZED components: exact integer
  // arithmetic, so the sign is order-independent and bit-identical in any
  // engine (the DuckDB twin replays it) — a double-precision dot would flip
  // boundary signs between engines.

  /** ±1 sign for (band, plane, dim) — md5 hex-digit parity of "band:p:d",
    * computed ONCE on the driver and folded in as literals. The column-
    * expression version of this (md5 inside the zip_with lambda) re-hashed
    * every (band, plane, dim) triple PER ROW — bands·planes·dim ≈ 2k md5
    * calls per vector; the signs are row-independent, so that work belongs
    * at plan-build time. Same digest formula, bit-identical buckets. */
  private def signOf(band: Int, p: Int, d: Int): Long = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$band:$p:$d".getBytes(StandardCharsets.UTF_8))
    if ((((digest(0) >> 4) & 0xf) % 2) == 0) 1L else -1L
  }

  /** One band's bucket id: `planes` sign bits of integer hyperplane sums.
    * `dim` is the (uniform) embedding dimensionality — sign vectors are
    * plan-time literal arrays. */
  def bandBucket(vec: Column, band: Int, planes: Int, dim: Int): Column = {
    val q = transform(vec, x => round(x.cast("double") * 1000).cast("long"))
    (0 until planes).map { p =>
      val signs = array((0 until dim).map(d => lit(signOf(band, p, d))): _*)
      val s = aggregate(zip_with(q, signs, _ * _), lit(0L), _ + _)
      when(s > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** (id, vec, band, bucket) — one row per band per vector. Requires a
    * uniform embedding dim (one-row probe; ragged inputs would bucket to 0). */
  def bandedSignatures(vecs: DataFrame, bands: Int, planes: Int): DataFrame = {
    val dim = vecs.select(size(col("vec")).as("d")).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)
    vecs.select(col("id"), col("vec"),
      posexplode(array((0 until bands).map(b =>
        bandBucket(col("vec"), b, planes, dim)): _*)).as(Seq("band", "bucket")))
  }

  /** Candidate pairs (a<b) sharing any band bucket, with per-bucket size cap.
    * Capped buckets are excluded — pair with `bandedCoverage` (same knobs) to
    * surface how much the cap dropped; drops are a recall tradeoff, never
    * silent. */
  def bandedCandidates(vecs: DataFrame, bands: Int, planes: Int,
                       maxBucket: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket")
    val sized = bandedSignatures(vecs, bands, planes)
      .withColumn("bsz", count("*").over(w))
      .filter(col("bsz") <= maxBucket)
    val l = sized.select(col("band"), col("bucket"), col("id").as("a"), col("vec").as("va"))
    val r = sized.select(col("band"), col("bucket"), col("id").as("b"), col("vec").as("vb"))
    l.join(r, Seq("band", "bucket")).filter(col("a") < col("b"))
      .select("a", "b", "va", "vb").dropDuplicates("a", "b")
  }

  /**
   * Coverage report for the capped banded-LSH paths — drops must be VISIBLE,
   * not silent: a pathological bucket (zero vectors, boilerplate clusters)
   * over `maxBucket` is excluded from candidate generation, which is a recall
   * tradeoff the operator of a 100 TB dedup run has to see. One row:
   * (n_sigs, n_buckets, dropped_buckets, dropped_sigs) where dropped_* count
   * band-buckets over the cap and the signature rows inside them.
   */
  def bandedCoverage(vecs: DataFrame, bands: Int, planes: Int,
                     maxBucket: Int): DataFrame =
    bandedSignatures(vecs, bands, planes)
      .groupBy("band", "bucket").agg(count("*").as("bsz"))
      .agg(
        sum("bsz").as("n_sigs"),
        count("*").as("n_buckets"),
        sum(when(col("bsz") > maxBucket, 1L).otherwise(0L)).as("dropped_buckets"),
        sum(when(col("bsz") > maxBucket, col("bsz")).otherwise(0L)).as("dropped_sigs"))

  /** Near-duplicate pairs via banded LSH candidates + exact cosine re-check.
    * The scale path for `cosineNearDup`: candidate generation is bucketed
    * (bands × capped buckets), never an all-pairs join. */
  def lshNearDup(vecs: DataFrame, threshold: Double, bands: Int = 16,
                 planes: Int = 2, maxBucket: Int = 500): DataFrame =
    bandedCandidates(vecs, bands, planes, maxBucket)
      .select(col("a"), col("b"),
        round(cosine(col("va"), col("vb")) + 1e-9, 6).as("cos"))
      .filter(col("cos") >= threshold)

  /** ANN top-k via banded LSH: per-band shared-bucket candidates, unioned
    * across bands, exactly re-ranked. Recall is tuned by (bands, planes);
    * measured ≥0.9 @k=5 on the test embeddings (PipelineSpec). */
  def lshBandedTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                    bands: Int = 16, planes: Int = 2,
                    maxBucket: Int = 500): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket")
    val cSig = bandedSignatures(corpus, bands, planes)
      .withColumn("bsz", count("*").over(w))
      .filter(col("bsz") <= maxBucket)
      .select(col("band"), col("bucket"), col("id").as("neighbor_id"), col("vec").as("cv"))
    val qSig = bandedSignatures(queries, bands, planes)
      .select(col("band"), col("bucket"), col("id").as("query_id"), col("vec").as("qv"))
    val cand = qSig.join(cSig, Seq("band", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
    val scored = cand.select(col("query_id"), col("neighbor_id"),
      round(cosine(col("qv"), col("cv")) + 1e-9, 6).as("cos"))
    val rw = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(rw)).filter(col("rank") <= k)
  }

  // ---------------- IVF (inverted-file) ANN ----------------
  //
  // The other classic ANN scale path next to LSH banding: partition the
  // corpus into C centroid lists, search only the nProbe nearest lists per
  // query. Centroid SELECTION is pluggable: `ivfCentroids` is a deterministic
  // md5-ordered sample, [[kmeansParSeeds]] below is the scalable k-means||
  // seeding, and [[kmeansCentroids]] Lloyd-refines either — swap the centroid
  // table and nothing else changes. Assignment and probing rank by
  // EXACT integer-quantized dot products (1e-3 quantization, the same trick
  // as the banded LSH above), so list membership is order-independent and
  // bit-identical in any engine; only the final re-rank uses true cosine.
  // Scale shape: centroids broadcast (C ≪ |corpus|), assignment is one
  // narrow pass, and each query touches nProbe/C of the corpus.

  /** 1e-3 quantization: `array<long>` of round(x·1000). */
  def quantize(v: Column): Column =
    transform(v, x => round(x.cast("double") * 1000).cast("long"))

  /** Σ round(a_i·1000)·round(b_i·1000) — exact integer dot (order-free,
    * engine-reproducible; values bounded by 64·(10³·|x|ₘₐₓ)² ≪ 2⁶³). */
  def quantDot(a: Column, b: Column): Column =
    aggregate(zip_with(quantize(a), quantize(b), _ * _), lit(0L), _ + _)

  /** Integer dot of two ALREADY-quantized vectors (quantize once per row,
    * not once per compared pair — 16 centroids otherwise re-round each
    * corpus vector 16×). */
  def quantizedDot(qa: Column, qb: Column): Column =
    aggregate(zip_with(qa, qb, _ * _), lit(0L), _ + _)

  /** The C corpus rows with the smallest md5(id) — a deterministic,
    * engine-replayable "random" centroid sample. */
  def ivfCentroids(corpus: DataFrame, c: Int): DataFrame =
    corpus.orderBy(md5(col("id").cast("string")), col("id")).limit(c)
      .select(col("id").as("cid"), col("vec").as("cvec"))

  /** `max(struct(s, -cid))` — the argmax (highest score, ties → LOWEST cid)
    * as a partial-aggregable fold over exact integers. The row_number-window
    * form of this shuffles all N×C scored rows (window functions have no
    * map-side combine); max() collapses each corpus partition's C rows per
    * id to one BEFORE the exchange, so the shuffle is N rows regardless of
    * the centroid count. */
  private def bestCentroid(s: Column, cid: Column): Column =
    max(struct(s.as("s"), (-cid).as("nc")))

  /** (id, vec, cid): each corpus vector assigned to its argmax-quantized-dot
    * centroid (ties → lowest cid). One broadcast pass; the only shuffle is
    * N pre-aggregated rows (see [[bestCentroid]]). */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = corpus.withColumn("_qv", quantize(col("vec")))
      .crossJoin(broadcast(centroids.withColumn("_qc", quantize(col("cvec")))))
      .select(col("id"), col("vec"), col("cid"),
        quantizedDot(col("_qv"), col("_qc")).as("s"))
    scored.groupBy("id")
      .agg(bestCentroid(col("s"), col("cid")).as("_m"),
        first(col("vec")).as("vec")) // vec is constant per id
      .select(col("id"), col("vec"), (-col("_m.nc")).as("cid"))
  }

  // ---------------- k-means centroid training (Lloyd, deterministic) --------
  //
  // Closes the "swap ivfCentroids for a trained set" seam: a deterministic,
  // engine-replayable Lloyd refinement of the md5-sample seeds. Every step is
  // order-free by construction so DuckDB replays it bit-for-bit: assignment
  // ranks by the same EXACT integer-quantized dot as ivfAssign, and the
  // update is the per-dimension MEAN of the members' 1e-3-quantized values —
  // integer sums carried in doubles (exact far past any realistic cluster:
  // 2^53/10^4 ≈ 10^12 members before the sum could round), divided and
  // re-rounded to 1e-6 with the codebase's standard +1e-9 tie nudge. Empty
  // clusters keep their previous centroid, so k never shrinks. 100 TB shape =
  // k-means||'s refinement loop: centroids broadcast (C ≪ N), one narrow
  // assignment pass per iteration, the update ONE vector_sum shuffle with C
  // groups (map-side partials keep it an all-reduce, not a data move).

  /** `iters` Lloyd iterations from the md5-sample seeds (or an explicit
    * `seeds` table) → (cid, cvec) with cvec rounded to 1e-6. cid stays the
    * seed row's corpus id. */
  def kmeansCentroids(corpus: DataFrame, c: Int, iters: Int,
                      seeds: DataFrame = null): DataFrame = {
    val qv = corpus.select(col("id"), quantize(col("vec")).as("_qv"))
    var cent = if (seeds == null) ivfCentroids(corpus, c) else seeds
    for (_ <- 1 to iters) {
      val scored = qv.crossJoin(broadcast(
          cent.select(col("cid"), quantize(col("cvec")).as("_qc"))))
        .select(col("id"), col("_qv"), col("cid"),
          quantizedDot(col("_qv"), col("_qc")).as("s"))
      val assigned = scored.groupBy("id")
        .agg(bestCentroid(col("s"), col("cid")).as("_m"),
          first(col("_qv")).as("_qv")) // _qv is constant per id
        .select((-col("_m.nc")).as("cid"), col("_qv"))
      val upd = assigned.groupBy("cid")
        .agg(count(lit(1)).as("_n"),
          graft.functions.VectorSum.vector_sum(col("_qv").cast("array<double>")).as("_sx"))
        .select(col("cid"),
          transform(col("_sx"), x => round(x / (col("_n") * lit(1000.0)) + lit(1e-9), 6)).as("_new"))
      cent = cent.join(upd, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("_new"), col("cvec")).as("cvec"))
    }
    cent
  }

  /** Exact integer squared L2 distance of two ALREADY-quantized vectors
    * (order-free: every term is an exact long). */
  def quantSqDist(qa: Column, qb: Column): Column =
    aggregate(zip_with(qa, qb, (x, y) => (x - y) * (x - y)), lit(0L), _ + _)

  private def md5HexStr(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map(b => f"${b & 0xff}%02x").mkString

  // ---------------- k-means|| seeding (Bahmani et al., VLDB'12) -------------
  //
  // The scalable seeding the ivfCentroids comment promises: instead of one
  // md5-ordered sample, oversample l·rounds candidates weighted by their
  // squared distance to the current seed set, then keep the C heaviest
  // candidates (by assigned-point count). Deterministic and engine-replayable
  // end to end: distances are exact integer quantized L2 (so min/argmin can't
  // flip cross-engine), the per-round sampling uses the codebase's
  // md5-first-8-hex-digits uniform (u·total < l·cost — both sides exactly
  // rounded doubles of exact integers), and ties break on (weight desc,
  // md5(cid), cid). 100 TB shape: seeds stay driver-side K-row lists folded
  // in as broadcast literals, so each round is ONE narrow codegen'd pass over
  // the corpus (no shuffle at all — the cost fold is a scalar aggregate) and
  // the weighting pass shuffles only pre-aggregated (candidate, count) rows.
  // The exact-integer total requires N·d2max < 2^63 (≈3·10^10 unit-norm
  // 64-dim rows); past that, sum per-partition into decimals — the driver
  // totals stay exact either way via the decimal(38,0) cast used here.

  /** k-means|| candidate seeds → the `c` heaviest as (cid, cvec). `cid` is
    * the seed row's corpus id; `cvec` its (double-cast) vector. Compose with
    * [[kmeansCentroids]]`(seeds = …)` for Lloyd refinement and
    * [[ivfTopKWith]] for search. */
  def kmeansParSeeds(corpus: DataFrame, c: Int, rounds: Int = 2,
                     l: Int = 8): DataFrame = {
    val spark = corpus.sparkSession
    import org.apache.spark.sql.types.DecimalType
    val qv = corpus.select(col("id"), col("vec").cast("array<double>").as("vec"),
      quantize(col("vec")).as("_qv"))
    // round 0: the single min-md5 corpus row (ivfCentroids' rule at c = 1)
    var seeds: Seq[(Long, Seq[Double], Seq[Long])] =
      qv.orderBy(md5(col("id").cast("string")), col("id")).limit(1).collect()
        .toSeq.map(r => (r.getLong(0), r.getSeq[Double](1), r.getSeq[Long](2)))
    for (t <- 1 to rounds) {
      val seedQ = typedlit(seeds.map(_._3))
      val cost = array_min(transform(seedQ, sv => quantSqDist(col("_qv"), sv)))
      val costed = qv.withColumn("_cost", cost)
      val totalD = costed.agg(sum(col("_cost").cast(DecimalType(38, 0))))
        .head().getDecimal(0).doubleValue
      // u(t, id) — uniform [0,1) from md5("t:id"); select iff u·total < l·cost
      val u = conv(substring(md5(concat(lit(s"$t:"), col("id").cast("string"))), 1, 8),
        16, 10).cast("long").cast("double") / lit(4294967296.0)
      val sel = costed
        .filter(u * lit(totalD) < lit(l.toDouble) * col("_cost").cast("double"))
        .select(col("id"), col("vec"), col("_qv")).collect()
      seeds = seeds ++ sel.map(r => (r.getLong(0), r.getSeq[Double](1), r.getSeq[Long](2)))
    }
    // weight candidates by assigned-point count (argmin d2, ties → lowest
    // cid: candidates fold in cid-ascending, array_position takes the FIRST
    // minimum), keep the c heaviest (ties → md5(cid), cid — replayable)
    val cand = seeds.sortBy(_._1)
    val candQ = typedlit(cand.map(_._3))
    val d2s = transform(candQ, sv => quantSqDist(col("_qv"), sv))
    val weights = qv.select(array_position(d2s, array_min(d2s)).as("_ci"))
      .groupBy("_ci").agg(count(lit(1)).as("w"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val chosen = cand.zipWithIndex.map { case ((cid, cvec, _), i) =>
      (cid, cvec, weights.getOrElse(i + 1, 0L))
    }.sortBy { case (cid, _, w) => (-w, md5HexStr(cid.toString), cid) }.take(c)
    import spark.implicits._
    chosen.map { case (cid, cvec, _) => (cid, cvec) }.toDF("cid", "cvec")
  }

  /** IVF ANN top-k over an EXPLICIT centroid table (e.g. `kmeansCentroids`):
    * probe the `nProbe` best centroid lists per query (same integer-dot
    * ranking as assignment), exact cosine re-rank within the probed lists
    * only — never the whole corpus. */
  def ivfTopKWith(queries: DataFrame, corpus: DataFrame, k: Int,
                  cent: DataFrame, nProbe: Int): DataFrame = {
    val assigned = ivfAssign(corpus, cent)
    val probes = queries.withColumn("_qv", quantize(col("vec")))
      .crossJoin(broadcast(cent.withColumn("_qc", quantize(col("cvec")))))
      .select(col("id").as("query_id"), col("vec").as("qv"), col("cid"),
        quantizedDot(col("_qv"), col("_qc")).as("s"))
    val pw = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("s").desc, col("cid"))
    val probed = probes.withColumn("rk", row_number().over(pw))
      .filter(col("rk") <= nProbe).select("query_id", "qv", "cid")
    val cand = probed.join(assigned, "cid")
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        round(cosine(col("qv"), col("vec")) + 1e-9, 6).as("cos"))
    val rw = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    cand.withColumn("rank", row_number().over(rw)).filter(col("rank") <= k)
  }

  /** IVF ANN top-k with untrained (md5-sample) centroids. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              c: Int = 16, nProbe: Int = 4): DataFrame =
    ivfTopKWith(queries, corpus, k, ivfCentroids(corpus, c), nProbe)

  /** Embedding-cosine near-duplicate pairs (a<b, cos ≥ threshold on the
    * rounded value). Brute-force over a sampled/bucketed pair set. */
  def cosineNearDup(vecs: DataFrame, threshold: Double): DataFrame = {
    val a = vecs.select(col("id").as("a"), col("vec").as("va"))
    val b = vecs.select(col("id").as("b"), col("vec").as("vb"))
    a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"), round(cosine(col("va"), col("vb")) + 1e-9, 6).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
