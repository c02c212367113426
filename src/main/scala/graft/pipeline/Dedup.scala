package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Document deduplication for large-scale training-data pipelines. All
 * operators take a DataFrame with (id: long, text: string)-shaped columns and
 * are pure Column algebra (codegen'd builtins, no Scala UDFs): every hash is
 * md5-based so results are engine-independent and exactly reproducible.
 *
 * Scale notes (100 TB): exact dedup is one hash-shuffle; MinHash-LSH is the
 * scale path for near-dup (shingle explode → per-band signature → bucket
 * join), with per-bucket pair expansion capped by bucket size; brute-force
 * Jaccard self-joins exist for oracle-sized samples only.
 */
object Dedup {

  /** Word k-shingles (k consecutive whitespace tokens), DISTINCT per doc. */
  def shingles(docs: DataFrame, id: Column, text: Column, k: Int = 5): DataFrame = {
    val toks = split(trim(text), "\\s+")
    val n = greatest(size(toks) - (k - 1), lit(1))
    docs.select(
      id.as("id"),
      explode(array_distinct(
        transform(sequence(lit(1), n),
          i => concat_ws(" ", slice(toks, i, lit(k)))))).as("shingle"))
  }

  /** Exact dedup: group identical texts by md5; keeper = min id per group. */
  def exactGroups(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.groupBy(md5(text).as("text_md5"))
      .agg(count("*").as("n_docs"), min(id).as("keeper"))

  /**
   * MinHash signature: numHashes independent permutations approximated by
   * h_i(s) = md5(i || ':' || s); the per-doc minimum of each is the signature
   * component. Lexicographic min over hex strings == numeric min of the hash.
   * Returns (id, h: int, minhash: string).
   */
  def minHash(sh: DataFrame, numHashes: Int = 8): DataFrame =
    sh.select(col("id"), explode(sequence(lit(0), lit(numHashes - 1))).as("h"),
              col("shingle"))
      .groupBy("id", "h")
      .agg(min(md5(concat(col("h").cast("string"), lit(":"), col("shingle")))).as("minhash"))

  /**
   * LSH banding: group the signature into `bands` bands of rows/band hashes;
   * band key = md5(concat of the band's minhashes). Docs sharing any band key
   * are near-dup candidates. Returns (band, bucket, id).
   */
  def lshBands(sig: DataFrame, numHashes: Int = 8, bands: Int = 4): DataFrame = {
    require(numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes); a remainder would silently change the LSH sensitivity curve")
    val rows = numHashes / bands
    sig.withColumn("band", (col("h") / rows).cast("int"))
      .groupBy("id", "band")
      .agg(md5(concat_ws(",",
        transform(sort_array(collect_list(struct(col("h"), col("minhash")))),
          s => s.getField("minhash")))).as("bucket"))
      .select(col("band"), col("bucket"), col("id"))
  }

  /** Candidate near-dup pairs (a<b) from shared LSH buckets, with bucket-size
    * cap against degenerate buckets (hot-key guard at scale). Capped buckets
    * are excluded from candidates — pair with `lshCoverage` (same bandsDf and
    * cap) to surface how much the cap dropped; drops are a documented recall
    * tradeoff, never silent. */
  def lshCandidates(bandsDf: DataFrame, maxBucket: Int = 1000): DataFrame = {
    val sized = bandsDf.withColumn("bsz",
      count("*").over(org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket")))
      .filter(col("bsz") <= maxBucket)
    val l = sized.select(col("band"), col("bucket"), col("id").as("a"))
    val r = sized.select(col("band"), col("bucket"), col("id").as("b"))
    l.join(r, Seq("band", "bucket")).filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /**
   * Coverage report for the capped candidate path — drops must be VISIBLE,
   * not silent: a degenerate bucket (boilerplate text) over `maxBucket` is
   * excluded from `lshCandidates`, a recall tradeoff the operator of a 100 TB
   * dedup run has to see. One row: (n_rows, n_buckets, dropped_buckets,
   * dropped_rows) where dropped_* count (band, bucket) groups over the cap
   * and the doc rows inside them.
   */
  def lshCoverage(bandsDf: DataFrame, maxBucket: Int = 1000): DataFrame =
    bandsDf.groupBy("band", "bucket").agg(count("*").as("bsz"))
      .agg(
        sum("bsz").as("n_rows"),
        count("*").as("n_buckets"),
        sum(when(col("bsz") > maxBucket, 1L).otherwise(0L)).as("dropped_buckets"),
        sum(when(col("bsz") > maxBucket, col("bsz")).otherwise(0L)).as("dropped_rows"))

  /**
   * Near-dup CLUSTERS from candidate pairs: the standard web-scale dedup
   * composition — LSH candidates form an undirected similarity graph, its
   * connected components are the duplicate clusters, and each doc's cluster
   * key is the minimum doc id in its component (the canonical "keeper").
   * Runs the REAL graph engine (HashMin label propagation,
   * `graft.algos.ConnectedComponents`) over the pair table; docs with no
   * candidate pair keep themselves.
   *
   * Scale notes (100 TB): the pair table is orders of magnitude smaller than
   * the corpus (bounded by Σ bucket² over capped LSH buckets), near-dup
   * components have tiny diameter (most are cliques), so HashMin converges in
   * 2-3 supersteps; the final join back to `ids` is one hash shuffle. This is
   * the composition a transitive-dedup pass needs — pairwise keeper-by-min
   * alone is wrong whenever A~B and B~C but A≁C.
   *
   * @param ids   one `id` column: every doc that should appear in the output
   * @param pairs candidate pairs (a, b) from `lshCandidates` (optionally
   *              pre-filtered by `jaccardFor` ≥ threshold)
   * @return (id, cluster) — cluster = min doc id reachable via pairs
   */
  def clusters(ids: DataFrame, pairs: DataFrame): DataFrame = {
    // partition count: size-adaptive (LinkGraph derives it from the pair
    // table's bytes, capped at the session conf) — the candidate-pair graph
    // is orders of magnitude smaller than the corpus, so pinning it to the
    // session's shuffle width just multiplied near-empty tasks per superstep
    // ... sized from the DOC table's stats, not the pair plan's (post-join
    // estimates inflate to the cap; the pair table is bounded by Σ bucket²
    // over capped buckets, far below the corpus)
    val g = graft.core.LinkGraph(
      pairs.select(col("a").as("src"), col("b").as("dst")),
      numPartitions = graft.core.LinkGraph.adaptivePartitions(ids))
    val comp = graft.algos.ConnectedComponents.run(g).state
      .select(col("id"), col("component"))
    // note: CC runs over g.undirected, whose clustered edge views stay
    // persisted for the session (same contract as every graph query in the
    // catalog — Verify/Bench sweep caches between queries)
    ids.select(col("id"))
      .join(comp, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("component"), col("id")).as("cluster"))
  }

  /** Exact n-gram Jaccard for given pairs: |A∩B| / |A∪B| over distinct shingles. */
  def jaccardFor(pairs: DataFrame, sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy("id").agg(count("*").as("sz"))
    val inter = pairs
      .join(sh.select(col("id").as("a"), col("shingle")), Seq("a"))
      .join(sh.select(col("id").as("b"), col("shingle")), Seq("b", "shingle"))
      .groupBy("a", "b").agg(count("*").as("inter"))
    pairs.join(inter, Seq("a", "b"), "left_outer")
      .na.fill(0, Seq("inter"))
      .join(sizes.select(col("id").as("a"), col("sz").as("sza")), Seq("a"))
      .join(sizes.select(col("id").as("b"), col("sz").as("szb")), Seq("b"))
      .select(col("a"), col("b"),
        (col("inter") / (col("sza") + col("szb") - col("inter"))).as("jaccard"))
  }

  /** All-pairs n-gram Jaccard ≥ threshold via a shingle self-join. Quadratic
    * in co-shingled docs — oracle/sample scale only; use LSH at scale. */
  def jaccardPairs(docs: DataFrame, id: Column, text: Column,
                   k: Int = 5, threshold: Double = 0.5): DataFrame = {
    val sh = shingles(docs, id, text, k)
    val pairs = sh.select(col("id").as("a"), col("shingle"))
      .join(sh.select(col("id").as("b"), col("shingle")), Seq("shingle"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    jaccardFor(pairs, sh).filter(col("jaccard") >= threshold)
  }

  /**
   * SimHash over whitespace tokens (multiset votes), `bits`-bit (≤32, from
   * the md5 hex prefix). bit_j = 1 iff Σ_tokens(±1 by bit j of md5(token)) > 0.
   */
  def simHash(docs: DataFrame, id: Column, text: Column, bits: Int = 16): DataFrame = {
    val toks = docs.select(id.as("id"),
      explode(split(trim(lower(text)), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .withColumn("hx", md5(col("tok")))
    val bitsDf = toks
      .select(col("id"), col("hx"), explode(sequence(lit(0), lit(bits - 1))).as("j"))
      .withColumn("digit",
        instr(lit("0123456789abcdef"), substring(col("hx"), (col("j") / 4).cast("int") + 1, lit(1))) - 1)
      // digit>>(3-j%4) & 1, via exact double pow (shiftright needs a literal amount)
      .withColumn("bit",
        (col("digit") / pow(lit(2.0), lit(3) - col("j") % 4)).cast("int") % 2)
      .withColumn("vote", col("bit") * 2 - 1)
    bitsDf.groupBy("id", "j").agg(sum("vote").as("v"))
      .withColumn("bitval",
        when(col("v") > 0, pow(lit(2.0), col("j")).cast("long")).otherwise(0L))
      .groupBy("id").agg(sum("bitval").as("simhash"))
  }
}
