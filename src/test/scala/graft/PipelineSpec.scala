package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.pipeline._

class PipelineSpec extends AnyFunSuite {
  lazy val s = SparkTestBase.spark
  import s.implicits._

  // planted corpus: 1↔2 exact dup, 3↔4 near dup (one word changed), 5 unrelated
  val base = "the quick brown fox jumps over the lazy dog and then runs far away home tonight"
  val near = "the quick brown fox jumps over the lazy cat and then runs far away home tonight"
  lazy val docs = Seq(
    (1L, base), (2L, base), (3L, base + " extra tail words here"),
    (4L, near + " extra tail words here"),
    (5L, "completely different content about spark catalyst optimizer plans and shuffles")
  ).toDF("id", "text")

  test("exact dedup groups identical texts, keeper = min id") {
    val g = Dedup.exactGroups(docs, col("id"), col("text"))
      .filter(col("n_docs") > 1).collect()
    assert(g.length === 1)
    assert(g(0).getAs[Long]("n_docs") === 2L && g(0).getAs[Long]("keeper") === 1L)
  }

  test("ngram jaccard finds the planted near-dup pair and not the unrelated doc") {
    val pairs = Dedup.jaccardPairs(docs, col("id"), col("text"), 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // exact dup => jaccard 1
    assert(pairs.contains((3L, 4L))) // near dup
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("minhash LSH candidates contain the near-dup pairs; jaccardFor re-ranks exactly") {
    val sh = Dedup.shingles(docs, col("id"), col("text"), 3)
    val cand = Dedup.lshCandidates(Dedup.lshBands(Dedup.minHash(sh, 8), 8, 8))
    val ranked = Dedup.jaccardFor(cand, sh)
      .filter(col("jaccard") >= 0.5)
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSet // (a, b) cols order: b joined first
    val pairs = ranked.map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
    assert(pairs.contains((1L, 2L)) && pairs.contains((3L, 4L)))
  }

  test("dedup clusters = transitive closure of candidate pairs (engine CC vs union-find)") {
    val sh = Dedup.shingles(docs, col("id"), col("text"), 3)
    val cand = Dedup.lshCandidates(Dedup.lshBands(Dedup.minHash(sh, 8), 8, 8))
    val pairs = cand.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty) // the planted dups must surface as candidates

    // oracle: union-find over the same pairs
    val parent = collection.mutable.Map((1L to 5L).map(i => i -> i): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = (1L to 5L).map(i => i -> find(i)).toMap

    val got = Dedup.clusters(docs.select(col("id")), cand)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    // the planted structure: 1 and 2 co-cluster with keeper 1; 5 is a singleton
    assert(got(1L) === 1L && got(2L) === 1L && got(5L) === 5L)
  }

  test("simhash: near-dups are close in hamming distance, unrelated docs are not") {
    val sh = Dedup.simHash(docs, col("id"), col("text"), 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(2L)) === 0)                    // identical text
    assert(ham(sh(3L), sh(4L)) < ham(sh(3L), sh(5L)))    // near < unrelated
    assert(ham(sh(3L), sh(4L)) <= 4)
  }

  test("brute-force cosine top-k ranks by similarity with deterministic ties") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(-1.0f, 0.0f, 0.0f))).toDF("id", "vec")
    val top = Similarity.bruteTopK(vecs.filter($"id" === 1), vecs, 2)
      .orderBy("rank").collect().map(_.getLong(1))
    assert(top.toSeq === Seq(2L, 3L))
  }

  test("LSH ANN: banded bucketed search returns exact-rerank results with decent recall") {
    // deterministic vector set: clusters around 4 axes
    val vecs = (0 until 200).map { i =>
      val axis = i % 4
      val v = Array.fill(8)(0.01f * ((i * 37) % 7))
      v(axis) = 1.0f
      (i.toLong, v)
    }.toDF("id", "vec")
    val queries = vecs.filter($"id" < 8)
    val brute = Similarity.bruteTopK(queries, vecs, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshBandedTopK(queries, vecs, 5, bands = 8, planes = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall $recall") // same-bucket candidates only
    assert(lsh.subsetOf(brute.union(lsh)))   // sanity
  }

  test("capped LSH drops are visible: coverage reports the planted over-cap bucket") {
    // 30 identical docs land in one bucket per band; cap 10 drops them all —
    // and the coverage row must SAY so (no silent truncation)
    val flood = (1L to 30L).map(i => (i, base)) :+ (31L, "one unrelated doc here")
    val d = flood.toDF("id", "text")
    val bandsDf = Dedup.lshBands(Dedup.minHash(Dedup.shingles(d, col("id"), col("text"), 3), 8), 8, 4)
    val cov = Dedup.lshCoverage(bandsDf, maxBucket = 10).head()
    assert(cov.getAs[Long]("dropped_buckets") === 4L)  // the flood bucket, once per band
    assert(cov.getAs[Long]("dropped_rows") === 120L)   // 30 docs x 4 bands
    assert(cov.getAs[Long]("n_rows") === 124L)
    // and the candidate path indeed excluded the flooded bucket
    val cand = Dedup.lshCandidates(bandsDf, maxBucket = 10)
    assert(cand.count() === 0L)
  }

  test("capped banded-ANN drops are visible: bandedCoverage reports over-cap buckets") {
    val dup = Array.tabulate(8)(i => (0.1f * (i + 1)))
    val flood = (1L to 25L).map(i => (i, dup)) :+ (26L, Array.tabulate(8)(i => (math.cos(i * 2.1) * 0.7).toFloat))
    val vecs = flood.toDF("id", "vec")
    val cov = Similarity.bandedCoverage(vecs, bands = 4, planes = 2, maxBucket = 10).head()
    assert(cov.getAs[Long]("dropped_buckets") >= 4L)  // identical vectors share a bucket in every band
    assert(cov.getAs[Long]("dropped_sigs") >= 100L)
    assert(cov.getAs[Long]("n_sigs") === 104L)        // 26 vectors x 4 bands
  }

  test("banded LSH ANN: recall@5 >= 0.9 vs brute force on real embeddings, buckets bounded") {
    val vecs = s.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = vecs.filter(col("id") % 25 === 0) // 20 queries
    val brute = Similarity.bruteTopK(queries, vecs, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = Similarity.lshBandedTopK(queries, vecs, 5,
      bands = 16, planes = 2, maxBucket = 500)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & banded).size.toDouble / brute.size
    assert(recall >= 0.9, s"banded recall@5 = $recall")
    // bucket granularity sanity: no band bucket holds the whole corpus
    val sizes = Similarity.bandedSignatures(vecs, 16, 2)
      .groupBy("band", "bucket").count().select(max("count")).head().getLong(0)
    assert(sizes <= 500, s"max bucket $sizes exceeds cap")
    assert(sizes < 500, s"buckets should partition the corpus, max=$sizes")
  }

  test("kmeans IVF: k preserved, deterministic, trained recall >= untrained recall - 0.1") {
    val vecs = s.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cent = Similarity.kmeansCentroids(vecs, 8, 2).cache()
    try {
      val rows = cent.collect()
      assert(rows.length === 8)
      val again = Similarity.kmeansCentroids(vecs, 8, 2).collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      assert(rows.map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap === again)

      val queries = vecs.filter(col("id") % 25 === 0) // 20 queries
      val brute = Similarity.bruteTopK(queries, vecs, 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def recall(res: Set[(Long, Long)]) = (brute & res).size.toDouble / brute.size
      val trained = recall(Similarity.ivfTopKWith(queries, vecs, 5, cent, nProbe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
      val seeded = recall(Similarity.ivfTopK(queries, vecs, 5, c = 8, nProbe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
      // Lloyd shouldn't hurt: allow small jitter, require a floor
      assert(trained >= seeded - 0.1, s"trained=$trained seeded=$seeded")
      assert(trained >= 0.3, s"trained recall@5 = $trained")
    } finally cent.unpersist()
  }

  test("kmeans|| seeding: c seeds, deterministic, recall floor through the trained index") {
    val vecs = s.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val seeds = Similarity.kmeansParSeeds(vecs, 8, rounds = 2, l = 8)
    val rows = seeds.collect()
    assert(rows.length === 8)
    // deterministic: a second full run lands on the identical seed table
    val again = Similarity.kmeansParSeeds(vecs, 8, rounds = 2, l = 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(rows.map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap === again)
    // seeded + 1 Lloyd iteration searches as well as the brute baseline floor
    val cent = Similarity.kmeansCentroids(vecs, 8, 1, seeds = seeds)
    val queries = vecs.filter(col("id") % 25 === 0)
    val brute = Similarity.bruteTopK(queries, vecs, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.ivfTopKWith(queries, vecs, 5, cent, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & got).size.toDouble / brute.size
    assert(recall >= 0.3, s"kmeans|| trained recall@5 = $recall")
  }

  test("banded LSH near-dup finds planted parallel vectors without an all-pairs join") {
    val base = Array.tabulate(16)(i => (math.sin(i * 1.7) * 0.5).toFloat)
    val near = base.map(x => x * 2.0f) // parallel -> cos 1.0
    def h(i: Long, d: Int): Float = {
      var z = i * 0x9E3779B97F4A7C15L + d * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 30)) * 0x94D049BB133111EBL
      (((z >>> 40) % 1000L) - 500L) / 500.0f
    }
    val noise = (3L to 40L).map(i => (i, Array.tabulate(16)(d => h(i, d))))
    val vecs = (Seq((1L, base), (2L, near)) ++ noise).toDF("id", "vec")
    val nd = Similarity.lshNearDup(vecs, 0.999, bands = 16, planes = 2, maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(nd.toSeq === Seq((1L, 2L)))
  }

  test("cosineNearDup finds planted parallel vectors") {
    val vecs = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(2.0f, 4.0f, 6.0f)),   // parallel to 1
      (3L, Array(-3.0f, 1.0f, 0.5f))).toDF("id", "vec")
    val nd = Similarity.cosineNearDup(vecs, 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(nd.toSeq === Seq((1L, 2L)))
  }

  test("langId picks marker language; 'und' when no markers") {
    val d = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "la casa el perro los gatos la mesa"),
      (3L, "der hund und die katze der mann"),
      (4L, "le chat et les chiens le monde"),
      (5L, "xyzzy plugh qwerty")).toDF("id", "text")
    val got = TextAnalysis.langId(d, col("id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "en", 2L -> "es", 3L -> "de", 4L -> "fr", 5L -> "und"))
  }

  test("token counts: whitespace and BPE-ish") {
    val d = Seq((1L, "hello world, it's 42 degrees!"), (2L, ""), (3L, "   ")).toDF("id", "text")
    val got = d.select(col("id"), TextAnalysis.wsTokens(col("text")).as("ws"),
                       TextAnalysis.bpeTokens(col("text")).as("bpe"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L)._1 === 5L)
    // hello|world|,|it|'|s|42|degrees|! = 9 BPE-ish tokens
    assert(got(1L)._2 === 9L)
    assert(got(2L) === ((0L, 0L)) && got(3L) === ((0L, 0L)))
  }

  test("quality scoring bands") {
    val good = ("x" * 0) + "the quick brown fox jumps over the lazy dog " * 5
    val d = Seq((1L, good.trim), (2L, "!!!! ???? ;;;; ....")).toDF("id", "text")
    val got = TextAnalysis.quality(d, col("id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("quality")).toMap
    assert(got(1L) === 1.0)
    assert(got(2L) <= 0.25)
  }

  test("fingerprint is stable under appends far from the minimal window") {
    val d1 = Seq((1L, base)).toDF("id", "text")
    val fp1 = TextAnalysis.fingerprint(d1, col("id"), col("text")).head().getString(1)
    // dup doc gets the same fingerprint
    val d2 = Seq((2L, base)).toDF("id", "text")
    assert(TextAnalysis.fingerprint(d2, col("id"), col("text")).head().getString(1) === fp1)
  }

  test("multimodal stub decode: batched partition-local features match local md5 math") {
    val d = Seq((7L, "some content")).toDF("id", "text")
    val f = Multimodal.extractFeatures(Multimodal.fakeAssets(d, col("id"), col("text"))).head()
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("some content".getBytes("UTF-8"))
    assert(f.getLong(0) === 7L)
    assert(f.getInt(1) === (md(0) & 0xff) % 64 + 1)
    assert(f.getInt(2) === (md(1) & 0xff) % 64 + 1)
    assert(math.abs(f.getDouble(3) - md.map(_ & 0xff).sum.toDouble / 16) < 1e-12)
  }
}
