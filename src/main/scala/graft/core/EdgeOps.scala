package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Edge-list transformations — the reference's relational ops in disguise
 * (`include/GMDP/utils/edgelist_transformation.h`, `edgelist.h`; SURVEY.md
 * §2.5). Each is a pure DataFrame→DataFrame function over the canonical edge
 * schema `(src long, dst long, weight double)`; Catalyst pushes the filters
 * and prunes columns, and the shuffling ones (`dedup`, `shuffleBySrc`,
 * `remapDenseIds`) replace the reference's hand-rolled MPI all-to-alls.
 */
object EdgeOps {

  /** σ over edges — `filter_edges(pred)` (`edgelist_transformation.h:431-443`). */
  def filterEdges(edges: DataFrame, pred: Column): DataFrame = edges.filter(pred)

  /** `remove_selfedges` (`edgelist_transformation.h:37-53`). */
  def removeSelfEdges(edges: DataFrame): DataFrame =
    edges.filter(col("src") =!= col("dst"))

  /** `remove_duplicate_edges` (`edgelist_transformation.h:237-251`): the
    * reference keeps the *first* value per (src,dst) after an unstable sort —
    * i.e. an arbitrary one. We keep the MIN weight for determinism
    * (documented deviation; identical when duplicate edges share a weight). */
  def dedupEdges(edges: DataFrame): DataFrame =
    edges.groupBy("src", "dst").agg(min("weight").as("weight"))

  /** `shuffle_edges` (`edgelist_transformation.h:95-235`): redistribute by src. */
  def shuffleBySrc(edges: DataFrame, numPartitions: Int): DataFrame =
    edges.repartition(numPartitions, col("src"))

  /** `create_bidirectional_edges` (`edgelist_transformation.h:396-410`).
    * One `explode` instead of a self-union: the union form evaluates the
    * upstream edge pipeline once per branch (2x); exploding each row into
    * its two directions yields the identical multiset from one pass
    * (guide §2.4). */
  def bidirectional(edges: DataFrame): DataFrame =
    edges.select(explode(array(
        struct(col("src"), col("dst"), col("weight")),
        struct(col("dst").as("src"), col("src").as("dst"), col("weight")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.weight").as("weight"))

  /** `convert_to_dag` (`edgelist_transformation.h:412-419`): canonicalize to
    * upper-triangular (src < dst), dropping self-loops and duplicates. */
  def toDag(edges: DataFrame): DataFrame =
    edges.select(
        least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"),
        col("weight"))
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(min("weight").as("weight"))

  /** `randomize_edge_direction` (`edgelist_transformation.h:387-394`) —
    * seeded here (the reference uses unseeded rand()). */
  def randomizeDirection(edges: DataFrame, seed: Long): DataFrame =
    edges.select(
      when(rand(seed) < 0.5, col("src")).otherwise(col("dst")).as("s2"),
      col("src"), col("dst"), col("weight"))
    .select(
      col("s2").as("src"),
      when(col("s2") === col("src"), col("dst")).otherwise(col("src")).as("dst"),
      col("weight"))

  /** `random_edge_weights(r)` (`edgelist_transformation.h:421-429`): weight ← ceil(U[0,r)). */
  def randomWeights(edges: DataFrame, maxWeight: Int, seed: Long): DataFrame =
    edges.withColumn("weight", ceil(rand(seed) * maxWeight).cast("double"))

  /** `randomize_edgelist_square` (`edgelist.h:336-366`): random (seeded)
    * global vertex-id permutation applied to both endpoints. Ranks come from
    * DenseRank (no single-partition window) — the permutation is the rank of
    * each id under a seeded hash order. */
  def permuteIds(edges: DataFrame, seed: Long): DataFrame =
    permuteIdsBy(edges, id => xxhash64(id, lit(seed)))

  /** `randomize_edgelist_square` with a caller-supplied hash order (`ord` of
    * the id column; id itself is the tie-break) — md5 orders let external
    * engines replay the permutation exactly, xxhash64 is the fast default. */
  def permuteIdsBy(edges: DataFrame, ord: Column => Column): DataFrame = {
    // materialize once: the edge pipeline feeds the id collection AND both
    // remap joins (3 evaluations as a lazy plan — the fixtures derive edges
    // through window functions); the mapping is persisted + counted so the
    // planner sees its REAL size and can broadcast the remap joins when it
    // fits (DenseRank returns an RDD-backed frame whose default size
    // estimate blocks auto-broadcast) — guide §2.4/§3.1
    val e = edges.localCheckpoint(false) // lazy: materialized by the mapping build
    val ids = e.select(explode(array(col("src"), col("dst"))).as("id")).distinct()
    val mapping = DenseRank
      .denseOrdBy(ids, "shuf", ord(col("id")), col("id"))
      .select(col("id"), (col("shuf") + 1).as("newId"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    mapping.count()
    e
      .join(mapping.withColumnRenamed("id", "src").withColumnRenamed("newId", "nsrc"), "src")
      .join(mapping.withColumnRenamed("id", "dst").withColumnRenamed("newId", "ndst"), "dst")
      .select(col("nsrc").as("src"), col("ndst").as("dst"), col("weight"))
  }

  /** `remove_empty_columns` (`edgelist.h:368-409`): compact dst ids to a dense
    * 1..k range; returns (remapped edges, mapping old→new). */
  def compactDstIds(edges: DataFrame): (DataFrame, DataFrame) = {
    // materialize the input once (it feeds the id collection and the remap
    // join) and give the mapping real stats so the remap can broadcast —
    // same rationale as permuteIdsBy
    val e = edges.localCheckpoint(false) // lazy: materialized by the mapping build
    val mapping = DenseRank
      .denseOrdBy(e.select(col("dst").as("old")).distinct(), "ord", col("old"))
      .select(col("old"), (col("ord") + 1).as("new"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    mapping.count()
    val remapped = e.join(mapping, e("dst") === mapping("old"))
      .select(col("src"), col("new").as("dst"), col("weight"))
    (remapped, mapping)
  }

  /** `filter_edges_by_row(start, end)` (`edgelist.h:411-428`): row-block
    * extraction with re-based src. */
  def filterByRow(edges: DataFrame, start: Long, end: Long): DataFrame =
    edges.filter(col("src") >= start && col("src") < end)
      .withColumn("src", col("src") - start)

  /** `get_dimensions` (`edgelist.h:430-443`). */
  def dimensions(edges: DataFrame): (Long, Long) = {
    val r = edges.agg(max("src"), max("dst")).head()
    (r.getLong(0), r.getLong(1))
  }

  /** `collect_edges` test utility (`test/test_utils.h:51-110`): gather the
    * distributed edge list to the driver (fixture scale only). */
  def collectEdges(edges: DataFrame): Seq[Edge] =
    edges.select(col("src"), col("dst"), col("weight")).collect()
      .map(r => Edge(r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  /** `distribute_edges` test utility (`test/test_utils.h:112-164`). */
  def distributeEdges(spark: org.apache.spark.sql.SparkSession, es: Seq[Edge],
                      numPartitions: Int = 4): DataFrame = {
    import spark.implicits._
    spark.createDataset(es).repartition(numPartitions).toDF()
  }

  /** Remap arbitrary vertex ids to a dense 1..n range (both endpoints), the
    * analog of the reference's native-id remap (`Graph.h:111-150`) minus the
    * cache-blocking permutation. Returns (edges, mapping(id,newId)). */
  def remapDenseIds(edges: DataFrame): (DataFrame, DataFrame) = {
    val ids = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct()
    val mapping = DenseRank.denseOrdBy(ids, "ord", col("id"))
      .select(col("id"), (col("ord") + 1).as("newId"))
    val out = edges
      .join(mapping.withColumnRenamed("id", "src").withColumnRenamed("newId", "nsrc"), "src")
      .join(mapping.withColumnRenamed("id", "dst").withColumnRenamed("newId", "ndst"), "dst")
      .select(col("nsrc").as("src"), col("ndst").as("dst"), col("weight"))
    (out, mapping)
  }
}
