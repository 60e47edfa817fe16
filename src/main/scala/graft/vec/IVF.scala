package graft.vec

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** IVF (inverted-file) approximate nearest neighbor — the classic
  * coarse-quantizer scale path (Sivic & Zisserman '03; FAISS's IVF family):
  * partition the corpus into k centroid cells ONCE (at rest this is a
  * table clustered by cell id), then answer a query by probing only its
  * `nProbe` nearest cells with exact cosine re-ranking.
  *
  * Scale shape: the index build is one pass over the corpus against a
  * BROADCAST centroid table (k centroids ≪ corpus; never a shuffle of the
  * corpus); search is an equi-join on cell id — candidates are bounded by
  * nProbe/k of the corpus per query, never a cross join. Complements
  * [[Similarity.lshTopK]]: IVF wins when the corpus is clustered (cells
  * match density), LSH when it isn't.
  *
  * All math is builtin higher-order expressions (zip_with/aggregate) —
  * codegen'd, no UDFs.
  */
object IVF {

  /** Spherical k-means coarse quantizer: greedy farthest-point init
    * (first seed by seeded id-hash, each next seed the vector with the
    * LOWEST max-cosine to the already-chosen set — deterministic, and
    * immune to the two-seeds-in-one-cluster collapse of random init),
    * then Lloyd iterations with cosine assignment and renormalized mean
    * updates. Centroids: (cid 0..k-1, cv). Train on a SAMPLE at scale —
    * init is k passes and each Lloyd iteration cross-scores sample × k
    * against broadcast centroids. Empty cells keep their previous
    * centroid. */
  def trainCentroids(corpus: DataFrame, k: Int, iters: Int = 10,
      seed: Long = 42L, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    val unit = corpus.select(col(idCol).as("id"),
        Similarity.normalized(col(vecCol)).as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    unit.count()
    // farthest-point seed ids (driver holds k ids — never the vectors)
    val seedIds = scala.collection.mutable.Buffer(
      unit.orderBy(xxhash64(col("id"), lit(seed))).select(col("id"))
        .head().getLong(0))
    while (seedIds.size < k) {
      val chosen = broadcast(unit.filter(col("id").isInCollection(seedIds))
        .select(col("v").as("cv")))
      val next = unit.crossJoin(chosen)
        .groupBy("id").agg(max(Similarity.cosine(col("v"), col("cv"))).as("mc"))
        .orderBy(asc("mc"), asc("id")).select(col("id")).head().getLong(0)
      seedIds += next
    }
    import spark.implicits._
    val cidOf = broadcast(
      seedIds.zipWithIndex.map { case (id, i) => (id, i.toLong) }
        .toSeq.toDF("id", "cid"))
    var cents = unit.join(cidOf, Seq("id"))
      .select(col("cid"), col("v").as("cv"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val assigned = assignCells(unit.select(col("id"), col("v")), cents,
        "id", "v")
      // renormalized elementwise mean per cell (spherical k-means M-step)
      val means = assigned
        .join(unit, Seq("id"))
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(avg("x").as("m"))
        .groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("mv"))
        .select(col("cid"), Similarity.normalized(col("mv")).as("cv"))
      // keep previous centroid for cells that lost every member
      val next = cents.select(col("cid"), col("cv").as("prev"))
        .join(means, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("cv"), col("prev")).as("cv"))
        .localCheckpoint(true)
      graft.runtime.IterationHygiene.releaseLocal(cents)
      cents = next
    }
    unit.unpersist(false)
    cents
  }

  /** Nearest centroid (by cosine) per vector: (id, cid). One broadcast
    * cross-score + max_by — the index build. Both sides normalized once
    * (cosine of units = dot), so each of the n×k scorings is a single
    * array pass. */
  def assignCells(vectors: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    vectors.select(col(idCol).as("id"), Similarity.normalized(col(vecCol)).as("v"))
      .crossJoin(broadcast(centroids.select(col("cid"),
        Similarity.normalized(col("cv")).as("ncv"))))
      .select(col("id"),
        struct(Similarity.dot(col("v"), col("ncv")).as("cos"),
          (-col("cid")).as("ncid")).as("sc"), col("cid"))
      .groupBy("id")
      .agg(max_by(col("cid"), col("sc")).as("cid"))

  /** IVF top-k: probe each query's `nProbe` nearest cells, exact cosine
    * re-rank within them. Output (qid, nid, cos, rank ≤ k); ties broken
    * by neighbor id. Recall is 1.0 iff every true neighbor lives in a
    * probed cell — grows with nProbe (nProbe = k degenerates to exact). */
  def topK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      k: Int, nProbe: Int = 4, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = assignCells(corpus, centroids, idCol, vecCol)
    val corpusCells = corpus.select(col(idCol).as("nid"),
        Similarity.normalized(col(vecCol)).as("nv"))
      .join(cells.select(col("id").as("nid"), col("cid")), Seq("nid"))
    val probeW = Window.partitionBy("qid").orderBy(desc("pcos"), asc("cid"))
    val probes = queries.select(col(idCol).as("qid"),
        Similarity.normalized(col(vecCol)).as("qv"))
      .crossJoin(broadcast(centroids.select(col("cid"),
        Similarity.normalized(col("cv")).as("ncv"))))
      .select(col("qid"), col("qv"), col("cid"),
        Similarity.dot(col("qv"), col("ncv")).as("pcos"))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nProbe)
      .select(col("qid"), col("qv"), col("cid"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("nid"))
    probes.join(corpusCells, Seq("cid"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        Similarity.dot(col("qv"), col("nv")).as("cos"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
