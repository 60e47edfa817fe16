package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic benchmark graphs (reference analog:
  * spark-graphx 4.1.2 `util.GraphGenerators.logNormalGraph`, the workload
  * of the examples' SynthBenchmark used for BASELINE.md):
  * out-degree ~ logNormal(mu, sigma) per source, destinations uniform.
  * Pure expressions of (seed, vertex id, slot) — identical output at any
  * parallelism. mu=4.0, sigma=1.3, n=100k gives ~12.7M edges, matching
  * the baseline workload's scale. */
object GraphGen {

  private def unif(seed: Long, salt: Int, cols: org.apache.spark.sql.Column*) =
    HashRandom.unif(seed, salt, cols: _*)

  def logNormalEdges(spark: SparkSession, numVertices: Long, mu: Double = 4.0,
      sigma: Double = 1.3, seed: Long = 42L, maxDeg: Int = 10000,
      numPartitions: Int = 0): DataFrame = {
    val base =
      if (numPartitions > 0) spark.range(0, numVertices, 1, numPartitions)
      else spark.range(numVertices)
    val id = col("id")
    val d = HashRandom.logNormalDegree(seed, mu, sigma, maxDeg.toLong, id)
    base.select(id.as("src"),
        explode(when(d > 0, sequence(lit(0L), d - 1))
          .otherwise(array().cast("array<bigint>"))).as("k"))
      .select(col("src"),
        pmod(xxhash64(lit(seed), lit(3), col("src"), col("k")), lit(numVertices)).as("dst"))
  }

  /** Deterministic R-MAT edges (Chakrabarti et al., SDM'04; reference
    * analog `GraphGenerators.rmatGraph`, default quadrant probabilities
    * a=0.45 / b=0.15 / c=0.15 / d=0.25 — SURVEY.md §2.1 row 4). Per edge
    * index and recursion level ONE uniform draw (pure expression of
    * (seed, edge, level)) picks the quadrant: src bit = u ≥ a+b, dst bit
    * = u ∈ [a, a+b) ∪ [a+b+c, 1). Identical output at any parallelism;
    * exact edge count. The result is the standard adversarially-skewed
    * power-law workload (hub mass concentrated toward vertex 0) — the
    * graph that exercises degree-capped adjacency chunking, AQE skew
    * handling and salted aggregation beyond logNormal's milder tail. */
  def rmatEdges(spark: SparkSession, numVertices: Long, numEdges: Long,
      a: Double = 0.45, b: Double = 0.15, c: Double = 0.15,
      seed: Long = 42L, numPartitions: Int = 0): DataFrame = {
    require(numVertices > 0 && (numVertices & (numVertices - 1)) == 0,
      s"numVertices must be a power of two, got $numVertices")
    require(a > 0 && b > 0 && c > 0 && a + b + c < 1.0,
      s"quadrant probabilities must be positive and sum below 1: a=$a b=$b c=$c")
    val levels = java.lang.Long.numberOfTrailingZeros(numVertices)
    val base =
      if (numPartitions > 0) spark.range(0, numEdges, 1, numPartitions)
      else spark.range(numEdges)
    val e = col("id")
    val (srcBits, dstBits) = (0 until levels).map { l =>
      val u = unif(seed, 100 + l, e)
      (when(u >= a + b, lit(1L << l)).otherwise(lit(0L)),
        when((u >= a && u < a + b) || u >= a + b + c, lit(1L << l)).otherwise(lit(0L)))
    }.unzip
    // foldLeft, not reduce: numVertices = 1 (levels = 0, legal — it passes
    // the power-of-two require) folds to lit(0) self-loops where reduce
    // would throw on the empty bit list
    base.select(srcBits.foldLeft(lit(0L))(_ + _).as("src"),
      dstBits.foldLeft(lit(0L))(_ + _).as("dst"))
  }

  /** Reference `GraphGenerators.starGraph(n)`: edges (i → 0) for
    * i ∈ [1, n). */
  def starEdges(spark: SparkSession, numVertices: Long): DataFrame =
    spark.range(1, numVertices).select(col("id").as("src"), lit(0L).as("dst"))

  /** Reference `GraphGenerators.gridGraph(rows, cols)`: vertex (r, c) =
    * r·cols + c, edges right ((r, c) → (r, c+1)) and down
    * ((r, c) → (r+1, c)). */
  def gridEdges(spark: SparkSession, rows: Int, cols: Int): DataFrame = {
    val id = col("id")
    val r = floor(id / cols).cast("long")
    val c = pmod(id, lit(cols.toLong))
    spark.range(rows.toLong * cols)
      .select(id.as("src"), explode(array(
        when(c < cols - 1, id + 1),
        when(r < rows - 1, id + cols))).as("dst"))
      .filter(col("dst").isNotNull)
  }
}
