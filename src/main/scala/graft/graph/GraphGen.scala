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

  private def unif(seed: Long, salt: Int, cols: org.apache.spark.sql.Column*) = {
    val h = xxhash64((lit(seed) +: lit(salt) +: cols): _*)
    (pmod(h, lit(1L << 40)).cast("double") + lit(0.5)) / lit((1L << 40).toDouble)
  }

  def logNormalEdges(spark: SparkSession, numVertices: Long, mu: Double = 4.0,
      sigma: Double = 1.3, seed: Long = 42L, maxDeg: Int = 10000,
      numPartitions: Int = 0): DataFrame = {
    val base =
      if (numPartitions > 0) spark.range(0, numVertices, 1, numPartitions)
      else spark.range(numVertices)
    val id = col("id")
    val u1 = unif(seed, 1, id)
    val u2 = unif(seed, 2, id)
    val z = sqrt(lit(-2.0) * log(u1)) * cos(lit(2.0 * math.Pi) * u2)
    val d = least(lit(maxDeg.toLong),
      greatest(lit(0L), round(exp(lit(mu) + lit(sigma) * z)))).cast("long")
    base.select(id.as("src"),
        explode(when(d > 0, sequence(lit(0L), d - 1))
          .otherwise(array().cast("array<bigint>"))).as("k"))
      .select(col("src"),
        pmod(xxhash64(lit(seed), lit(3), col("src"), col("k")), lit(numVertices)).as("dst"))
  }
}
