package graft.graph

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The single copy of the deterministic hash-random primitives both
  * generators ([[GraphGen]], [[graft.pages.PageGen]]) are built from.
  * Pure expressions of (seed, salt, cols) — identical output at any
  * parallelism — and shared so the determinism-critical formulas
  * (2^40 quantization, Box–Muller, clamping) cannot silently drift
  * between the page-table and benchmark-graph generators. */
private[graft] object HashRandom {

  /** Uniform double in (0,1), pure function of (seed, salt, cols). */
  def unif(seed: Long, salt: Int, cols: Column*): Column = {
    val h = xxhash64((lit(seed) +: lit(salt) +: cols): _*)
    (pmod(h, lit(1L << 40)).cast("double") + lit(0.5)) / lit((1L << 40).toDouble)
  }

  /** Out-degree ~ round(exp(mu + sigma·z)), z ~ N(0,1) via Box–Muller on
    * hash-uniforms (salts 1 and 2 of `seed`), clamped to [0, maxDeg] —
    * the logNormal degree law of GraphX `GraphGenerators.logNormalGraph`. */
  def logNormalDegree(seed: Long, mu: Double, sigma: Double, maxDeg: Long,
      id: Column): Column = {
    val u1 = unif(seed, 1, id)
    val u2 = unif(seed, 2, id)
    val z = sqrt(lit(-2.0) * log(u1)) * cos(lit(2.0 * math.Pi) * u2)
    least(lit(maxDeg), greatest(lit(0L), round(exp(lit(mu) + lit(sigma) * z))))
      .cast("long")
  }
}
