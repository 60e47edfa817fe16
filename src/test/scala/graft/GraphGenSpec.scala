package graft

import org.apache.spark.graphx.util.{GraphGenerators => XGen}
import org.apache.spark.sql.functions._

import graft.graph.GraphGen

/** Synthetic generators (SURVEY.md §2.1 row 4): R-MAT properties
  * (deterministic, exact count, adversarial skew) and star/grid
  * differentials against the reference jar's own generators. */
class GraphGenSpec extends SparkTestBase {

  test("rmatEdges: identical at any parallelism, exact edge count, " +
      "vertices in range, power-law hub skew") {
    val n = 1024L; val m = 20000L
    val e2 = GraphGen.rmatEdges(spark, n, m, numPartitions = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val e7 = GraphGen.rmatEdges(spark, n, m, numPartitions = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(e2 == e7, "pure-expression generator is parallelism-invariant")
    assert(e2.size == m.toInt, "exact requested edge count")
    assert(e2.forall { case (s, d) => s >= 0 && s < n && d >= 0 && d < n })
    val degs = e2.groupBy(_._1).map(_._2.size).toSeq.sorted
    val maxDeg = degs.last
    val medianDeg = degs(degs.size / 2)
    // at n=1024/m=20k the tail is already ~7× the median (it widens with
    // scale — the bench's 2^17-vertex workload shows the real profile)
    assert(maxDeg >= 5 * medianDeg,
      s"R-MAT skew: max out-degree $maxDeg vs median $medianDeg — " +
        "expected an adversarial hub tail")
    // quadrant bias concentrates hubs at LOW vertex ids
    val hubId = e2.groupBy(_._1).maxBy(_._2.size)._1
    assert(hubId < n / 8, s"hub $hubId should sit in the low-id corner")
  }

  test("rmatEdges rejects non-power-of-two vertex counts") {
    intercept[IllegalArgumentException] {
      GraphGen.rmatEdges(spark, 1000, 10)
    }
  }

  test("starEdges / gridEdges match the reference jar's generators") {
    val ourStar = GraphGen.starEdges(spark, 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val jarStar = XGen.starGraph(spark.sparkContext, 50)
      .edges.collect().map(e => (e.srcId, e.dstId)).sorted.toSeq
    assert(ourStar == jarStar, "star edge set")

    val ourGrid = GraphGen.gridEdges(spark, 4, 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val jarGrid = XGen.gridGraph(spark.sparkContext, 4, 6)
      .edges.collect().map(e => (e.srcId, e.dstId)).sorted.toSeq
    assert(ourGrid == jarGrid, "grid edge set")
  }
}
