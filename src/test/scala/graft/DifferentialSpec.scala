package graft

import org.apache.spark.graphx.{Graph => XGraph, PartitionStrategy}
import org.apache.spark.sql.functions._
import graft.algos._

/** Strongest oracle: run the actual reference library (spark-graphx 4.1.2,
  * on the unmanaged classpath) in the same JVM on seeded random graphs and
  * compare per-vertex outputs (SURVEY.md §5.1). */
class DifferentialSpec extends SparkTestBase {

  def graphxOf(pairs: Seq[(Long, Long)]): XGraph[Int, Int] =
    XGraph.fromEdgeTuples(spark.sparkContext.parallelize(pairs, 4), defaultValue = 1)

  def compareRanks(pairs: Seq[(Long, Long)], ours: Map[Long, Double],
      theirs: Map[Long, Double], tag: String): Unit = {
    assert(ours.keySet == theirs.keySet, s"$tag vertex sets differ")
    theirs.foreach { case (id, r) =>
      assert(math.abs(ours(id) - r) < 1e-6, s"$tag vertex $id: ${ours(id)} vs $r")
    }
  }

  test("differential static PageRank on 5 random graphs") {
    for (seed <- 1 to 5) {
      val pairs = randomEdges(seed, n = 60, m = 200)
      val ours = PageRank.run(edgesDF(pairs), PageRank.Config(numIter = 15))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val theirs = graphxOf(pairs).staticPageRank(15)
        .vertices.collect().toMap
      compareRanks(pairs, ours, theirs, s"pr seed=$seed")
    }
  }

  test("differential convergence PageRank on 3 random graphs") {
    for (seed <- 10 to 12) {
      val pairs = randomEdges(seed, n = 50, m = 150)
      val ours = PageRank.run(edgesDF(pairs), PageRank.Config(tol = Some(1e-6)))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val theirs = graphxOf(pairs).pageRank(1e-6).vertices.collect().toMap
      compareRanks(pairs, ours, theirs, s"prTol seed=$seed")
    }
  }

  test("differential parallel personalized PageRank: each column equals " +
      "the reference SCALAR personalized PageRank for that source") {
    // The reference's own parallel variant diverges from its scalar
    // personalized PageRank (stale replicated vertex view after the first
    // incremental outerJoinVertices — see PageRank.runParallelPersonalized
    // scaladoc), so the semantic oracle is the scalar API per source.
    for (seed <- 50 to 52) {
      val pairs = randomEdges(seed, n = 50, m = 160)
      val verts = pairs.flatMap(p => Seq(p._1, p._2)).distinct.sorted
      val sources = verts.take(3)
      val ours = PageRank.runParallelPersonalized(edgesDF(pairs), sources, numIter = 12)
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      val g = graphxOf(pairs)
      sources.zipWithIndex.foreach { case (src, pos) =>
        val theirs = g.staticPersonalizedPageRank(src, 12).vertices.collect().toMap
        assert(ours.keySet == theirs.keySet, s"ppr seed=$seed vertex sets differ")
        theirs.foreach { case (id, r) =>
          assert(math.abs(ours(id)(pos) - r) < 1e-8,
            s"ppr seed=$seed src=$src vertex $id: ${ours(id)(pos)} vs $r")
        }
      }
    }
  }

  test("differential connected components on 5 random graphs (+ union-find)") {
    for (seed <- 20 to 24) {
      // sparse → many components
      val pairs = randomEdges(seed, n = 150, m = 120)
      val ours = ConnectedComponents.run(edgesDF(pairs))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val theirs = graphxOf(pairs).connectedComponents().vertices.collect().toMap
      assert(ours == theirs, s"cc seed=$seed vs graphx")
      val uf = unionFindCC(pairs)
      assert(ours == uf, s"cc seed=$seed vs union-find")
    }
  }

  test("differential triangle count on 5 random graphs") {
    for (seed <- 30 to 34) {
      val pairs = randomEdges(seed, n = 40, m = 250) // dense → triangles
      val ours = TriangleCount.run(edgesDF(pairs))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val theirs = graphxOf(pairs)
        .partitionBy(PartitionStrategy.RandomVertexCut)
        .triangleCount().vertices.collect()
        .map { case (id, c) => id -> c.toLong }.toMap
      assert(ours == theirs, s"tri seed=$seed")
    }
  }

  test("LPA matches in-memory synchronous oracle with smallest-label ties") {
    for (seed <- 40 to 42) {
      val pairs = randomEdges(seed, n = 30, m = 80)
      val steps = 4
      val ours = LabelPropagation.run(edgesDF(pairs),
        LabelPropagation.Config(maxSteps = steps))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // in-memory synchronous LPA, messages along both directions of each
      // directed edge, argmax count with smallest-label tie-break
      val verts = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      var labels = verts.map(v => v -> v).toMap
      for (_ <- 1 to steps) {
        val msgs = pairs.flatMap { case (s, d) => Seq(d -> labels(s), s -> labels(d)) }
        val upd = msgs.groupBy(_._1).map { case (v, ms) =>
          val counts = ms.groupBy(_._2).map { case (l, xs) => l -> xs.size }
          val maxC = counts.values.max
          v -> counts.filter(_._2 == maxC).keys.min
        }
        labels = labels ++ upd
      }
      assert(ours == labels, s"lpa seed=$seed")
    }
  }
}
