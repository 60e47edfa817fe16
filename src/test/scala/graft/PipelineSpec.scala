package graft

import org.apache.spark.sql.functions._
import graft.pages.{Extract, PageGen}
import graft.ids.UrlDict
import graft.graph.EdgeOps
import graft.algos.PageRank

/** End-to-end pipeline invariants on the generated page corpus:
  * determinism across partitionings (the property that makes small-scale
  * fixtures meaningful for the 10^12-doc target) and the byte-identical
  * text contract. */
class PipelineSpec extends SparkTestBase {

  val cfg = PageGen.Config(numPages = 500, seed = 7, mu = 1.2, sigma = 1.0)

  test("page table is identical under different partitionings") {
    val a = PageGen.pages(spark, cfg.copy(numPartitions = 2))
    val b = PageGen.pages(spark, cfg.copy(numPartitions = 13))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("extracted text is byte-identical to the stored column") {
    val pages = PageGen.pages(spark, cfg)
    assert(Extract.textInvariantViolations(pages) == 0)
  }

  test("outlink targets stay inside the corpus url space; dict audits clean") {
    val pages = PageGen.pages(spark, cfg).cache()
    val links = Extract.outlinks(pages)
    val unknown = links.join(pages.select(col("url").as("dst_url")), Seq("dst_url"), "left_anti")
    assert(unknown.count() == 0)
    val dict = UrlDict.dict(pages.select("url"))
    UrlDict.auditCollisions(dict)
    assert(dict.count() == 500)
  }

  test("full pipeline: pages → edges → pagerank, Σrank = |V|") {
    val pages = PageGen.pages(spark, cfg).cache()
    val edges = EdgeOps.encode(Extract.outlinks(pages)).cache()
    val pr = PageRank.run(edges, PageRank.Config(numIter = 8))
    val n = EdgeOps.vertices(edges).count()
    val total = pr.agg(sum("rank")).first().getDouble(0)
    assert(math.abs(total - n) < 1e-6)
    // deterministic across reruns
    val pr2 = PageRank.run(edges, PageRank.Config(numIter = 8))
    val diff = pr.as("a").join(pr2.as("b"), col("a.id") === col("b.id"))
      .agg(max(abs(col("a.rank") - col("b.rank")))).first().getDouble(0)
    assert(diff == 0.0)
  }

  test("personalized PageRank differential vs reference") {
    import org.apache.spark.graphx.{Graph => XGraph}
    val pairs = randomEdges(99, n = 40, m = 120)
    val src = pairs.head._1
    val ours = PageRank.run(edgesDF(pairs),
      PageRank.Config(numIter = 12, personalized = Some(src)))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val theirs = XGraph.fromEdgeTuples(spark.sparkContext.parallelize(pairs, 4), 1)
      .staticPersonalizedPageRank(src, 12).vertices.collect().toMap
    assert(ours.keySet == theirs.keySet)
    theirs.foreach { case (id, r) =>
      assert(math.abs(ours(id) - r) < 1e-6, s"vertex $id: ${ours(id)} vs $r") }
  }
}
