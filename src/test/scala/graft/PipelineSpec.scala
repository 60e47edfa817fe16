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

  test("north-star Pipeline entry point: pages → extract → encode → " +
      "checkpointed PR+CC → TableIO sinks; --resume re-run recomputes " +
      "nothing and agrees") {
    val dir = java.nio.file.Files.createTempDirectory("pipe").toString
    val r1 = graft.Pipeline.run(spark, dir, numPages = 1500,
      resume = false, prIters = 8)
    assert(r1.pages == 1500 && r1.edges > 1000 && r1.components >= 1)
    assert(math.abs(r1.rankSum - r1.vertices) < 1e-6) // Σrank = |V|
    assert(spark.read.parquet(s"$dir/ranks").count() == r1.vertices)
    assert(spark.read.parquet(s"$dir/components").count() == r1.vertices)
    // per-superstep lineage/metrics log landed through the seam
    val ckCfg = graft.runtime.CheckpointConfig(s"$dir/checkpoints", "pipeline")
    val logMax = graft.runtime.Checkpoints.readLog(spark, ckCfg, "pagerank")
      .agg(max("superstep")).first().getInt(0)
    assert(logMax == 8, s"superstep log max $logMax")
    // resume over the COMPLETED run: skips every stage (outputs exist),
    // reports the latest snapshot (cadence 5 → superstep 5), and agrees
    val r2 = graft.Pipeline.run(spark, dir, numPages = 1500,
      resume = true, prIters = 8)
    assert(r2.resumedFromSuperstep == 5, s"resumed from ${r2.resumedFromSuperstep}")
    assert(math.abs(r2.rankSum - r1.rankSum) < 1e-9 &&
      r2.components == r1.components && r2.edges == r1.edges)
  }

  test("pipeline pages stage is input data: an existing committed table " +
      "is reused (never overwritten), a torn one fails loudly (review r5)") {
    val dir = java.nio.file.Files.createTempDirectory("pipe2").toString
    val r1 = graft.Pipeline.run(spark, dir, numPages = 300,
      resume = false, prIters = 2)
    assert(r1.pages == 300)
    // non-resume re-run: derived stages recompute, but the pages table is
    // reused even with a different requested size — it is an input, and a
    // real deployment's crawl table must never be regenerated over. The
    // sentinel file pins "not rewritten" (regeneration overwrites the dir,
    // destroying it) without relying on mtime granularity.
    val sentinel = new java.io.File(s"$dir/pages/sentinel.marker")
    assert(sentinel.createNewFile())
    val r2 = graft.Pipeline.run(spark, dir, numPages = 999,
      resume = false, prIters = 2)
    assert(r2.pages == 300, s"pages regenerated: ${r2.pages}")
    assert(sentinel.exists(), "pages table was rewritten")
    // torn pages dir the pipeline did NOT write (no in-progress flag):
    // refuse to half-read OR destroy it
    assert(new java.io.File(s"$dir/pages/_SUCCESS").delete())
    val e = intercept[IllegalStateException] {
      graft.Pipeline.run(spark, dir, numPages = 300, resume = true, prIters = 2)
    }
    assert(e.getMessage.contains("not committed"), e.getMessage)
    // but the pipeline's OWN generation killed mid-write (in-progress flag
    // present) regenerates on restart — resume recovers, nothing manual
    assert(new java.io.File(s"$dir/.pages_generating").createNewFile())
    val r3 = graft.Pipeline.run(spark, dir, numPages = 300,
      resume = true, prIters = 2)
    assert(r3.pages == 300 && math.abs(r3.rankSum - r1.rankSum) < 1e-9)
    assert(!new java.io.File(s"$dir/.pages_generating").exists(),
      "in-progress flag not cleared after successful regeneration")
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
