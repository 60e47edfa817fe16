package graft

import org.apache.spark.sql.functions._
import graft.algos.PageRank
import graft.runtime.{CheckpointConfig, Checkpoints}

/** North-rule resumability: jobs resume mid-iteration from the superstep
  * checkpoint store and produce bit-identical results; per-partition
  * lineage/metrics are logged every superstep. */
class ResumeSpec extends SparkTestBase {

  test("pagerank resumed from superstep checkpoint is bit-identical") {
    val edges = edgesDF(randomEdges(7, n = 80, m = 300))
    val dir = java.nio.file.Files.createTempDirectory("resume").toString
    val ck = CheckpointConfig(dir, "run1", every = 4)
    // interrupted run: stops after superstep 8 (checkpoints at 4 and 8)
    PageRank.run(edges, PageRank.Config(numIter = 8, checkpoint = Some(ck),
      normalize = false))
    // resumed run continues 9..16 from the superstep-8 snapshot
    val resumed = PageRank.run(edges, PageRank.Config(numIter = 16,
      checkpoint = Some(ck), resume = true, normalize = false))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // uninterrupted reference
    val full = PageRank.run(edges, PageRank.Config(numIter = 16, normalize = false))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(resumed == full) // bit-identical, not just allclose
  }

  test("superstep log has per-partition rows and wall times") {
    val edges = edgesDF(randomEdges(8, n = 50, m = 150))
    val dir = java.nio.file.Files.createTempDirectory("sslog").toString
    val ck = CheckpointConfig(dir, "run2", every = 2)
    PageRank.run(edges, PageRank.Config(numIter = 4, checkpoint = Some(ck)))
    val log = Checkpoints.readLog(spark, ck, "pagerank")
    assert(log.select("superstep").distinct().count() == 4)
    assert(log.columns.toSet == Set("run_id", "superstep", "partition_id",
      "rows", "l1_delta", "active_count", "wall_ms"))
    val totalRows = log.groupBy("superstep").agg(sum("rows").as("r"))
      .select("r").collect().map(_.getLong(0)).toSet
    assert(totalRows == Set(50L)) // every superstep logged all vertices
  }
}
