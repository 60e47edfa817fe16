package graft

import org.apache.spark.sql.functions._
import graft.algos.{ConnectedComponents, LabelPropagation, PageRank}
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

  test("resume under a changed numeric config fails loudly instead of " +
      "silently mixing parameterizations (review r5)") {
    val edges = edgesDF(randomEdges(13, n = 60, m = 200))
    val dir = java.nio.file.Files.createTempDirectory("resume_fp").toString
    val ck = CheckpointConfig(dir, "fp1", every = 3)
    PageRank.run(edges, PageRank.Config(numIter = 6, checkpoint = Some(ck)))
    val e = intercept[IllegalArgumentException] {
      PageRank.run(edges, PageRank.Config(numIter = 12, resetProb = 0.3,
        checkpoint = Some(ck), resume = true))
    }
    assert(e.getMessage.contains("refusing to resume"), e.getMessage)
    // same numerics but MORE iterations is the documented resume use —
    // numIter is excluded from the fingerprint and still works
    val ok = PageRank.run(edges, PageRank.Config(numIter = 12,
      checkpoint = Some(ck), resume = true))
    assert(ok.count() > 0)
    ok.unpersist(false)
  }

  test("a FRESH run against a dir recorded under a DIFFERENT config fails " +
      "loudly: it would overwrite only the snapshots its cadence reaches " +
      "and leave the old config's tail as mixed state (review r5)") {
    val edges = edgesDF(randomEdges(17, n = 40, m = 120))
    val dir = java.nio.file.Files.createTempDirectory("resume_mix").toString
    val ck = CheckpointConfig(dir, "mix1", every = 2)
    PageRank.run(edges, PageRank.Config(numIter = 4, checkpoint = Some(ck)))
      .unpersist(false)
    val e = intercept[IllegalArgumentException] {
      PageRank.run(edges, PageRank.Config(numIter = 4, resetProb = 0.3,
        checkpoint = Some(ck)))
    }
    assert(e.getMessage.contains("refusing to run"), e.getMessage)
    // a fresh run under the SAME config stays legal: deterministic
    // supersteps make any stale snapshot bit-identical to a rewrite
    PageRank.run(edges, PageRank.Config(numIter = 4, checkpoint = Some(ck)))
      .unpersist(false)
  }

  test("resume against the same dir/runId with DIFFERENT edge data fails " +
      "loudly: the fingerprint binds input identity, not just numerics " +
      "(review r5)") {
    val edgesA = edgesDF(randomEdges(19, n = 60, m = 200))
    val edgesB = edgesDF(randomEdges(23, n = 60, m = 200)) // different graph
    val dir = java.nio.file.Files.createTempDirectory("resume_input").toString
    val ck = CheckpointConfig(dir, "in1", every = 3)
    PageRank.run(edgesA, PageRank.Config(numIter = 6, checkpoint = Some(ck)))
      .unpersist(false)
    // resuming with graph B would adopt ranks computed from graph A —
    // results matching NEITHER graph; must refuse, not continue
    val e = intercept[IllegalArgumentException] {
      PageRank.run(edgesB, PageRank.Config(numIter = 12,
        checkpoint = Some(ck), resume = true))
    }
    assert(e.getMessage.contains("refusing to resume"), e.getMessage)
    // CC has no numeric config at all — input identity is its ONLY
    // fingerprint, and the same drift must fail there too
    val ckCC = CheckpointConfig(dir, "incc", every = 1)
    ConnectedComponents.run(edgesA,
      ConnectedComponents.Config(checkpoint = Some(ckCC))).unpersist(false)
    val e2 = intercept[IllegalArgumentException] {
      ConnectedComponents.run(edgesB,
        ConnectedComponents.Config(checkpoint = Some(ckCC), resume = true))
    }
    assert(e2.getMessage.contains("refusing to resume"), e2.getMessage)
    // the SAME graph resumes fine under both (edge order must not matter:
    // the signature is multiset-invariant)
    PageRank.run(edgesA.orderBy(rand(5)), PageRank.Config(numIter = 12,
      checkpoint = Some(ck), resume = true)).unpersist(false)
    ConnectedComponents.run(edgesA.orderBy(rand(7)),
      ConnectedComponents.Config(checkpoint = Some(ckCC), resume = true))
      .unpersist(false)
  }

  test("a torn _config write (killed first run) is repaired, not treated " +
      "as recorded — the drift guard stays armed (review r5)") {
    val dir = java.nio.file.Files.createTempDirectory("resume_torn").toString
    val ck = CheckpointConfig(dir, "torn1", every = 1)
    Checkpoints.recordFingerprint(spark, ck, "pagerank", "fpA")
    // tear it: the dir exists (exists()=true) but the commit marker is
    // gone (committed()=false) — exactly what a mid-write kill leaves
    val ref = Checkpoints.fingerprintRef(ck, "pagerank")
    val marker = new java.io.File(ref, "_SUCCESS")
    assert(marker.exists(), "parquet write should have left a _SUCCESS")
    assert(marker.delete())
    // the old exists() gate would skip this write forever, silently
    // disarming verifyFingerprint (which correctly requires committed())
    Checkpoints.recordFingerprint(spark, ck, "pagerank", "fpB")
    Checkpoints.verifyFingerprint(spark, ck, "pagerank", "fpB") // re-armed
    val e = intercept[IllegalArgumentException] {
      Checkpoints.verifyFingerprint(spark, ck, "pagerank", "fpC")
    }
    assert(e.getMessage.contains("refusing to resume"))
  }

  test("tol-mode pagerank resumed from checkpoint is bit-identical") {
    val edges = edgesDF(randomEdges(11, n = 80, m = 300))
    val dir = java.nio.file.Files.createTempDirectory("resume_tol").toString
    val ck = CheckpointConfig(dir, "tol1", every = 3)
    // interrupted run converges and checkpoints along the way; resuming
    // from its latest snapshot replays the identical tail
    PageRank.run(edges, PageRank.Config(tol = Some(1e-3), checkpoint = Some(ck),
      normalize = false))
    val resumed = PageRank.run(edges, PageRank.Config(tol = Some(1e-3),
      checkpoint = Some(ck), resume = true, normalize = false))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val full = PageRank.run(edges, PageRank.Config(tol = Some(1e-3), normalize = false))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(resumed == full)
  }

  test("connected components resumed from checkpoint is bit-identical") {
    val edges = edgesDF(randomEdges(12, n = 100, m = 220))
    val dir = java.nio.file.Files.createTempDirectory("resume_cc").toString
    val ck = CheckpointConfig(dir, "cc1", every = 1)
    val full = ConnectedComponents.run(edges,
      ConnectedComponents.Config(checkpoint = Some(ck)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val resumed = ConnectedComponents.run(edges,
      ConnectedComponents.Config(checkpoint = Some(ck), resume = true))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(resumed == full)
  }

  test("label propagation resumed mid-run matches an uninterrupted run") {
    val edges = edgesDF(randomEdges(13, n = 80, m = 240))
    val dir = java.nio.file.Files.createTempDirectory("resume_lpa").toString
    val ck = CheckpointConfig(dir, "lpa1", every = 2)
    // interrupted at step 2 (snapshot), resume continues 3..4
    LabelPropagation.run(edges, LabelPropagation.Config(maxSteps = 2,
      checkpoint = Some(ck)))
    val resumed = LabelPropagation.run(edges, LabelPropagation.Config(maxSteps = 4,
      checkpoint = Some(ck), resume = true))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = LabelPropagation.run(edges, LabelPropagation.Config(maxSteps = 4))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(resumed == full)
  }

  test("generic Pregel.iterate resumed mid-run matches an uninterrupted " +
      "run (min-label CC on the combinator, checkpointed supersteps)") {
    import graft.graph.{PreparedGraph, Pregel}
    val pairs = randomEdges(17, n = 80, m = 80)
    val dir = java.nio.file.Files.createTempDirectory("resume_pregel").toString
    val ck = CheckpointConfig(dir, "ml1", every = 1)
    def run(g: PreparedGraph, maxIter: Int, resume: Boolean) = {
      val init = g.vertices.select(col("id"), col("id").as("label"),
        lit(true).as("changed"))
      def vprog(st: org.apache.spark.sql.DataFrame,
          ms: org.apache.spark.sql.DataFrame) =
        st.join(ms, Seq("id"), "left").select(col("id"),
          least(col("label"), coalesce(col("m"), col("label"))).as("label"),
          coalesce(col("m") < col("label"), lit(false)).as("changed"))
      Pregel.iterate(g, init, Some(col("src_label")), Some(col("dst_label")),
        Seq(min("msg").as("m")), vprog,
        Pregel.Config(maxIter = maxIter, sendersPred = Some(col("changed")),
          checkpoint = Some(ck), resume = resume, algo = "minlabel_resume"))
        .select("id", "label")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val g = PreparedGraph(edgesDF(pairs))
    run(g, maxIter = 2, resume = false) // interrupted after superstep 2
    val resumed = run(g, maxIter = Int.MaxValue, resume = true)
    // uninterrupted twin under a fresh checkpoint namespace
    val g2 = PreparedGraph(edgesDF(pairs))
    val init2 = g2.vertices.select(col("id"), col("id").as("label"),
      lit(true).as("changed"))
    def vprog2(st: org.apache.spark.sql.DataFrame,
        ms: org.apache.spark.sql.DataFrame) =
      st.join(ms, Seq("id"), "left").select(col("id"),
        least(col("label"), coalesce(col("m"), col("label"))).as("label"),
        coalesce(col("m") < col("label"), lit(false)).as("changed"))
    val full = Pregel.iterate(g2, init2, Some(col("src_label")),
      Some(col("dst_label")), Seq(min("msg").as("m")), vprog2,
      Pregel.Config(sendersPred = Some(col("changed")), algo = "minlabel_full"))
      .select("id", "label")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    g.unpersist(); g2.unpersist()
    assert(resumed == full, "resumed combinator run diverged from uninterrupted")
  }

  test("observe-fused partition counts equal the job-based counts " +
      "(r6 superstep-log fusion)") {
    // the fused path's contract: the map observed DURING a rotation-style
    // materialization must equal what a later spark_partition_id groupBy
    // over the SAME materialized frame reports — i.e. task partition ids
    // at observe time are the localCheckpoint scan's partition ids
    val df = spark.range(0, 1000).select(col("id"), (col("id") % 7).as("v"))
      .repartition(8)
    val obs = org.apache.spark.sql.Observation("pcounts_parity")
    val mat = df.observe(obs, Checkpoints.partitionCountsMetric.as("pcounts"))
      .localCheckpoint(true)
    val fused = Checkpoints.countsFromObserved(
      graft.runtime.IterationHygiene.awaitObservedRow(obs))
    assert(fused.isDefined, "observation did not surface")
    val job = mat.select(spark_partition_id().as("p"))
      .groupBy("p").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(fused.get.toMap == job)
    assert(fused.get.map(_._2).sum == 1000L)
    graft.runtime.IterationHygiene.releaseLocal(mat)
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
