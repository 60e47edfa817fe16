package graft

import graft.algos.StronglyConnectedComponents

/** Extended randomized SCC sweep (vs in-memory Tarjan) across density
  * regimes — sparse DAG-heavy, dense giant-SCC, and in-between — plus a
  * partitioning-invariance check (labels must not depend on the input's
  * physical layout). */
class SccSweepSpec extends SparkTestBase {

  test("extended sweep: 12 random graphs across densities vs Tarjan") {
    val cases = Seq(
      (100, 60, 80), (101, 60, 120), (102, 60, 200), (103, 30, 150),
      (104, 120, 100), (105, 120, 240), (106, 15, 60), (107, 200, 150),
      (108, 80, 80), (109, 50, 300), (110, 10, 40), (111, 150, 450))
    cases.foreach { case (seed, n, m) =>
      val pairs = randomEdges(seed, n, m)
      val ours = StronglyConnectedComponents.run(edgesDF(pairs))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(ours == tarjanScc(pairs), s"scc sweep seed=$seed n=$n m=$m")
    }
  }

  test("inputIsSimple is a performance contract only: labels stay correct " +
      "even when the assertion is WRONG (self-loops + duplicate edges)") {
    // randomEdges may contain dups and self-loops — exactly the input the
    // flag claims to not need deduped; labels must equal Tarjan's anyway
    val cases = Seq((201, 60, 150), (202, 30, 120))
    cases.foreach { case (seed, n, m) =>
      val pairs = randomEdges(seed, n, m)
      val ours = StronglyConnectedComponents.run(edgesDF(pairs),
          StronglyConnectedComponents.Config(inputIsSimple = true))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(ours == tarjanScc(pairs), s"inputIsSimple seed=$seed")
    }
  }

  test("SCC labels are invariant to input partitioning") {
    val pairs = randomEdges(77, n = 60, m = 150)
    val base = StronglyConnectedComponents.run(edgesDF(pairs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (p <- Seq(1, 7)) {
      val alt = StronglyConnectedComponents.run(edgesDF(pairs).repartition(p))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(alt == base, s"scc differs at repartition($p)")
    }
  }
}
