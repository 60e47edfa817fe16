package graft

import graft.algos.SVDPlusPlus

/** In-memory oracle for SVD++: the SPECIFIED algorithm (reference update
  * formulas with correct sum-merges — see SVDPlusPlus scaladoc for the
  * jar's y-merge bug), executed sequentially, compared exactly against
  * the distributed engine. */
class SVDPlusPlusSpec extends SparkTestBase {

  def replica(ratings: Seq[(Long, Long, Double)], rank: Int, iters: Int,
      v1: Array[Double], v2: Array[Double])
      : (Map[Long, (Array[Double], Array[Double], Double, Double)], Double) = {
    val (g1, g2, g6, g7, minV, maxV) = (0.007, 0.007, 0.005, 0.015, 0.0, 5.0)
    val u = ratings.map(_._3).sum / ratings.size
    val verts = ratings.flatMap(r => Seq(r._1, r._2)).distinct
    var p = verts.map(v => v -> v1.clone()).toMap
    var y = verts.map(v => v -> v2.clone()).toMap
    val bias = scala.collection.mutable.Map[Long, Double]()
    val norm = scala.collection.mutable.Map[Long, Double]()
    verts.foreach { v =>
      val inc = ratings.filter(r => r._1 == v || r._2 == v)
      bias(v) = inc.map(_._3).sum / inc.size - u
      norm(v) = 1.0 / math.sqrt(inc.size)
    }
    var pt: Map[Long, Array[Double]] = y
    for (_ <- 1 to iters) {
      // phase 1: p̃ = p + norm·Σ_out y(dst); non-senders keep factor2
      val t1 = ratings.groupBy(_._1).map { case (s, es) =>
        s -> es.map(e => y(e._2)).reduce((a, b) => a.zip(b).map(x => x._1 + x._2))
      }
      pt = verts.map { v =>
        v -> t1.get(v).map(m => p(v).zip(m).map(x => x._1 + norm(v) * x._2))
          .getOrElse(y(v))
      }.toMap
      // phase 2: per-edge SGD messages, sum-merged, applied synchronously
      val msgs = scala.collection.mutable.Map[Long, (Array[Double], Array[Double], Double)]()
      def addMsg(v: Long, m: (Array[Double], Array[Double], Double)): Unit =
        msgs.get(v) match {
          case None => msgs(v) = m
          case Some((a, b, c)) => msgs(v) = (
            a.zip(m._1).map(x => x._1 + x._2),
            b.zip(m._2).map(x => x._1 + x._2), c + m._3)
        }
      ratings.foreach { case (s, d, r) =>
        val (pu, ptu, bu, nu) = (p(s), pt(s), bias(s), norm(s))
        val (qi, yi, bi) = (p(d), pt(d), bias(d))
        var pred = u + bu + bi + qi.zip(ptu).map(x => x._1 * x._2).sum
        pred = math.min(math.max(pred, minV), maxV)
        val err = r - pred
        val updP = qi.zip(pu).map { case (q, pp) => err * g2 * q - g7 * g2 * pp }
        val updQ = ptu.zip(qi).map { case (t, q) => err * g2 * t - g7 * g2 * q }
        val updY = qi.zip(yi).map { case (q, yy) => err * nu * g2 * q - g7 * g2 * yy }
        addMsg(s, (updP, updY, (err - g6 * bu) * g1))
        addMsg(d, (updQ, updY, (err - g6 * bi) * g1))
      }
      p = verts.map { v =>
        v -> msgs.get(v).map(m => p(v).zip(m._1).map(x => x._1 + x._2)).getOrElse(p(v))
      }.toMap
      y = verts.map { v =>
        v -> msgs.get(v).map(m => pt(v).zip(m._2).map(x => x._1 + x._2)).getOrElse(pt(v))
      }.toMap
      verts.foreach { v => bias(v) += msgs.get(v).map(_._3).getOrElse(0.0) }
    }
    // final pass: Σ err² per dst replaces the norm slot
    val errsum = scala.collection.mutable.Map[Long, Double]()
    ratings.foreach { case (s, d, r) =>
      var pred = u + bias(s) + bias(d) + p(d).zip(y(s)).map(x => x._1 * x._2).sum
      pred = math.min(math.max(pred, minV), maxV)
      errsum(d) = errsum.getOrElse(d, 0.0) + (r - pred) * (r - pred)
    }
    val out = verts.map { v =>
      v -> (p(v), y(v), bias(v), errsum.getOrElse(v, norm(v)))
    }.toMap
    (out, u)
  }

  val ratings: Seq[(Long, Long, Double)] = {
    val dataRnd = new scala.util.Random(9)
    for {
      u <- 1L to 12L; i <- 101L to 110L if dataRnd.nextDouble() < 0.4
    } yield (u, i, (dataRnd.nextInt(5) + 1).toDouble)
  }

  test("engine equals sequential replica over 3 iterations (general graph)") {
    import spark.implicits._
    val rank = 4; val iters = 3
    val rnd = new scala.util.Random(7L)
    val v1 = Array.fill(rank)(rnd.nextDouble())
    val v2 = Array.fill(rank)(rnd.nextDouble())
    val (exp, xu) = replica(ratings, rank, iters, v1, v2)
    val (ours, u) = SVDPlusPlus.run(ratings.toDF("src", "dst", "rating"),
      SVDPlusPlus.Conf(rank = rank, maxIters = iters),
      initFactors = Some((v1, v2)))
    assert(math.abs(u - xu) < 1e-12)
    val ourMap = ours.collect().map { r =>
      r.getLong(0) -> (r.getSeq[Double](1), r.getSeq[Double](2),
        r.getDouble(3), r.getDouble(4))
    }.toMap
    assert(ourMap.keySet == exp.keySet)
    exp.foreach { case (id, (xp, xy, xb, xn)) =>
      val (p, y, b, n) = ourMap(id)
      xp.zip(p).foreach { case (a, bb) =>
        assert(math.abs(a - bb) < 1e-10, s"factor id=$id: $a vs $bb") }
      xy.zip(y).foreach { case (a, bb) =>
        assert(math.abs(a - bb) < 1e-10, s"factor2 id=$id: $a vs $bb") }
      assert(math.abs(xb - b) < 1e-10, s"bias id=$id: $xb vs $b")
      assert(math.abs(xn - n) < 1e-10, s"norm id=$id: $xn vs $n")
    }
    ours.unpersist(false)
  }

  test("the jar's y-merge doubles ONE message instead of summing both — " +
      "the documented delta, demonstrated empirically") {
    import org.apache.spark.graphx.{Edge, lib => xlib}
    // one user with exactly two ratings: the y-update aggregation for the
    // user merges exactly two messages, so the decompiled merge bug
    // (g2._2 + g2._2, dropping g1._2) is isolated and observable
    val ratings = Seq((1L, 101L, 4.0), (1L, 102L, 2.0))
    val rank = 2
    val warm = spark.sparkContext.parallelize(Seq(Edge(7L, 8L, 3.0)), 1)
    xlib.SVDPlusPlus.run(warm, new xlib.SVDPlusPlus.Conf(2, 1, 0.0, 5.0,
      0.007, 0.007, 0.005, 0.015))
    scala.util.Random.setSeed(99L)
    val v1 = Array.fill(rank)(scala.util.Random.nextDouble())
    val v2 = Array.fill(rank)(scala.util.Random.nextDouble())
    scala.util.Random.setSeed(99L)
    val (xg, _) = xlib.SVDPlusPlus.run(
      spark.sparkContext.parallelize(ratings.map { case (s, d, r) => Edge(s, d, r) }, 2),
      new xlib.SVDPlusPlus.Conf(rank, 1, 0.0, 5.0, 0.007, 0.007, 0.005, 0.015))
    val jarY1 = xg.vertices.collect().toMap.apply(1L)._2

    // replica quantities for the same pinned init (specified semantics)
    val (g2c, g7) = (0.007, 0.015)
    val u = ratings.map(_._3).sum / ratings.size
    val bias = Map(1L -> (3.0 - u), 101L -> (4.0 - u), 102L -> (2.0 - u))
    val n1 = 1.0 / math.sqrt(2)
    val pt1 = v1.zip(v2.zip(v2).map(x => x._1 + x._2)).map(x => x._1 + n1 * x._2)
    def updY(r: Double, itm: Long): Array[Double] = {
      var pred = u + bias(1L) + bias(itm) + v1.zip(pt1).map(x => x._1 * x._2).sum
      pred = math.min(math.max(pred, 0.0), 5.0)
      val err = r - pred
      v1.zip(v2).map { case (q, y) => err * n1 * g2c * q - g7 * g2c * y }
    }
    val y1 = updY(4.0, 101L); val y2 = updY(2.0, 102L)
    def close(a: Array[Double], b: Array[Double]) =
      a.zip(b).forall(x => math.abs(x._1 - x._2) < 1e-10)
    val summed = pt1.zip(y1.zip(y2).map(x => x._1 + x._2)).map(x => x._1 + x._2)
    val doubled1 = pt1.zip(y1.map(_ * 2)).map(x => x._1 + x._2)
    val doubled2 = pt1.zip(y2.map(_ * 2)).map(x => x._1 + x._2)
    assert(!close(jarY1.toArray, summed),
      "jar y unexpectedly equals the specified sum — merge bug gone?")
    assert(close(jarY1.toArray, doubled1) || close(jarY1.toArray, doubled2),
      s"jar y ${jarY1.mkString(",")} is neither 2×msg1 ${doubled1.mkString(",")} " +
        s"nor 2×msg2 ${doubled2.mkString(",")}")
  }

  test("training reduces RMSE and the default seeded init is deterministic") {
    import spark.implicits._
    val df = ratings.toDF("src", "dst", "rating")
    val conf0 = SVDPlusPlus.Conf(rank = 6, maxIters = 0)
    val conf8 = SVDPlusPlus.Conf(rank = 6, maxIters = 8)
    val (s0, u0) = SVDPlusPlus.run(df, conf0, seed = 11L)
    val (s8, u8) = SVDPlusPlus.run(df, conf8, seed = 11L)
    val r0 = SVDPlusPlus.rmse(df, s0, conf0, u0)
    val r8 = SVDPlusPlus.rmse(df, s8, conf8, u8)
    assert(r8 < r0, s"rmse after 8 iters $r8 !< initial $r0")
    // determinism: same seed → same model
    val (s8b, _) = SVDPlusPlus.run(df, conf8, seed = 11L)
    val a = s8.orderBy("id").collect().map(_.toString).mkString("\n")
    val b = s8b.orderBy("id").collect().map(_.toString).mkString("\n")
    assert(a == b, "same-seed SVD++ runs differ")
    s0.unpersist(false); s8.unpersist(false); s8b.unpersist(false)
  }
}
