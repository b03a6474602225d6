package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `graph_anf` — the engine's sketch totals must equal a first-principles
  * driver replica (exact BFS balls → house HLL registers → the same
  * estimate arithmetic) bit for bit, the estimates must track the EXACT
  * neighbourhood function within HLL error, and the planted star pins
  * the one-hop plateau. */
class AnfSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  import spark.implicits._

  private def md5hex(sVal: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(sVal.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The house HLL estimate of an exact member set — independent replica
    * of bucket/rho/harmonic-sum/linear-counting. */
  private def hllEst(members: Set[Long]): Double = {
    val regs = collection.mutable.Map.empty[Long, Long]
    members.foreach { v =>
      val h = md5hex(v.toString)
      val bucket = java.lang.Long.parseLong(h.substring(0, 2), 16) % 64
      val w = java.lang.Long.parseLong(h.substring(2, 15), 16)
      val rho = if (w == 0L) 53L else 53L - java.lang.Long.toBinaryString(w).length
      regs(bucket) = math.max(regs.getOrElse(bucket, Long.MinValue), rho)
    }
    val occ = regs.size
    val vZero = 64 - occ
    val sScaled = regs.values.map(r => 1L << (53 - r)).sum + vZero.toLong * (1L << 53)
    val eRaw = 0.709 * 64 * 64 * 9007199254740992.0 / sScaled.toDouble
    val est = if (eRaw <= 2.5 * 64 && vZero > 0)
      64.0 * math.log(64.0 / vZero) else eRaw
    BigDecimal(est).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Exact balls by BFS + the replica totals, per h. */
  private def replay(nodes: Seq[Long], edges: Seq[(Long, Long)])
      : (Map[Int, Long], Map[Int, Long]) = {
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val balls = collection.mutable.Map[Long, Set[Long]](nodes.map(v => v -> Set(v)): _*)
    var sketch = Map.empty[Int, Long]
    var exact = Map.empty[Int, Long]
    for (h <- 0 to Anf.H) {
      if (h > 0) {
        val next = nodes.map { v =>
          v -> (balls(v) ++ balls(v).flatMap(u => adj.getOrElse(u, Set.empty)))
        }.toMap
        next.foreach { case (v, b) => balls(v) = b }
      }
      sketch += h -> nodes.map(v => math.round(hllEst(balls(v)) * 10000)).sum
      exact += h -> nodes.map(v => balls(v).size.toLong).sum
    }
    (sketch, exact)
  }

  test("corpus: engine sketch totals equal the driver replica exactly, and track exact truth within HLL error") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    val edges = Triangles.simpleEdges(
        graft.Tables.documents(spark, sf).select("doc_id"), docs.length.toLong)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val (sketch, exact) = replay(docs, edges)
    val out = graft.SparkEntry.queries("graph_anf")(spark, sf).collect()
      .map(r => r.getLong(0).toInt -> (r.getLong(2), r.getDouble(3))).toMap
    (0 to Anf.H).foreach { h =>
      assert(out(h)._1 == sketch(h), s"h=$h: engine ${out(h)._1} != replica ${sketch(h)}")
      val rel = math.abs(out(h)._2 - exact(h)) / exact(h).toDouble
      assert(rel < 0.15, s"h=$h: sketch ${out(h)._2} vs exact ${exact(h)} rel err $rel " +
        "(1.04/sqrt(64) = 13% is the HLL design error)")
    }
    // the neighbourhood function is monotone and plateaus at 100%
    val nf = (0 to Anf.H).map(out(_)._1)
    assert(nf.zip(nf.tail).forall { case (a, b) => a <= b }, "N(h) is monotone")
  }

  test("planted star (diameter 2): plateau and covers90 from exactly h=2, replica exact at every h") {
    val nodes = (0L to 9L).toSeq
    val edges = (1L to 9L).map(l => (0L, l))
    val out = Anf.anfOf(spark, nodes.toDF("doc_id"), edges.toDF("u", "v")).collect()
      .map(r => r.getLong(0).toInt -> (r.getLong(2), r.getBoolean(6))).toMap
    assert(!out(0)._2 && !out(1)._2,
      "h<=1: singleton balls / leaf balls of 2 are far from the plateau")
    (2 to Anf.H).foreach { h =>
      assert(out(h)._1 == out(2)._1, s"a diameter-2 graph plateaus at h=2: h=$h differs")
      assert(out(h)._2, s"h=$h covers90")
    }
    val (sketch, _) = replay(nodes, edges)
    (0 to Anf.H).foreach(h => assert(out(h)._1 == sketch(h), s"star h=$h replica"))
  }
}
