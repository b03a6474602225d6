package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The hybrid component resolver: the driver union-find (small-graph path)
  * and the distributed min-label/pointer-doubling loop must assign
  * IDENTICAL labels — and both must equal the ground truth (min id of the
  * BFS component) on a generated graph mixing chains, cliques, stars and
  * isolated pairs. */
class ConnectedComponentsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def groundTruth(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = new scala.collection.mutable.HashMap[Long, List[Long]]()
    edges.foreach { case (a, b) =>
      adj(a) = b :: adj.getOrElse(a, Nil); adj(b) = a :: adj.getOrElse(b, Nil)
    }
    val label = new scala.collection.mutable.HashMap[Long, Long]()
    adj.keys.toSeq.sorted.foreach { start =>
      if (!label.contains(start)) {
        var comp = List(start)
        val seen = scala.collection.mutable.Set(start)
        var frontier = List(start)
        while (frontier.nonEmpty) {
          frontier = frontier.flatMap(adj(_)).filterNot(seen)
          frontier.foreach { n => seen += n; comp ::= n }
        }
        val m = comp.min
        comp.foreach(n => label(n) = m)
      }
    }
    label.toMap
  }

  private val rnd = new scala.util.Random(42)
  private val edges: Seq[(Long, Long)] = {
    val chains = (0 until 5).flatMap { c =>
      val base = 1000L * c
      (0 until 30).map(i => (base + i, base + i + 1)) // long chains (diameter test)
    }
    val clique = for (i <- 0 until 8; j <- i + 1 until 8) yield (9000L + i, 9000L + j)
    val star = (1 until 20).map(i => (20000L, 20000L + i))
    val pairs = (0 until 40).map(i => (30000L + 2 * i, 30001L + 2 * i))
    val random = (0 until 60).map(_ => (rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
    rnd.shuffle(chains ++ clique ++ star ++ pairs ++ random)
  }

  test("driver union-find and distributed loop assign identical, correct labels") {
    val df = edges.toDF("a", "b")
    val truth = groundTruth(edges)
    val small = DedupClusters.connectedComponents(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = DedupClusters.connectedComponents(df, smallGraphEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(small == truth, "union-find path must match BFS ground truth")
    assert(dist == truth, "distributed loop must match BFS ground truth")
    assert(small == dist)
  }

  test("self-loops and duplicate edges do not perturb labels") {
    val noisy = edges ++ Seq((5L, 5L), (9000L, 9001L), (9001L, 9000L))
    val truth = groundTruth(noisy)
    val small = DedupClusters.connectedComponents(noisy.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(small == truth)
  }
}
