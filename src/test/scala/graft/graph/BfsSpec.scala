package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class BfsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private lazy val got: Map[Long, Long] =
    Bfs.bfs(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  test("hop distances equal a driver-side BFS replay") {
    val n = Tables.documents(spark, sf).count()
    val und = (0L until n).flatMap(i => Seq(
      (i * 2654435761L) % n, (i % 100L) % n, (i / 7L) % n).map(j => i -> j))
      .filter { case (a, b) => a != b }
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val adj = und.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val dist = scala.collection.mutable.Map(Bfs.Source -> 0L)
    var frontier = Set(Bfs.Source)
    for (k <- 1 to Bfs.MaxHops) {
      frontier = frontier.flatMap(v => adj.getOrElse(v, Set.empty))
        .filterNot(dist.contains)
      frontier.foreach(v => dist(v) = k.toLong)
    }
    val expect = (0L until n).map(v => v -> dist.getOrElse(v, -1L)).toMap
    assert(got == expect)
  }

  test("BFS levels are sound: some spread exists and neighbors differ by ≤ 1 hop") {
    val levels = got.values.filter(_ >= 0)
    assert(levels.max >= 1, "graph must have nodes beyond the source")
    assert(got(Bfs.Source) == 0L)
    // triangle inequality on every edge of the replayed graph
    val n = got.size.toLong
    (0L until n).foreach { i =>
      Seq((i * 2654435761L) % n, (i % 100L) % n, (i / 7L) % n)
        .filter(_ != i).foreach { j =>
          val (di, dj) = (got(i), got(j))
          if (di >= 0 && dj >= 0)
            assert(math.abs(di - dj) <= 1 || di.max(dj) == Bfs.MaxHops,
              s"edge ($i,$j): dist $di vs $dj")
        }
    }
  }
}
