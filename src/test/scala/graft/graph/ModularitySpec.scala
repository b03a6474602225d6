package graft.graph

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `graph_modularity` contract: the integerized Q replays from first
  * principles driver-side against the registered labelprop communities,
  * planted two-clique topology pins the textbook Q = 1/2 under a perfect
  * partition, and the null-model sanity holds (everything in ONE
  * community ⇒ Q = 0 exactly). */
class ModularitySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sf

  test("Q replays from first principles against the registered communities at sf0.001") {
    val comm = SparkEntry.queries("graph_labelprop")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nDocs = comm.size.toLong
    val edges = comm.keySet.toSeq.flatMap { id =>
      Seq((id * 2654435761L) % nDocs, (id % 100L) % nDocs, (id / 7L) % nDocs)
        .filter(_ != id).map(d => (math.min(id, d), math.max(id, d)))
    }.distinct
    val m = edges.size.toLong
    val intra = edges.count { case (u, v) => comm(u) == comm(v) }.toLong
    val degSq = edges.flatMap { case (u, v) => Seq(u, v) }
      .groupBy(comm).map { case (_, g) => val d = g.size.toLong; d * d }.sum
    val q = java.math.BigDecimal.valueOf(
        (4L * m * intra - degSq).toDouble / (4L * m * m).toDouble)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val row = SparkEntry.queries("graph_modularity")(spark, sf).collect().head
    assert(row.getLong(0) == m && row.getLong(1) == nDocs)
    assert(row.getLong(3) == intra && row.getLong(4) == degSq)
    assert(row.getDouble(5) == q, s"Q ${row.getDouble(5)} != replica $q")
    graft.CacheRegistry.releaseAll()
  }

  private def runOn(edges: Seq[(Long, Long)], comm: Seq[(Long, Long)]) = {
    val r = Modularity.modularityOf(
      edges.toDF("u", "v"), comm.toDF("node", "community")).collect().head
    graft.CacheRegistry.releaseAll()
    r
  }

  test("two disjoint 4-cliques under the perfect partition pin the textbook Q = 1/2") {
    def clique(ids: Seq[Long]) =
      for (i <- ids.indices; j <- i + 1 until ids.size) yield (ids(i), ids(j))
    val edges = clique(Seq(0L, 1L, 2L, 3L)) ++ clique(Seq(4L, 5L, 6L, 7L))
    val comm = (0L to 3L).map(_ -> 0L) ++ (4L to 7L).map(_ -> 1L)
    val row = runOn(edges, comm)
    assert(row.getLong(0) == 12L && row.getLong(3) == 12L)
    assert(row.getDouble(5) == 0.5, s"two-clique Q must be exactly 0.5: $row")
  }

  test("the one-community partition scores Q = 0 exactly (the null model)") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L), (0L, 2L))
    val comm = (0L to 3L).map(_ -> 42L)
    val row = runOn(edges, comm)
    // intra = m and deg_sq = (2m)^2 => numerator 4m^2 - 4m^2 = 0
    assert(row.getDouble(5) == 0.0, s"single-community Q must be 0: $row")
  }
}
