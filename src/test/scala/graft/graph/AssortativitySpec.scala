package graft.graph

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `graph_assortativity` contract: the exact-integer r replays from first
  * principles on the corpus graph; planted P₃ pins the textbook r = −1
  * exactly (a path's ends attach to its middle — maximal
  * disassortativity at 3 nodes); a planted cycle pins the zero-variance
  * NULL guard (degree-regular graphs have no degree correlation to
  * report). */
class AssortativitySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sf

  test("r replays from first principles on the corpus graph at sf0.001") {
    val nDocs = graft.Tables.documents(spark, sf).count()
    val ids = (0L until nDocs)
    val edges = ids.flatMap { id =>
      Seq((id * 2654435761L) % nDocs, (id % 100L) % nDocs, (id / 7L) % nDocs)
        .filter(_ != id).map(d => (math.min(id, d), math.max(id, d)))
    }.distinct
    val deg = edges.flatMap { case (u, v) => Seq(u, v) }
      .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val m = edges.size.toLong
    val a = edges.map { case (u, v) => deg(u) + deg(v) }.sum
    val b = edges.map { case (u, v) => deg(u) * deg(v) }.sum
    val c = edges.map { case (u, v) => deg(u) * deg(u) + deg(v) * deg(v) }.sum
    val den = 2L * m * c - a * a
    val row = SparkEntry.queries("graph_assortativity")(spark, sf).collect().head
    assert(row.getLong(0) == m && row.getLong(1) == b &&
      row.getLong(2) == a && row.getLong(3) == c)
    if (den > 0) {
      val r = java.math.BigDecimal.valueOf(
          (4L * m * b - a * a).toDouble / den.toDouble)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      assert(row.getDouble(4) == r, s"r ${row.getDouble(4)} != replica $r")
    } else assert(row.isNullAt(4))
    graft.CacheRegistry.releaseAll()
  }

  private def runOn(edges: Seq[(Long, Long)]) = {
    val r = Assortativity.assortativityOf(edges.toDF("u", "v")).collect().head
    graft.CacheRegistry.releaseAll()
    r
  }

  test("P3 pins the textbook r = -1 exactly; a cycle pins the zero-variance NULL") {
    val p3 = runOn(Seq((0L, 1L), (1L, 2L)))
    assert(p3.getDouble(4) == -1.0, s"path-of-3 must be maximally disassortative: $p3")
    val c4 = runOn(Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L)))
    assert(c4.isNullAt(4), s"a 2-regular cycle has no degree variance: $c4")
  }
}
