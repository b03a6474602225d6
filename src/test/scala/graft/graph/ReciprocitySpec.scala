package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `graph_reciprocity` contract: every readout replays from first
  * principles on the corpus graph; planted topologies pin the textbook
  * anchors — a 2-cycle with a tail gives r = 2/3 and ρ = 1/3 exactly, a
  * pure DAG gives r = 0 with ρ = −a/(1−a) (anti-reciprocal by
  * construction), and the complete digraph pins the ρ NULL guard (density
  * 1 leaves no variance to correlate). */
class ReciprocitySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sf

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  test("all readouts replay from first principles on the corpus graph at sf0.001") {
    val n = graft.Tables.documents(spark, sf).count()
    val edges = (0L until n).flatMap { id =>
      Seq((id * 2654435761L) % n, (id % 100L) % n, (id / 7L) % n)
        .filter(_ != id).map(d => (id, d))
    }.distinct
    val eSet = edges.toSet
    val m = edges.count { case (u, v) => eSet.contains((v, u)) }.toLong
    val e = edges.size.toLong
    val d = n * (n - 1L)
    val row = SparkEntry.queries("graph_reciprocity")(spark, sf).collect().head
    assert(row.getLong(0) == n && row.getLong(1) == e && row.getLong(2) == m)
    assert(row.getDouble(3) == round6(m.toDouble / e.toDouble))
    assert(row.getDouble(4) == round6(e.toDouble / d.toDouble))
    val rho = (m.toDouble * d.toDouble - e.toDouble * e.toDouble) /
      (e.toDouble * (d.toDouble - e.toDouble))
    assert(row.getDouble(5) == round6(rho))
    graft.CacheRegistry.releaseAll()
  }

  private def runOn(edges: Seq[(Long, Long)], n: Long) = {
    val r = Reciprocity.reciprocityOf(edges.toDF("u", "v"), n).collect().head
    graft.CacheRegistry.releaseAll()
    r
  }

  test("2-cycle with a tail: r = 2/3, rho = 1/3 exactly") {
    // nodes {0,1,2}: 0⇄1 mutual, 1→2 one-way. E=3, m=2, D=6:
    // rho = (2·6 − 9)/(3·(6 − 3)) = 3/9 = 1/3.
    val r = runOn(Seq((0L, 1L), (1L, 0L), (1L, 2L)), 3L)
    assert(r.getLong(1) == 3L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == round6(2.0 / 3.0))
    assert(r.getDouble(5) == round6(1.0 / 3.0))
  }

  test("pure DAG: r = 0, rho = -a/(1-a) (anti-reciprocal)") {
    // 0→1→2: E=2, m=0, D=6, a=1/3 → rho = −(1/3)/(2/3) = −1/2.
    val r = runOn(Seq((0L, 1L), (1L, 2L)), 3L)
    assert(r.getLong(2) == 0L && r.getDouble(3) == 0.0)
    assert(r.getDouble(5) == -0.5)
  }

  test("complete digraph: r = 1, rho NULL (no variance at density 1)") {
    val r = runOn(Seq((0L, 1L), (1L, 0L)), 2L)
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0)
    assert(r.isNullAt(5), s"complete digraph must yield NULL rho: $r")
  }

  test("empty corpus: ONE readout row with zero counts and NULL ratios (the oracle's aggregate-CTE shape)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_recip_empty").toString
    graft.Tables.documents(spark, sf).limit(0)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("graph_reciprocity")(spark, dir).collect()
    assert(rows.length == 1, "an aggregate readout has exactly one row even on empty input")
    val r = rows.head
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L && r.getLong(2) == 0L)
    assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
    graft.CacheRegistry.releaseAll()
  }
}
