package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `graph_components` contract: labels equal a driver BFS ground truth on
  * the corpus graph, the oracle's declared round bound actually converges
  * there (one extra round is a fixed point), isolated nodes self-label,
  * and sizes add up to |V|. */
class ComponentsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def corpusEdges(): (Seq[Long], Seq[(Long, Long)]) = {
    val ids = graft.Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0)).toSeq
    val n = ids.length.toLong
    val edges = ids.flatMap { id =>
      Seq((id * 2654435761L) % n, (id % 100L) % n, (id / 7) % n)
        .filter(_ != id).map(d => (math.min(id, d), math.max(id, d)))
    }.distinct
    (ids, edges)
  }

  test("labels equal a driver union-find ground truth; sizes sum to |V|") {
    val (ids, edges) = corpusEdges()
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x0: Long): Long = {
      var x = x0
      while (parent.getOrElse(x, x) != x) x = parent.getOrElse(x, x)
      x
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val expectLab = ids.map(id => id -> find(id)).toMap
    val got = SparkEntry.queries("graph_components")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(g => g._1 -> g._2).toMap == expectLab)
    assert(got.map(_._3).sum == ids.length.toLong * 1L ||
      got.groupBy(_._2).forall { case (_, rows) =>
        rows.head._3 == rows.length.toLong })
    assert(got.map(_._1).toSeq == ids.sorted, "every node labeled once")
  }

  test("the oracle's round bound converges on the corpus (declared equivalence checked)") {
    val (ids, edges) = corpusEdges()
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2) }
    var lab = ids.map(id => id -> id).toMap
    def round(l: Map[Long, Long]): Map[Long, Long] = {
      val h = l.map { case (v, lv) =>
        v -> math.min(lv, adj.getOrElse(v, Nil).map(l).foldLeft(lv)(math.min))
      }
      h.map { case (v, lv) => v -> math.min(lv, h.getOrElse(lv, lv)) }
    }
    for (_ <- 1 to Components.OracleRounds) lab = round(lab)
    assert(round(lab) == lab,
      s"oracle must be a fixed point after ${Components.OracleRounds} rounds")
    val got = SparkEntry.queries("graph_components")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == lab, "unrolled-round labels must equal the exact labels")
  }

  test("isolated node (all self-loop edges) labels itself, size 1") {
    import spark.implicits._
    // n=1: the single node's three synthetic targets are all itself ->
    // zero edges survive the self-loop filter -> the left-join/coalesce
    // fallback must label it with its own id
    val d = java.nio.file.Files.createTempDirectory("cc1").toString
    Seq((0L, "solo", "en", "t", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("graph_components")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((0L, 0L, 1L)))
  }
}
