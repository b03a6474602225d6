package graft.sim

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** `emb_pca` has no SQL oracle (eigensolvers aren't SQL-expressible), so
  * this spec carries the correctness burden: model properties are checked
  * against an independent driver-side covariance replay, and the projection
  * arithmetic is re-derived from raw vectors. */
class PcaSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf
  private val D = Pca.EmbDims

  private lazy val vectors: Map[Long, Array[Double]] =
    Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap

  private lazy val model = Pca.trainedModel(spark, sf).get
  private lazy val scores: Map[Long, Array[Double]] =
    Pca.embPca(spark, sf).collect()
      .map(r => r.getLong(0) -> (1 to Pca.PcDims).map(r.getDouble).toArray).toMap

  /** Independent covariance from the raw vectors (two-pass, no Aggregator). */
  private lazy val covReplay: Array[Array[Double]] = {
    val n = vectors.size
    val xs = vectors.values.toArray
    val mu = Array.tabulate(D)(j => xs.map(_(j)).sum / n)
    Array.tabulate(D, D) { (i, j) =>
      xs.map(x => (x(i) - mu(i)) * (x(j) - mu(j))).sum / (n - 1.0)
    }
  }

  test("components are orthonormal") {
    val (_, _, _, vecs) = model
    for (a <- vecs.indices; b <- a until vecs.length) {
      val dot = (0 until D).map(j => vecs(a)(j) * vecs(b)(j)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"<v$a, v$b> = $dot")
    }
  }

  test("each component satisfies the eigen equation of the replayed covariance") {
    val (_, _, vals, vecs) = model
    vecs.zip(vals).foreach { case (w, lam) =>
      val cw = Array.tabulate(D)(i => (0 until D).map(j => covReplay(i)(j) * w(j)).sum)
      val resid = math.sqrt((0 until D).map(i => {
        val d = cw(i) - lam * w(i); d * d
      }).sum)
      assert(resid < 1e-6 * math.max(1.0, math.abs(lam)), s"||Cw - λw|| = $resid for λ = $lam")
    }
  }

  test("spectrum is descending and matches per-column score variance") {
    val (n, _, vals, _) = model
    assert(vals.toSeq == vals.sorted(Ordering[Double].reverse).toSeq)
    assert(vals.head > 0.0)
    val cols = scores.values.toArray
    (0 until Pca.PcDims).foreach { k =>
      val xs = cols.map(_(k))
      val mu = xs.sum / xs.length
      val svar = xs.map(x => (x - mu) * (x - mu)).sum / (n - 1.0)
      // scores are rounded at 1e-6; variance agrees to ~1e-4 absolute
      assert(math.abs(svar - vals(k)) < 1e-3 * math.max(1.0, vals(k)),
        s"score variance $svar vs eigenvalue ${vals(k)} at k=$k")
    }
  }

  test("projection equals the centered dot product, row by row") {
    val (_, mean, _, vecs) = model
    scores.foreach { case (id, sc) =>
      val x = vectors(id)
      (0 until Pca.PcDims).foreach { k =>
        val want = (0 until D).map(j => (x(j) - mean(j)) * vecs(k)(j)).sum
        assert(math.abs(sc(k) - want) < 5e-6, s"vec $id pc $k: ${sc(k)} vs $want")
      }
    }
  }
}
