package graft.functions

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property-style checks of the compiled sketch expressions, driven through
  * SQL (the registered-function surface) so analysis, type-checking, and
  * eval are all exercised. Uses scalacheck generators with a fixed seed loop
  * (the scalatest-scalacheck bridge is not on the offline classpath). */
class HashExprsPropSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  HashExprs.register(spark)
  graft.geo.GeoFunctions.register(spark)

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val doc = Gen.listOfN(30, word).map(_.mkString(" "))
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n * 4).iterator.flatMap(i => g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(42L + i))).take(n).toSeq

  test("jaccard_sim is bounded, symmetric, and 1 for identical sets") {
    val pairs = samples(doc, 20).zip(samples(doc, 20).reverse)
    val rows = pairs.toDF("a", "b").selectExpr(
      "jaccard_sim(shingles3(a), shingles3(b)) AS ab",
      "jaccard_sim(shingles3(b), shingles3(a)) AS ba",
      "jaccard_sim(shingles3(a), shingles3(a)) AS aa").collect()
    rows.foreach { r =>
      assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0)
      assert(r.getDouble(0) == r.getDouble(1), "jaccard must be symmetric")
      assert(r.getDouble(2) == 1.0, "identical non-empty shingle sets must score 1")
    }
  }

  test("minhash signature similarity tracks true jaccard for near-identical docs") {
    val docs = samples(doc, 10)
    val rows = docs.map(a => (a, a + " zzz")).toDF("a", "b").selectExpr(
      "minhash_sig(shingles3(a)) AS sa", "minhash_sig(shingles3(b)) AS sb")
      .selectExpr("size(filter(zip_with(sa, sb, (x, y) -> x = y), v -> v)) AS agree")
      .collect()
    rows.foreach(r => assert(r.getInt(0) >= 40,
      s"near-identical docs must agree on most of 64 minima, got ${r.getInt(0)}"))
  }

  test("simhash is order-insensitive over the token multiset") {
    val docs = samples(doc, 10)
    val rows = docs.map(a => (a, a.split(" ").reverse.mkString(" "))).toDF("a", "b")
      .selectExpr("simhash64(split(a, ' ')) AS ha", "simhash64(split(b, ' ')) AS hb").collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("cosine_sim is 1 on self, symmetric, and within [-1, 1]") {
    val vec = Gen.listOfN(16, Gen.choose(-5.0, 5.0)).suchThat(_.exists(_ != 0.0))
    val rows = samples(vec, 20).zip(samples(vec, 20).reverse).toDF("a", "b").selectExpr(
      "cosine_sim(a, b) AS ab", "cosine_sim(b, a) AS ba", "cosine_sim(a, a) AS aa").collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
      assert(r.getDouble(0) == r.getDouble(1))
      assert(r.getDouble(0) >= -1.0 - 1e-12 && r.getDouble(0) <= 1.0 + 1e-12)
    }
  }

  test("rep_stats counters match a naive recomputation") {
    val docs = samples(doc, 20) ++ Seq("a a a a", "x y x y x y", "solo")
    val rows = docs.toDF("t")
      .selectExpr("t", "rep_stats(t) AS rs")
      .select("t", "rs.n_words", "rs.top_word_n", "rs.n_bigrams", "rs.dup_bigram_n")
      .collect()
    rows.foreach { r =>
      val words = r.getString(0).split("\\s+")
      val wc = words.groupBy(identity).view.mapValues(_.length.toLong)
      val bgs = words.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val bc = bgs.groupBy(identity).view.mapValues(_.length.toLong)
      assert(r.getLong(1) == words.length.toLong)
      assert(r.getLong(2) == wc.values.max)
      assert(r.getLong(3) == bgs.length.toLong)
      assert(r.getLong(4) == bc.values.filter(_ > 1).sum)
    }
  }

  test("hyperplane_bands: deterministic, |bands| keys each within bandBits range") {
    val vecs = samples(Gen.listOfN(64, Gen.choose(-1.0, 1.0)), 15)
    val rows = vecs.toDF("v")
      .selectExpr("hyperplane_bands(v) AS a", "hyperplane_bands(v) AS b").collect()
    rows.foreach { r =>
      val a = r.getSeq[Long](0); val b = r.getSeq[Long](1)
      assert(a == b, "same vector must hash identically")
      assert(a.length == 4)
      assert(a.forall(k => k >= 0 && k < 16), "4-bit band keys")
    }
  }

  test("top_cells agrees with a naive rounded-cosine argsort") {
    val cents = samples(Gen.listOfN(8, Gen.choose(-1.0, 1.0)), 6)
    val vecs = samples(Gen.listOfN(8, Gen.choose(-1.0, 1.0)), 12)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      BigDecimal(dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val centsSql = cents.map(_.mkString("array(", ",", ")")).mkString("array(", ",", ")")
    val rows = vecs.toDF("v").selectExpr(s"v", s"top_cells(v, $centsSql, 3) AS tc").collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](0)
      val expected = cents.zipWithIndex
        .map { case (c, i) => (cos(v, c), i) }
        .sortBy { case (s, i) => (-s, i) }.take(3).map(_._2.toLong)
      assert(r.getSeq[Long](1) == expected, s"v=$v")
    }
  }

  test("sig_match_count equals the zip_with formulation on generated signatures") {
    val docs = samples(doc, 15)
    val rows = docs.map(a => (a, a + " zzz")).toDF("a", "b")
      .selectExpr("minhash_sig(shingles3(a)) AS sa", "minhash_sig(shingles3(b)) AS sb")
      .selectExpr(
        "sig_match_count(sa, sb) AS compiled",
        "size(filter(zip_with(sa, sb, (x, y) -> x = y), v -> v)) AS lambda",
        "sig_match_count(sa, sa) AS self")
      .collect()
    rows.foreach { r =>
      assert(r.getInt(0) == r.getInt(1),
        s"compiled=${r.getInt(0)} must equal lambda=${r.getInt(1)}")
      assert(r.getInt(2) == graft.dedup.MinHashLsh.K, "self-match must be full K")
    }
  }

  test("sig_match_count literal cases: values, and null positions never match") {
    val rows = spark.sql(
      """SELECT sig_match_count(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS two,
        |       sig_match_count(array(1L, 2L), array(3L, 4L)) AS zero,
        |       sig_match_count(array(CAST(NULL AS LONG), 2L),
        |                       array(CAST(NULL AS LONG), 2L)) AS nulls
        |""".stripMargin).collect()
    assert(rows.head.getInt(0) == 2)
    assert(rows.head.getInt(1) == 0)
    assert(rows.head.getInt(2) == 1,
      "two null positions must NOT count as a match (zip_with parity)")
  }

  test("cdc_chunks: lossless partition, guard bounds, determinism on generated docs") {
    val docs = samples(Gen.listOfN(60, word).map(_.mkString(" ")), 20)
    val rows = docs.toDF("t")
      .selectExpr("t", "cdc_chunks(t) AS c1", "cdc_chunks(t) AS c2").collect()
    rows.foreach { r =>
      val t = r.getString(0)
      val c1 = r.getSeq[String](1)
      val c2 = r.getSeq[String](2)
      assert(c1 == c2, "chunking must be deterministic")
      assert(c1.mkString(" ") == t.split("\\s+", -1).mkString(" "),
        "chunks must reassemble to the original word stream")
      c1.dropRight(1).foreach { c =>
        val n = c.split(" ").length
        assert(n >= 4 && n <= 16, s"interior chunk of $n words outside [4,16]")
      }
      assert(c1.last.split(" ").length <= 16)
    }
  }

  test("haversine is symmetric, non-negative, zero on self") {
    val pt = for {
      lat <- Gen.choose(-85.0, 85.0); lng <- Gen.choose(-179.0, 179.0)
    } yield (lat, lng)
    val rows = samples(pt, 20).zip(samples(pt, 20).reverse)
      .map { case ((a, b), (c, d)) => (a, b, c, d) }
      .toDF("lat1", "lng1", "lat2", "lng2").selectExpr(
        "haversine_m(lat1, lng1, lat2, lng2) AS ab",
        "haversine_m(lat2, lng2, lat1, lng1) AS ba",
        "haversine_m(lat1, lng1, lat1, lng1) AS self").collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1))
      assert(r.getDouble(0) >= 0.0)
      assert(r.getDouble(2) == 0.0)
    }
  }
}
