package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The custom-expression surface has two registration paths: per-session
  * `register()` calls (used by the query library) and the
  * `spark.sql.extensions=graft.functions.GraftExtensions` injection (for
  * thrift/connect servers). This spec pins them to the same function set. */
class GraftExtensionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("extension-injected functions equal the per-session registered set") {
    // MECHANICAL drift check: diff a fresh session's registry across the
    // registrar calls — a hand-maintained count let a new registrar
    // function (phash64, round 6) silently miss the extensions path
    val fresh = spark.newSession()
    def names = fresh.sessionState.functionRegistry.listFunction()
      .map(_.funcName).toSet
    val before = names
    graft.geo.GeoFunctions.register(fresh)
    HashExprs.register(fresh)
    val installed = names -- before
    assert(installed == GraftExtensions.InjectedNames,
      s"registrar/extension drift: registrar-only=${installed -- GraftExtensions.InjectedNames}, " +
        s"extension-only=${GraftExtensions.InjectedNames -- installed}")
    graft.geo.GeoFunctions.register(spark)
    HashExprs.register(spark)
    val registry = spark.sessionState.functionRegistry
    GraftExtensions.InjectedNames.foreach { n =>
      assert(registry.functionExists(new FunctionIdentifier(n)),
        s"$n injected by GraftExtensions but not registered by register()")
    }
    val exercised = Seq(
      "SELECT haversine_m(40.0, -74.0, 41.0, -74.0)",
      "SELECT point_in_polygon(0.5, 0.5, array(1.0, 0.0, 1.0, 1.0, 0.0, 1.0, 0.0, 0.0))",
      "SELECT point_in_multipolygon(0.5, 0.5, array(array(1.0, 0.0, 1.0, 1.0, 0.0, 1.0, 0.0, 0.0)))",
      "SELECT minhash_sig(array('a b c'))",
      "SELECT simhash64(array('a', 'b', 'c'))",
      "SELECT shingles3('a b c d')",
      "SELECT bigrams_all('a b c')",
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D))",
      "SELECT jaccard_sim(array('a'), array('a'))",
      "SELECT hyperplane_bands(array(1.0D, 0.0D))",
      "SELECT top_cells(array(1.0D, 0.0D), array(array(1.0D, 0.0D)), 1)",
      "SELECT rep_stats('a a b')",
      "SELECT sig_match_count(array(1L, 2L, 3L), array(1L, 9L, 3L))",
      "SELECT phash64(encode('a long enough media payload', 'UTF-8'))",
      "SELECT pq_score(array(0L, 1L), array(array(1.0D, 2.0D), array(3.0D, 4.0D)))",
      "SELECT vec_sub(array(1.0D, 2.0D), array(0.5D, 0.25D))",
      "SELECT del_neighbors('abc', 2)",
      "SELECT cdc_chunks('a few words to chunk into pieces')",
      "SELECT quality_margin('score this text', array(1L, -2L, 3L, 4L))")
    assert(exercised.size == GraftExtensions.InjectedNames.size)
    // every function is SQL-callable end to end (builder + type coercion)
    exercised.foreach { q =>
      val rows = spark.sql(q).collect()
      assert(rows.length == 1, q)
    }
  }
}
