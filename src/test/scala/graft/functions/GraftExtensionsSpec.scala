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
    graft.geo.GeoFunctions.register(spark)
    HashExprs.register(spark)
    val registry = spark.sessionState.functionRegistry
    // every injected name resolves after the registrars run…
    GraftExtensions.InjectedNames.foreach { n =>
      assert(registry.functionExists(new FunctionIdentifier(n)),
        s"$n injected by GraftExtensions but not registered by register()")
    }
    // …and the extension list is not missing any registrar-installed name
    // (13 = 3 geo + 10 hash/sketch; bump BOTH places when adding one)
    assert(GraftExtensions.InjectedNames.size == 13)
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
      "SELECT sig_match_count(array(1L, 2L, 3L), array(1L, 9L, 3L))")
    assert(exercised.size == GraftExtensions.InjectedNames.size)
    // every function is SQL-callable end to end (builder + type coercion)
    exercised.foreach { q =>
      val rows = spark.sql(q).collect()
      assert(rows.length == 1, q)
    }
  }
}
