package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** The driver's correctness gate round-trips every query result through a
  * pandas frame and SORTS it before hashing; pandas cannot sort (or hash)
  * array/map/struct cells, so any top-level complex column silently voids
  * the oracle check (`err: unhashable numpy.ndarray`, the round-8
  * emb_quantize_int8 / text_bpe_apply break). House rule
  * (etl/EtlQueries.scala:118): serialize sequences as '|'-joined strings.
  * This spec enforces the rule for all queries BEFORE the driver can trip
  * on it — schema analysis only, nothing executes. */
class DriverContractSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("no query exposes a top-level array/map/struct column") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val bad = fn(spark, TestSpark.sf).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
        bad
    }
    assert(offenders.isEmpty,
      s"driver-unhashable top-level columns (join with '|'): $offenders")
  }
}
