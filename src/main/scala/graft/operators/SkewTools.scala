package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation building blocks (SURVEY.md §5).
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; these
  * helpers cover the two places it does not: heavily-skewed aggregations
  * (one hot key melts one reducer) and broadcast-infeasible skewed joins.
  * Salting is deterministic — derived from a hash of a spreading column,
  * never rand() — so plans stay replayable and the driver's hash compare
  * deterministic.
  */
object SkewTools {

  /** Two-phase (salted) aggregation: partial aggregate on (key, salt), then
    * final aggregate on key. Correct for any commutative, associative agg
    * that decomposes (sum/count/min/max — pass the partial→final pairs).
    *
    * The salt must come from a guaranteed-diverse source: hashing the VALUE
    * collapses to one bucket when a hot key carries one constant value
    * (the skew returns exactly where it hurts). Default is a per-row id —
    * diverse by construction on any data; the salt only routes partials, so
    * the RESULT is identical regardless of cluster size or partition
    * layout. Callers with a known-diverse column can pass it instead. */
  def saltedSum(df: DataFrame, key: Column, value: Column, buckets: Int,
      spreadBy: Column = monotonically_increasing_id()): DataFrame =
    df.select(key.as("k"), value.as("v"), pmod(xxhash64(spreadBy), lit(buckets)).as("_salt"))
      .groupBy(col("k"), col("_salt"))
      .agg(sum(col("v")).as("_partial"), count(lit(1)).as("_pn"))
      .groupBy(col("k"))
      .agg(sum(col("_partial")).as("sum_v"), sum(col("_pn")).as("n"))

  /** Salted equi-join for a skewed fact against a small-but-not-broadcastable
    * dim: the fact side gets a deterministic salt in [0, buckets); the dim
    * side is replicated `buckets` times; the join key becomes (key, salt),
    * spreading each hot key over `buckets` reducers. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, buckets: Int,
      spreadBy: Column): DataFrame = {
    val saltedFact = fact.withColumn("_salt", pmod(xxhash64(spreadBy), lit(buckets)))
    val replicatedDim = dim.withColumn("_salt", explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(replicatedDim, Seq(key, "_salt")).drop("_salt")
  }
}
