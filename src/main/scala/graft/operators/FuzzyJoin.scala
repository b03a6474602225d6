package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.HashExprs

/** Fuzzy best-match join via FastSS deletion-neighborhood blocking.
  *
  * Resolves each distinct dirty string to its closest dictionary entry
  * within Levenshtein distance `maxDist` WITHOUT a cartesian product: both
  * sides explode into their ≤maxDist deletion neighborhoods (compiled
  * [[graft.functions.DelNeighbors]]), candidate pairs come from a hash
  * equi-join on the shared variant, and an exact `levenshtein` residual +
  * per-string argmin window pick the winner. The FastSS guarantee (Bocek
  * et al. 2007) — strings at distance ≤ d always share a ≤d-deletion
  * variant — makes the candidate set EXACT, so blocked ≡ brute-force
  * (`FuzzyMatchSpec` pins it on the corpus vocabulary).
  *
  * Scale posture: the join runs on DISTINCT dirty values, never on fact
  * rows — at 100 TB the distinct free-form vocabulary is orders of
  * magnitude smaller than the corpus, and each value expands into a
  * length-bounded neighborhood (|del≤2(s)| = 1 + n + n(n−1)/2). Neither
  * side needs to be broadcastable: a 10M-entry gazetteer dim shuffles by
  * uniform variant keys exactly like the dirty side. The caller broadcasts
  * the RESULT (distinct-vocabulary-sized) back onto facts.
  */
object FuzzyJoin {

  /** Best dictionary match per distinct value of `dirty(dirtyCol)`.
    *
    * @return one row per matched distinct dirty value:
    *         (dirtyCol, dimCol, dist), dist ≤ maxDist, ties broken by the
    *         lexicographically smallest dictionary entry.
    */
  def bestMatch(dirty: DataFrame, dirtyCol: String,
                dim: DataFrame, dimCol: String, maxDist: Int): DataFrame = {
    HashExprs.register(dirty.sparkSession)
    val left = dirty.select(col(dirtyCol)).where(col(dirtyCol).isNotNull).distinct()
      .select(col(dirtyCol),
        explode(HashExprs.delNeighbors(col(dirtyCol), maxDist)).as("variant"))
    val right = dim.select(col(dimCol)).where(col(dimCol).isNotNull).distinct()
      .select(col(dimCol),
        explode(HashExprs.delNeighbors(col(dimCol), maxDist)).as("variant"))
    // a pair can share many variants — collapse to one row before the
    // O(len²) levenshtein so each pair is scored exactly once
    val cand = left.join(right, "variant").drop("variant")
      .dropDuplicates(dirtyCol, dimCol)
    val scored = cand
      .withColumn("dist", levenshtein(col(dirtyCol), col(dimCol)).cast("long"))
      .where(col("dist") <= maxDist)
    val w = Window.partitionBy(col(dirtyCol)).orderBy(col("dist"), col(dimCol))
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1).drop("rn")
  }
}
