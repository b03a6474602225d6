package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cell-decomposed spatial containment join (SURVEY.md §5).
  *
  * Point-in-box joins are non-equi, so Spark can only plan them as
  * (broadcast) nested-loop — fine for a 5-row borough dim, quadratic pain
  * once the dim outgrows a broadcast (40k intersections, census blocks…).
  * The scalable decomposition: overlay a fixed grid, explode each box into
  * the cells it covers, key each point by its cell, equi-join on the cell
  * id, then re-check the exact predicate (cells over-approximate). The join
  * becomes a plain hash/sort-merge join on a uniform integer key — shuffle
  * partitioning does the spatial pruning.
  */
object RangeJoin {

  /** Containment join of points against boxes on a `cellDeg` grid.
    *
    * @param points  (pointKeyCols..., lng, lat) — lng/lat column names
    * @param boxes   (boxCols..., west, east, south, north) — half-open boxes
    * @return points joined with matching boxes (inner), exact semantics
    */
  def pointInBox(points: DataFrame, boxes: DataFrame, lng: String, lat: String,
      west: String = "west", east: String = "east",
      south: String = "south", north: String = "north",
      cellDeg: Double = 0.05): DataFrame = {

    def cellOf(l: Column, b: Column): Column =
      floor(l / cellDeg).cast("long") * 100000L + floor(b / cellDeg).cast("long")

    val cellRange = (lo: String, hi: String) => {
      val start = floor(col(lo) / cellDeg).cast("long")
      // Emit cells [floor(lo/c), floor(hi/c)] — a PROVABLE superset of the
      // cells any matching point can occupy: p < hi ⇒ floor(p/c) ≤
      // floor(hi/c) (IEEE division is monotone), and p ≥ lo ⇒ floor(p/c) ≥
      // floor(lo/c). A box ending exactly on a cell edge emits one cell
      // whose candidates all fail the exact `< hi` recheck — one empty
      // candidate bucket per box axis, never a miss. (An earlier 1e-12
      // nudge tried to skip that cell but silently MISSED points whose
      // coordinate fell between the edge and a straddling hi — exactness
      // beats saving one cell.)
      val stop = floor(col(hi) / cellDeg).cast("long")
      sequence(start, greatest(start, stop))
    }

    val boxCells = boxes
      // degenerate boxes (hi <= lo) match nothing under the exact half-open
      // predicate; drop them BEFORE exploding — sequence(start, stop) with
      // start > stop throws at runtime, turning an empty result into a
      // query failure
      .filter(col(east) > col(west) && col(north) > col(south))
      .withColumn("_cx", explode(cellRange(west, east)))
      .withColumn("_cy", explode(cellRange(south, north)))
      .withColumn("_cell", col("_cx") * 100000L + col("_cy"))
      .drop("_cx", "_cy")

    val keyedPoints = points.withColumn("_cell", cellOf(col(lng), col(lat)))

    keyedPoints.join(boxCells, "_cell")
      .filter(col(lng) >= col(west) && col(lng) < col(east) &&
        col(lat) >= col(south) && col(lat) < col(north))
      .drop("_cell")
  }
}
