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

    // join on the (x, y) cell index PAIR, not a folded composite long — a
    // folded key collides once a box spans more cells than the fold stride
    // (possible for small cellDeg), silently duplicating matches
    val boxCells = boxes
      // degenerate boxes (hi <= lo) match nothing under the exact half-open
      // predicate; drop them BEFORE exploding — sequence(start, stop) with
      // start > stop throws at runtime, turning an empty result into a
      // query failure
      .filter(col(east) > col(west) && col(north) > col(south))
      .withColumn("_cx", explode(cellRange(west, east)))
      .withColumn("_cy", explode(cellRange(south, north)))

    val keyedPoints = points
      .withColumn("_cx", floor(col(lng) / cellDeg).cast("long"))
      .withColumn("_cy", floor(col(lat) / cellDeg).cast("long"))

    keyedPoints.join(boxCells, Seq("_cx", "_cy"))
      .filter(col(lng) >= col(west) && col(lng) < col(east) &&
        col(lat) >= col(south) && col(lat) < col(north))
      .drop("_cx", "_cy")
  }

  /** Containment join of points against MULTIPOLYGON zones — the
    * past-broadcast path for `etl_zone_multi`-shaped assignment
    * (main.py:408-533's ST_Within joins) once a zone dim outgrows a
    * broadcast (census blocks, parcel maps): 8 broadcast NLJs are optimal
    * for 5-row borough dims, quadratic pain at 100k zones. Decomposition:
    *  1. dim side: bbox per zone from its ring vertices (even positions x,
    *     odd y — a per-zone-row computation on the SMALL side), exploded
    *     over the covering grid cells;
    *  2. fact side: each point keyed by its one cell;
    *  3. hash equi-join on the cell id — shuffle partitioning does the
    *     spatial pruning on uniform integer keys;
    *  4. exact residual: the same compiled multi-ring ray cast the
    *     broadcast path uses, so semantics are IDENTICAL (cells
    *     over-approximate; the recheck is exact — spec-proven equal to
    *     the broadcast-NLJ assignments).
    *
    * Cell ranges are the closed [floor(lo/c), floor(hi/c)] superset (IEEE
    * division is monotone — same proof as `pointInBox`); a boundary cell
    * only ever adds candidates that the exact ray cast rejects.
    *
    * @param points (pointCols..., lng, lat)
    * @param zones  (zoneCols..., rings: array<array<double>> of flat
    *               [x0,y0,x1,y1,...] vertex rings)
    * @return inner join of points with containing zones, exact semantics
    */
  def pointInZones(points: DataFrame, zones: DataFrame, lng: String, lat: String,
      rings: String = "rings", cellDeg: Double = 0.05): DataFrame = {
    graft.geo.GeoFunctions.register(points.sparkSession)

    val flat = flatten(col(rings))
    def coords(parity: Int) = filter(flat, (_, i) => i % 2 === lit(parity))
    val boxes = zones
      .withColumn("_w", array_min(coords(0)))
      .withColumn("_e", array_max(coords(0)))
      .withColumn("_s", array_min(coords(1)))
      .withColumn("_n", array_max(coords(1)))
      // a zone with no vertices contains nothing; drop it before sequence()
      .filter(col("_w").isNotNull && col("_s").isNotNull)

    def cellRange(lo: Column, hi: Column) = {
      val start = floor(lo / cellDeg).cast("long")
      val stop = floor(hi / cellDeg).cast("long")
      sequence(start, greatest(start, stop))
    }
    // join on the (x, y) cell index PAIR (see pointInBox: a folded
    // composite long collides for small cellDeg and duplicates matches)
    val zoneCells = boxes
      .withColumn("_cx", explode(cellRange(col("_w"), col("_e"))))
      .withColumn("_cy", explode(cellRange(col("_s"), col("_n"))))
      .drop("_w", "_e", "_s", "_n")

    val keyedPoints = points
      .withColumn("_cx", floor(col(lng) / cellDeg).cast("long"))
      .withColumn("_cy", floor(col(lat) / cellDeg).cast("long"))

    // a point has exactly ONE cell and a zone emits each covering cell
    // once, so no (point, zone) pair can duplicate — no distinct needed
    keyedPoints.join(zoneCells, Seq("_cx", "_cy"))
      .filter(graft.geo.GeoFunctions.pointInMultiPoly(col(lng), col(lat), col(rings)))
      .drop("_cx", "_cy")
  }

  /** k=1 nearest-neighbor snap join within a radius — "link each point to
    * its closest site" (the reference's initial intersection linkage,
    * `initialpolygonlinkage/` + `walkmapper/` nearest-feature snapping),
    * decomposed the same way as [[pointInBox]] so it never needs a
    * broadcast or an NLJ:
    *
    *  1. each site becomes its radius bounding box (a per-row computation
    *     on the SMALL side), exploded over covering grid cells;
    *  2. each point is keyed by its one cell; hash equi-join on the cell
    *     pair yields a bounded candidate set (sites within ~r of the
    *     point, over-approximated);
    *  3. exact residual: squared planar distance
    *     `d2 = (lat−slat)² + ((lng−slng)·lngScale)²` with `d2 <= r2`;
    *  4. argmin per point: `row_number` over (d2, site key) — the window
    *     partitions by point key, so the reduction is distributed and the
    *     tie on equal distance breaks deterministically to the lowest key.
    *
    * The metric is the small-angle planar approximation (lngScale ≈
    * cos(mid-latitude)) built ONLY from IEEE `+`/`*`/`-` on doubles — no
    * trig — so a DuckDB oracle writing the same expression text produces
    * bit-identical distances and an identical argmin (haversine's last-ulp
    * `sin`/`asin` divergence can flip an argmin between engines; the planar
    * form cannot). The box pads each extent by 1e-9° so the half-open
    * [west, east) box strictly contains the closed d2 ≤ r2 disk: padding
    * only ever ADDS candidates the exact residual rejects.
    *
    * At scale: points shuffle once on uniform cell keys, the site side
    * replicates ≤ ⌈w/cell+1⌉·⌈h/cell+1⌉ cells per site (a constant), and
    * the argmin window repartitions on the point key — no driver state, no
    * quadratic pair mass (candidates per point are bounded by site density
    * inside a fixed radius).
    *
    * @param points   (pointKey, ..., lng, lat)
    * @param sites    (siteKey, ..., siteLng, siteLat)
    * @param r2       squared radius in lat-degrees² — pass the SAME decimal
    *                 literal the oracle writes (both engines parse it to
    *                 the identical double)
    * @param lngScale longitude compression at the working latitude
    * @return one row per point with a site in range: point cols + site
    *         cols + `d2`, the nearest site winning
    */
  def nearestInRadius(points: DataFrame, sites: DataFrame,
      lng: String, lat: String, siteLng: String, siteLat: String,
      pointKey: String, siteKey: String,
      r2: Double, lngScale: Double, cellDeg: Double = 0.02): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    val latR = math.sqrt(r2) + 1e-9
    val lngR = math.sqrt(r2) / lngScale + 1e-9
    val boxes = sites
      .withColumn("_w", col(siteLng) - lngR)
      .withColumn("_e", col(siteLng) + lngR)
      .withColumn("_s", col(siteLat) - latR)
      .withColumn("_n", col(siteLat) + latR)

    val dlat = col(lat) - col(siteLat)
    val dlon = (col(lng) - col(siteLng)) * lngScale
    val w = Window.partitionBy(col(pointKey)).orderBy(col("d2"), col(siteKey))
    pointInBox(points, boxes, lng, lat, "_w", "_e", "_s", "_n", cellDeg)
      .drop("_w", "_e", "_s", "_n")
      .withColumn("d2", dlat * dlat + dlon * dlon)
      .filter(col("d2") <= r2)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }
}
