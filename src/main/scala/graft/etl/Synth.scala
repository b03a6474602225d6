package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Synthetic crash-domain derivations over the `events` table (SURVEY.md §3).
  *
  * The reference's fact stream (SODA collisions) carries coordinates, injury
  * tallies, and a warehouse copy that lags/differs from the source. The
  * driver's testdata has none of those, so they are derived *in-query* with
  * pure integer/double arithmetic from `event_id` — identically on the Spark
  * side (Columns here) and the DuckDB oracle side (SQL fragments here). Only
  * IEEE-deterministic ops are used (no trig in derivations) so both engines
  * produce bit-identical values.
  *
  * Conventions:
  *  - "carto" = the warehouse snapshot: rows with event_id % 10 == 3 are
  *    missing (late arrivals); 1-in-19 rows are ungeocoded (NULL geom);
  *    1-in-97 are null-island (0,0); 1-in-101 are badly geocoded (+10 lng).
  *  - "soda" = the refreshed source: tallies bumped on % 13 / % 29 rows,
  *    positions moved on % 17 (~111 m) and % 23 (~5.5 m) rows, and half the
  *    ungeocoded rows (% 19 and even) now carry coordinates.
  */
object Synth {

  // ---------- coordinates ----------
  def baseLng(id: Column): Column =
    lit(-74.25) + ((id * lit(2654435761L)) % lit(100000L)) / lit(100000.0) * lit(0.5)
  def baseLat(id: Column): Column =
    lit(40.50) + (((id + lit(7L)) * lit(2246822519L)) % lit(100000L)) / lit(100000.0) * lit(0.4)

  def baseLngSql(id: String): String =
    s"(-74.25 + (($id * 2654435761) % 100000) / 100000.0 * 0.5)"
  def baseLatSql(id: String): String =
    s"(40.50 + ((($id + 7) * 2246822519) % 100000) / 100000.0 * 0.4)"

  /** Warehouse-side longitude: NULL / null-island / bad-geocode variants. */
  def cartoLng(id: Column): Column =
    when(id % 19 === 0, lit(null).cast("double"))
      .when(id % 97 === 0, lit(0.0))
      .when(id % 101 === 0, baseLng(id) + lit(10.0))
      .otherwise(baseLng(id))
  def cartoLat(id: Column): Column =
    when(id % 19 === 0, lit(null).cast("double"))
      .when(id % 97 === 0, lit(0.0))
      .otherwise(baseLat(id))

  def cartoLngSql(id: String): String =
    s"(CASE WHEN $id % 19 = 0 THEN NULL WHEN $id % 97 = 0 THEN 0.0 " +
      s"WHEN $id % 101 = 0 THEN ${baseLngSql(id)} + 10.0 ELSE ${baseLngSql(id)} END)"
  def cartoLatSql(id: String): String =
    s"(CASE WHEN $id % 19 = 0 THEN NULL WHEN $id % 97 = 0 THEN 0.0 ELSE ${baseLatSql(id)} END)"

  /** Source-side coordinates after the upstream's retroactive fixes. */
  def sodaLng(id: Column): Column =
    when(id % 19 === 0 && id % 2 === 1, lit(null).cast("double")).otherwise(baseLng(id))
  def sodaLat(id: Column): Column =
    when(id % 19 === 0 && id % 2 === 1, lit(null).cast("double"))
      .when(id % 17 === 0, baseLat(id) + lit(0.001))
      .when(id % 23 === 0, baseLat(id) + lit(0.00005))
      .otherwise(baseLat(id))

  def sodaLngSql(id: String): String =
    s"(CASE WHEN $id % 19 = 0 AND $id % 2 = 1 THEN NULL ELSE ${baseLngSql(id)} END)"
  def sodaLatSql(id: String): String =
    s"(CASE WHEN $id % 19 = 0 AND $id % 2 = 1 THEN NULL " +
      s"WHEN $id % 17 = 0 THEN ${baseLatSql(id)} + 0.001 " +
      s"WHEN $id % 23 = 0 THEN ${baseLatSql(id)} + 0.00005 " +
      s"ELSE ${baseLatSql(id)} END)"

  // ---------- injury/fatality tallies (8 counters, as in main.py:857-863) ----------
  def mk(id: Column): Column = id % 3
  def mi(id: Column): Column = (id + lit(1L)) % 4
  def ck(id: Column): Column = (id + lit(2L)) % 2
  def ci(id: Column): Column = (id + lit(3L)) % 5
  def pk(id: Column): Column = (id + lit(4L)) % 2
  def pi(id: Column): Column = (id + lit(5L)) % 4
  def tk(id: Column): Column = mk(id) + ck(id) + pk(id)
  def ti(id: Column): Column = mi(id) + ci(id) + pi(id)

  def mkSql(id: String) = s"($id % 3)"
  def miSql(id: String) = s"(($id + 1) % 4)"
  def ckSql(id: String) = s"(($id + 2) % 2)"
  def ciSql(id: String) = s"(($id + 3) % 5)"
  def pkSql(id: String) = s"(($id + 4) % 2)"
  def piSql(id: String) = s"(($id + 5) % 4)"
  def tkSql(id: String) = s"(${mkSql(id)} + ${ckSql(id)} + ${pkSql(id)})"
  def tiSql(id: String) = s"(${miSql(id)} + ${ciSql(id)} + ${piSql(id)})"

  /** Source-side (refreshed) tallies: injuries later reported / made fatal. */
  def sodaMi(id: Column): Column = mi(id) + when(id % 13 === 0, lit(1L)).otherwise(lit(0L))
  def sodaPk(id: Column): Column = pk(id) + when(id % 29 === 0, lit(1L)).otherwise(lit(0L))
  def sodaTk(id: Column): Column = mk(id) + ck(id) + sodaPk(id)
  def sodaTi(id: Column): Column = sodaMi(id) + ci(id) + pi(id)

  def sodaMiSql(id: String) = s"(${miSql(id)} + (CASE WHEN $id % 13 = 0 THEN 1 ELSE 0 END))"
  def sodaPkSql(id: String) = s"(${pkSql(id)} + (CASE WHEN $id % 29 = 0 THEN 1 ELSE 0 END))"
  def sodaTkSql(id: String) = s"(${mkSql(id)} + ${ckSql(id)} + ${sodaPkSql(id)})"
  def sodaTiSql(id: String) = s"(${sodaMiSql(id)} + ${ciSql(id)} + ${piSql(id)})"

  /** Warehouse membership: rows that have already been loaded. */
  def inCarto(id: Column): Column = id % 10 =!= 3
  def inCartoSql(id: String) = s"($id % 10 != 3)"

  // ---------- free-form vehicle_type[] (main.py:135-163 parses it from the
  // feed; here derived from event_id so both engines reproduce it). Three
  // slots cycling through the crosswalk's alias vocabulary plus junk values
  // ("tractor", "golfcart") the crosswalk doesn't know — the feed constantly
  // invents variants, which is what the audit (#14b) is for. Empty slots
  // drop out; some rows end up with no mapped vehicle at all, which is the
  // hasvehicle_other_unspecified catch-all case (main.py:656-668). ----------
  private val V1 = Seq("sedan", "suv", "bike", "box truck", "scooter", "taxi", "van", "")
  private val V2 = Seq("bicycle", "suv", "", "bus", "unknown", "", "moped")
  private val V3 = Seq("motorcycle", "e-scooter", "truck", "tractor", "golfcart",
    "", "", "", "", "", "")

  private[etl] def pick(id: Column, vocab: Seq[String]): Column =
    vocab.zipWithIndex.tail.foldLeft(when(id % vocab.size === 0, lit(vocab.head))) {
      case (acc, (v, i)) => acc.when(id % vocab.size === i, lit(v))
    }
  private[etl] def pickSql(id: String, vocab: Seq[String]): String =
    vocab.zipWithIndex.map { case (v, i) => s"WHEN $id % ${vocab.size} = $i THEN '$v'" }
      .mkString("(CASE ", " ", " END)")

  def vehicleArr(id: Column): Column =
    filter(array(pick(id, V1), pick(id, V2), pick(id, V3)), x => x =!= "")
  def vehicleArrSql(id: String): String =
    s"list_filter([${pickSql(id, V1)}, ${pickSql(id, V2)}, ${pickSql(id, V3)}], x -> x != '')"

  // ---------- NYC-like extent (union of the 5 zone boxes) ----------
  val ExtentWest = -74.25
  val ExtentEast = -73.75
  val ExtentSouth = 40.50
  val ExtentNorth = 40.90

  def inExtent(lng: Column, lat: Column): Column =
    lng >= ExtentWest && lng < ExtentEast && lat >= ExtentSouth && lat < ExtentNorth
  def inExtentSql(lng: String, lat: String): String =
    s"($lng >= -74.25 AND $lng < -73.75 AND $lat >= 40.5 AND $lat < 40.9)"
}
