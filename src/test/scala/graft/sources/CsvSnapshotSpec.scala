package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CsvSnapshotSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def write(dir: String, name: String, rows: Seq[String]): String = {
    val p = Paths.get(dir, name)
    Files.write(p, ("socrata_id,date_val,longitude,latitude\n" + rows.mkString("\n")).getBytes)
    p.toString
  }

  test("CSV snapshots read with explicit schema and geom diffs match the reference rules") {
    val dir = Files.createTempDirectory("csv").toString
    val oldCsv = write(dir, "old.csv", Seq(
      "1,2024-01-01 10:00:00,-73.99,40.71",      // will move ~111 m
      "2,2024-01-02 11:00:00,-73.98,40.72",      // moves ~5 m → below threshold
      "3,2024-01-03 12:00:00,,",                  // null geom, geocoded later
      "4,2024-01-04 13:00:00,-73.95,40.75",      // unchanged
      "garbage,not-a-date,x,y"))                  // corrupt → dropped
    val newCsv = write(dir, "new.csv", Seq(
      "1,2024-01-01 10:00:00,-73.99,40.711",
      "2,2024-01-02 11:00:00,-73.98,40.720045",
      "3,2024-01-03 12:00:00,-73.97,40.73",
      "4,2024-01-04 13:00:00,-73.95,40.75"))

    val o = CsvSnapshotSource.read(spark, oldCsv)
    assert(o.count() == 4, "corrupt row must be dropped, null-geom row kept")

    val diffs = CsvSnapshotSource.geomDiffs(o, CsvSnapshotSource.read(spark, newCsv))
      .collect().map(r => (r.getLong(0), r.getString(3))).toMap
    assert(diffs == Map(1L -> "moved", 3L -> "geocoded"),
      s"got $diffs — sub-threshold moves and unchanged rows must be excluded")
  }
}
