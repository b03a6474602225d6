package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SourcesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def writeFixture(): String = {
    val dir = Files.createTempDirectory("soda").toString
    val lines = Seq(
      // complete record with multi-value fields and a quote to strip
      """{"collision_id":"101","crash_date":"2024-01-05T00:00:00.000","crash_time":"14:30","latitude":"40.71","longitude":"-73.99","on_street_name":" O'BRIEN ST ","zip_code":"10002","number_of_motorist_killed":"0","number_of_motorist_injured":"1","number_of_cyclist_killed":"0","number_of_cyclist_injured":"0","number_of_pedestrians_killed":"0","number_of_pedestrians_injured":"2","number_of_persons_killed":"0","number_of_persons_injured":"3","contributing_factor_vehicle_1":"Driver Inattention, Unsafe Speed","vehicle_type_code1":"Sedan","vehicle_type_code2":"Bike"}""",
      // missing persons totals (main.py:252-255) and no coordinates
      """{"collision_id":"102","crash_date":"2024-01-06T00:00:00.000","crash_time":"9:05","number_of_motorist_killed":"1","number_of_motorist_injured":"0","number_of_cyclist_killed":"0","number_of_cyclist_injured":"1","number_of_pedestrians_killed":"0","number_of_pedestrians_injured":"0"}""",
      // malformed JSON → must land in _corrupt_record, not kill the job
      """{"collision_id":"103","crash_date": BROKEN""")
    Files.write(java.nio.file.Paths.get(dir, "batch.json"),
      lines.mkString("\n").getBytes)
    dir
  }

  test("SODA JSON source normalizes wire records like the reference") {
    val out = SodaJsonSource.read(spark, writeFixture()).orderBy("socrata_id").collect()
    assert(out.length == 2, "corrupt record must be excluded, good ones kept")

    val r1 = out(0)
    assert(r1.getAs[Long]("socrata_id") == 101L)
    assert(r1.getAs[java.sql.Timestamp]("date_val").toString.startsWith("2024-01-05 14:30"))
    assert(r1.getAs[String]("on_street_name") == "O'BRIEN ST")
    assert(r1.getAs[scala.collection.Seq[String]]("contributing_factor") .toSeq == Seq("Driver Inattention", "Unsafe Speed"))
    assert(r1.getAs[scala.collection.Seq[String]]("vehicle_type") .toSeq == Seq("Sedan", "Bike"))
    assert(r1.getAs[Long]("ti") == 3L)

    val r2 = out(1)
    assert(r2.isNullAt(r2.fieldIndex("latitude")))
    assert(r2.getAs[Long]("tk") == 1L, "persons_killed must be derived from parts when absent")
    assert(r2.getAs[Long]("ti") == 1L)
    assert(r2.getAs[Long]("year") == 2024L && r2.getAs[Long]("month") == 1L)
  }

  test("warehouse sink merges incrementally by partition and stays idempotent") {
    val path = Files.createTempDirectory("wh").toString + "/table"
    val base = Seq(
      (1L, "a", 2024L, 1L), (2L, "b", 2024L, 1L), (3L, "c", 2024L, 2L))
      .toDF("id", "v", "year", "month")
    WarehouseSink.writeSnapshot(base, path)
    assert(spark.read.parquet(path).count() == 3)

    // batch: new row in month 1, changed row 2, month 2 untouched
    val batch = Seq((2L, "b2", 2024L, 1L), (4L, "d", 2024L, 1L))
      .toDF("id", "v", "year", "month")
    WarehouseSink.merge(spark, batch, path, "id")
    val after = spark.read.parquet(path).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(after == Seq((1L, "a"), (2L, "b2"), (3L, "c"), (4L, "d")))

    // idempotence: same batch again converges to the same table
    WarehouseSink.merge(spark, batch, path, "id")
    val again = spark.read.parquet(path).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(again == after)
  }

  test("relocateKeys: a corrected date moves the row across partitions, no stale copy, emptied partition deleted") {
    val path = Files.createTempDirectory("wh").toString + "/relocate"
    // month 2 holds ONLY row 2 — the relocation empties it entirely
    val base = Seq((1L, "a", 2024L, 1L), (2L, "b", 2024L, 2L))
      .toDF("id", "v", "year", "month")
    WarehouseSink.writeSnapshot(base, path)
    // the reference's corrected-crash-date case: row 2 moves to month 1
    val corrected = Seq((2L, "b2", 2024L, 1L)).toDF("id", "v", "year", "month")
    WarehouseSink.merge(spark, corrected, path, "id", relocateKeys = true)
    val after = spark.read.parquet(path)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getAs[Number]("month").longValue())).toSet
    assert(after == Set((1L, "a", 1L), (2L, "b2", 1L)),
      s"moved row must exist exactly once in its NEW partition: $after")
    // the emptied month-2 partition directory must be physically gone —
    // a stale dir resurrects the old row on the next full read
    assert(!Files.exists(java.nio.file.Paths.get(path, "year=2024", "month=2")),
      "emptied partition must be deleted")

    // and the documented hazard is real: WITHOUT relocateKeys the old
    // partition keeps a stale duplicate of the moved key
    val path2 = Files.createTempDirectory("wh").toString + "/norelocate"
    WarehouseSink.writeSnapshot(base, path2)
    WarehouseSink.merge(spark, corrected, path2, "id")
    val dup = spark.read.parquet(path2).filter(col("id") === 2L).count()
    assert(dup == 2L, "the non-relocating merge leaves the stale copy (the documented trade)")
  }

  test("merge treats only a missing warehouse as first load; other read failures abort") {
    // first load: path does not exist → batch becomes the table
    val fresh = Files.createTempDirectory("wh").toString + "/new_table"
    val batch = Seq((1L, "a", 2024L, 1L)).toDF("id", "v", "year", "month")
    WarehouseSink.merge(spark, batch, fresh, "id")
    assert(spark.read.parquet(fresh).count() == 1)

    // unreadable warehouse (exists, not parquet): must THROW, not silently
    // treat as first load and drop existing data
    val corrupt = Files.createTempDirectory("wh").toString + "/corrupt"
    Files.createDirectory(java.nio.file.Paths.get(corrupt))
    Files.writeString(java.nio.file.Paths.get(corrupt, "part-00000.parquet"), "not parquet at all")
    intercept[Exception] { WarehouseSink.merge(spark, batch, corrupt, "id") }
    ()
  }

  test("merge does not leak partitionOverwriteMode onto the shared session") {
    val before = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    val path = Files.createTempDirectory("wh").toString + "/leak_check"
    val base = Seq((1L, "a", 2024L, 1L), (2L, "b", 2024L, 2L)).toDF("id", "v", "year", "month")
    WarehouseSink.writeSnapshot(base, path)
    WarehouseSink.merge(spark, Seq((3L, "c", 2024L, 1L)).toDF("id", "v", "year", "month"), path, "id")
    assert(spark.conf.get("spark.sql.sources.partitionOverwriteMode") == before)
    // and a subsequent full-snapshot overwrite still replaces ALL partitions
    WarehouseSink.writeSnapshot(base, path)
    assert(spark.read.parquet(path).count() == 2)
  }
}
