package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class AsofJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("as-of join equals the brute-force inequality-join + argmax") {
    val ev = Tables.events(spark, TestSpark.sf).select(col("event_id"), col("user_id"), col("ts"))
    val sign = Tables.events(spark, TestSpark.sf)
      .filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("s_ts"), col("event_id").as("signup_id"))

    val fast = AsofJoin.asofBackward(ev, sign, Seq("user_id"), "ts", "s_ts", "signup_id")
      .select("event_id", "signup_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    // brute force: inequality join, keep max (s_ts, signup_id) per event
    val w = Window.partitionBy(col("event_id"))
      .orderBy(col("s_ts").desc, col("signup_id").desc)
    val brute = ev.join(sign, Seq("user_id"))
      .filter(col("s_ts") <= col("ts"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select("event_id", "signup_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    val evCount = ev.count()
    assert(fast.size == evCount, "as-of must preserve every left row")
    brute.foreach { case (eid, sid) =>
      assert(fast(eid) == sid, s"event $eid: asof=${fast(eid)} brute=$sid")
    }
    // left rows with no preceding signup are null in fast, absent in brute
    assert(fast.count(_._2 == -1L) == evCount - brute.size)
  }

  test("as-of carries extra payload columns and matches equal timestamps") {
    val left = Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("k", "t")
    val right = Seq((1L, 10L, 100L, "a"), (1L, 15L, 101L, "b"), (2L, 6L, 102L, "c"))
      .toDF("k", "rt", "rid", "payload")
    val got = AsofJoin.asofBackward(left, right, Seq("k"), "t", "rt", "rid", Seq("payload"))
      .orderBy("k", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), Option(r.getString(3)).getOrElse("-")))
    assert(got.toSeq == Seq(
      (1L, 10L, 100L, "a"),   // equal timestamp matches
      (1L, 20L, 101L, "b"),   // most recent prior wins
      (2L, 5L, -1L, "-")))    // nothing precedes → null
  }

  test("a NULL field in the matched right row stays NULL (no stale-column stitching)") {
    val left = Seq((1L, 3L)).toDF("k", "t")
    val right = Seq(
      (1L, 1L, 100L, Option("x")),
      (1L, 2L, 101L, Option.empty[String])) // the as-of match, with a NULL payload
      .toDF("k", "rt", "rid", "payload")
    val got = AsofJoin.asofBackward(left, right, Seq("k"), "t", "rt", "rid", Seq("payload"))
      .collect()
    assert(got.length == 1)
    assert(got.head.getLong(2) == 101L, "match must be the latest right row")
    assert(got.head.isNullAt(3),
      "payload must come from the matched row (NULL), not leak from an older row")
  }

  test("as-of plans as a single window pass, not a range join") {
    val ev = Tables.events(spark, TestSpark.sf).select(col("event_id"), col("user_id"), col("ts"))
    val sign = Tables.events(spark, TestSpark.sf)
      .filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("s_ts"), col("event_id").as("signup_id"))
    val p = AsofJoin.asofBackward(ev, sign, Seq("user_id"), "ts", "s_ts", "signup_id")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"no join operator of any kind expected:\n$p")
    assert(p.contains("Window"), "the as-of carry must be a window")
    // exactly one hash exchange: the partition-by-key shuffle
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, p)
  }
}
