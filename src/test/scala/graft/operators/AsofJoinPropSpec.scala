package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Generative `AsofJoin` check: on random keyed event/version streams —
  * with deliberate timestamp COLLISIONS on and across sides — the union +
  * single-window decomposition must equal the brute-force per-row argmax
  * (greatest right-time ≤ left-time; equal times match; ties among right
  * rows at the same instant resolve to the highest id). */
class AsofJoinPropSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  (1 to 3).foreach { seed =>
    test(s"random streams $seed: decomposition equals brute-force argmax") {
      val rnd = new scala.util.Random(4200 + seed)
      // coarse time grid => many exact collisions, the hard case
      val left = (0 until 300).map { i =>
        (i.toLong, rnd.nextInt(8).toLong, (rnd.nextInt(40) * 1000).toLong)
      }
      val right = (0 until 120).map { j =>
        (1000L + j, rnd.nextInt(8).toLong, (rnd.nextInt(40) * 1000).toLong, s"v$j")
      }
      val lDf = left.toDF("event_id", "k", "t")
      val rDf = right.toDF("r_id", "k", "rt", "payload")
      val got = AsofJoin.asofBackward(lDf, rDf, Seq("k"), "t", "rt", "r_id", Seq("payload"))
        .select("event_id", "r_id", "payload").collect()
        .map(r => r.getLong(0) -> (Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.getString(2)))).toMap
      left.foreach { case (id, k, t) =>
        val candidates = right.filter(rr => rr._2 == k && rr._3 <= t)
        val exp = if (candidates.isEmpty) (None, None)
        else {
          val best = candidates.maxBy(rr => (rr._3, rr._1)) // latest time, then highest id
          (Some(best._1), Some(best._4))
        }
        assert(got(id) == exp, s"seed $seed left $id (k=$k, t=$t): ${got(id)} vs $exp")
      }
    }
  }
}
