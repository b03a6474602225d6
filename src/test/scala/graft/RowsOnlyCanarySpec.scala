package graft

import org.scalatest.funsuite.AnyFunSuite

/** Frozen-digest canaries for every rows-only operator whose replay spec
  * had NO cross-run output pin (`stats_approx`, `stream_neardup`,
  * `emb_pca`, and the tokenizer-trainer family `text_bpe_vocab` /
  * `text_bpe_apply` / `text_unigram_vocab` / `text_unigram_apply`) —
  * closing the trust asymmetry with the `dedup_cdc_chunks` /
  * `mm_phash_neardup` house standard (`FrozenDigestSpec`): the COMPLETE
  * output on the frozen [[FrozenFixtures]] tables is pinned as (row count,
  * md5 over every canonically-rendered row, sorted). A replay spec changes
  * in lockstep with the implementation; this canary does not — any
  * estimator, merge-order, banding, eigen-iteration, or merge-table
  * regression that alters ONE value in ONE row turns it red.
  *
  * The digest covers every column of every row (nulls rendered as "∅"),
  * so "complete expected output" holds without 40×9 literal tables; one
  * human-readable anchor row per operator keeps failures diagnosable. */
class RowsOnlyCanarySpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def snapshot(q: String): (Int, String, Seq[String]) = {
    val rows = SparkEntry.queries(q)(spark, FrozenFixtures.dir(spark)).collect()
    CacheRegistry.releaseAll()
    val rendered = rows.map(_.toSeq.map(v => if (v == null) "∅" else v.toString)
      .mkString("|")).toSeq.sorted
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(rendered.mkString("\n").getBytes("UTF-8")).map("%02x".format(_)).mkString
    (rows.length, md5, rendered)
  }

  /** query -> (frozen row count, frozen complete-output md5, one frozen
    * anchor row). Captured from the shipped implementations on the frozen
    * fixture; re-capture deliberately when semantics change. */
  private val frozen = Seq(
    ("stats_approx", 4, "6d5bc5f94b766c1452ef6fe205e1fd7c",
      "click|12|12|124.0|124.0|237.0|235.60000000000002|75"),
    ("stream_neardup", 10, "23e3bfb0019cc756f34b7a10cf2dda76",
      "1|0|0.9375"),
    ("emb_pca", 40, "5e54874a114d5073b631ecf481bf2442",
      "0|-1.758947|0.198174|0.789135|0.56005|-0.363558|-0.572096|0.409117|0.237641"),
    ("text_bpe_vocab", 20, "896b58f9a1703c9fde8be898bde594cb",
      "0|445|231|1.9264"),
    ("text_unigram_vocab", 120, "e987402a02859e39efe11a820a61123c",
      "100|E|-6293881|4"),
    ("text_unigram_apply", 20, "54d9a6fbdc94ec03fcdffb0b91f47384",
      "0|205|46|82|1|6|10|12|3|5|50|8|1|52|1|98|13|49|2|7|1|76|14|1|7|2|4|1|2|77|51|82|3|1|11|2|47|12|16|2|70|18|48|71|1|95|78|12|76|57|18|96|72|1|93|73|1|97|74|12|10|9|18|4|10|3|1|48|94|18|9|10|17|46|10|6|1|6|10|11|12|3|10|13|50|10|7|1|16|10|14|1|4|10|4|49|5|9|1|9|5|3|1|7|5|16|1|5|17|51|5|6|1|11|5|11|12|16|5|13|99|5|7|1|17|5|14|12|9|5|4|18|6|8|9|1|3|8|3|1|14|8|16|12|8|17|18|4|8|6|1|13|8|11|18|9|8|13|46|8|7|1|6|8|14|12|3|8|4|50|19|9|1|52|3|1|4|19|16|49|19|17|1|9|19|6|1|7|19|11|1|19|13|51|19|7|1|11|19|14|12|52|4|18|48|13|9"),
    ("text_bpe_apply", 20, "5e5390303fafd4397ed331bab2118b35",
      "10|160|43|29|44|25|28|25|21|24|25|42|33|21|51|29|27|21|44|29|39|33|44|25|42|32|43|40|42|29|51|21|23|54|23|39|33|44|21|23|44|21|22|39|49|44|23|21|42|25|25|42|43|40|42|25|43|43|22|39|24|54|1|0|52|3|6|50|52|5|3|49|2|52|7|0|49|3|52|8|7|49|4|52|7|49|5|52|2|4|49|6|52|4|1|49|7|52|5|8|49|8|52|7|5|49|9|52|9|2|50|0|52|1|2|50|1|52|2|9|50|2|52|4|6|50|3|52|6|3|50|4|52|8|0|50|5|52|0|50|6|52|1|7|50|7|52|3|4|50|8|52|5|1|50|9|52|6|8|49|2|0"))

  frozen.foreach { case (q, expCount, expMd5, anchor) =>
    test(s"$q output on the frozen fixture matches the checked-in digest exactly") {
      val (count, md5, rendered) = snapshot(q)
      assert(count == expCount, s"$q row count drifted: $count != $expCount")
      assert(rendered.contains(anchor),
        s"$q anchor row vanished — first rows now: ${rendered.take(2)}")
      assert(md5 == expMd5,
        s"$q complete-output digest drifted ($md5 != $expMd5); if the change " +
          "is a DELIBERATE semantic update, re-capture the frozen values")
    }
  }
}
