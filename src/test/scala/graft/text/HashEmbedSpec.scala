package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `text_hash_embed`: driver-side replay of the signed-hash weights, unit
  * L2 norm per document, and content-stable reproducibility. */
class HashEmbedSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("weights equal a driver-side replay and norms are unit") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = HashEmbed.hashEmbed(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = docs.flatMap { case (id, text) =>
      val ws = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .map { t =>
          val h = java.lang.Long.parseLong(md5hex(t).take(10), 16)
          (h % HashEmbed.Dims, (h / HashEmbed.Dims) % 2 * 2 - 1)
        }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).filter(_._2 != 0L).toMap
      val ss = ws.values.map(w => w * w).sum
      ws.map { case (dim, w) =>
        (id, dim) -> (w, BigDecimal(w.toDouble / math.sqrt(ss.toDouble))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    assert(got == expected)
    // per-doc L2 of the UNROUNDED weights is 1 by construction; the rounded
    // output must land within rounding distance of unit
    got.keys.toSeq.groupBy(_._1).foreach { case (id, ks) =>
      val n2 = ks.map(k => got(k)._2 * got(k)._2).sum
      assert(math.abs(n2 - 1.0) < 0.01, s"doc $id norm² = $n2")
    }
  }

  test("vectors are content-stable across runs") {
    val a = HashEmbed.hashEmbed(spark, sf).collect().map(_.toString).sorted
    val b = HashEmbed.hashEmbed(spark, sf).collect().map(_.toString).sorted
    assert(a.toSeq == b.toSeq)
  }
}
