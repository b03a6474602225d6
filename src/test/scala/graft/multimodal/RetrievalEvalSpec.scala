package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `mm_retrieval_eval` — the retrieval audit's contract: docs with
  * distinctive vocabularies retrieve their own media at rank 1, a
  * generic caption ranks poorly (the audit's reason to exist: it PRICES
  * the encoder), and the whole pool ranking replays first-principles in
  * the driver. */
class RetrievalEvalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  import spark.implicits._

  /** Independent replica of the stand-in encoder + cosine + ranking. */
  private def featVec(text: String): Map[Long, Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    text.toLowerCase.split("\\s+").filter(_.nonEmpty).foldLeft(Map.empty[Long, Long]) {
      (acc, t) =>
        val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(10)
        val h = java.lang.Long.parseLong(hex, 16)
        acc.updated(h % 64, acc.getOrElse(h % 64, 0L) + ((h / 64) % 2 * 2 - 1))
    }.filter(_._2 != 0L)
  }

  private def replay(texts: Map[Long, String]): Map[Long, (Long, Long)] = {
    // (true_rank, n_candidates) per qualifying query
    val cap = texts.view.mapValues(t => featVec(t.take(80))).toMap.filter(_._2.nonEmpty)
    val med = texts.view.mapValues(t => featVec(t.drop(80))).toMap.filter(_._2.nonEmpty)
    val qs = cap.keySet & med.keySet
    def score(a: Long, b: Long): Double = {
      val (ca, mb) = (cap(a), med(b))
      val dot = ca.keysIterator.map(d => ca(d) * mb.getOrElse(d, 0L)).sum
      val ssa = ca.values.map(w => w * w).sum
      val ssb = mb.values.map(w => w * w).sum
      BigDecimal(dot.toDouble / (math.sqrt(ssa.toDouble) * math.sqrt(ssb.toDouble)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    qs.map { q =>
      val ranked = med.keySet.toSeq.map(c => (c, score(q, c)))
        .sortBy { case (c, s) => (-s, c) }
      q -> ((ranked.indexWhere(_._1 == q) + 1).toLong, med.size.toLong)
    }.toMap
  }

  test("planted pool: distinctive captions retrieve their own media at rank 1; a generic caption ranks worse; exact replica match") {
    // three docs with disjoint vocabularies (caption predicts body) and
    // one whose caption words appear in EVERY body (the generic caption a
    // real crawl is full of) — the audit must separate them
    val shared = "the of and "
    val texts = Map(
      0L -> (("alpha beta gamma delta " * 5).take(80) + ("alpha beta gamma delta " * 8)),
      1L -> (("omega sigma lambda kappa " * 5).take(80) + ("omega sigma lambda kappa " * 8)),
      2L -> (("cobalt nickel copper zinc " * 5).take(80) + ("cobalt nickel copper zinc " * 8)),
      3L -> ((shared * 14).take(80) +
        "alpha omega cobalt beta sigma nickel " * 4)) // body never echoes the caption
    val docs = texts.toSeq.map { case (id, t) => (id, t, "en", s"src$id", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_reteval").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("mm_retrieval_eval")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(1), r.getBoolean(4))).toMap
    graft.CacheRegistry.releaseAll()
    val rep = replay(texts)
    out.foreach { case (id, (rank, nc, _)) =>
      assert((rank, nc) == rep(id), s"doc $id: engine ($rank,$nc) != replica ${rep(id)}")
    }
    (0L to 2L).foreach { id =>
      assert(out(id)._1 == 1L && out(id)._3, s"distinctive doc $id must self-retrieve at rank 1: ${out(id)}")
    }
    assert(out(3L)._1 > 1L, s"the generic caption must NOT rank first: ${out(3L)}")
  }

  test("corpus: one row per qualifying query, ranks in range, hit flags and rr consistent with the rank") {
    val rows = graft.SparkEntry.queries("mm_retrieval_eval")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nc, rank, rr) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(rank >= 1L && rank <= nc, s"rank out of range: $r")
      assert(rr == BigDecimal(1.0 / rank.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"rr mismatch: $r")
      assert(r.getBoolean(4) == (rank <= 1L) && r.getBoolean(5) == (rank <= 5L) &&
        r.getBoolean(6) == (rank <= 10L), s"hit flags: $r")
    }
    val ids = rows.map(_.getLong(0))
    assert(ids.distinct.length == ids.length, "one row per query")
  }
}
