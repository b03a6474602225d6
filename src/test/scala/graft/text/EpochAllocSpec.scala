package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `sample_epoch_alloc` — hand-computed allocation on a planted 3-domain
  * corpus (full epochs, the straddling fractional epoch, the starved
  * round) plus corpus-wide budget-conservation pins. */
class EpochAllocSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  import spark.implicits._

  test("planted domains: epoch rounds fill in order, the budget cut lands as a fractional epoch, values decay in eighths") {
    // A=10, B=25, C=30 tokens; total 65, budget = 65*5 div 2 = 162.
    // Rounds 1+2 fill everything (cum 130); round 3: A takes 10 (140),
    // B takes 22 of 25 (the straddler), C takes 0; round 4 starved.
    def doc(id: Long, src: String, n: Int) = (id, Seq.fill(n)("w").mkString(" "), "en", src, 0L)
    val docs = Seq(doc(0, "a", 10), doc(1, "b", 25), doc(2, "c", 30))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_epoch").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("sample_epoch_alloc")(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    graft.CacheRegistry.releaseAll()
    assert(out("a") == ((10L, 30L, 3L, 3.0, 17.5)), s"a: ${out("a")}")
    assert(out("b") == ((25L, 72L, 2L, 2.88, 43.0)), s"b: ${out("b")}")
    assert(out("c") == ((30L, 60L, 2L, 2.0, 45.0)), s"c: ${out("c")}")
    // conservation: every budgeted token is allocated, none invented
    assert(out.values.map(_._2).sum == 65L * 5L / 2L)
  }

  test("corpus: the budget is exactly conserved and epochs stay within [0, MaxEpochs]") {
    val rows = graft.SparkEntry.queries("sample_epoch_alloc")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val total = rows.map(_._2).sum
    val budget = total * EpochAlloc.BudgetNum / EpochAlloc.BudgetDen
    assert(rows.map(_._3).sum == budget,
      s"allocated ${rows.map(_._3).sum} != budget $budget — greedy must spend exactly the budget")
    rows.foreach { case (src, tok, alloc, full, epochs) =>
      assert(full >= 0L && full <= EpochAlloc.MaxEpochs, s"$src full epochs")
      assert(epochs >= 0.0 && epochs <= EpochAlloc.MaxEpochs, s"$src epochs")
      assert(alloc <= tok * EpochAlloc.MaxEpochs, s"$src cannot exceed MaxEpochs passes")
    }
    // round-order fill: full-epoch counts are non-increasing in source order
    val fulls = rows.sortBy(_._1).map(_._4)
    assert(fulls.zip(fulls.tail).forall { case (a, b) => a >= b },
      s"earlier domains fill first: ${fulls.mkString(",")}")
  }
}
