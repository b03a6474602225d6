package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** BPE tokenizer training (Sennrich et al., arXiv:1508.07909) in the shape
  * real trainers use at corpus scale: ONE distributed pass aggregates the
  * word-frequency dictionary (the only thing that touches the corpus), the
  * merge loop runs on that dictionary — vocabulary-sized, not corpus-sized
  * — and the learned merges go back as constant-folded expressions that
  * tokenize the corpus map-side. At 100 TB the dict is still just the
  * distinct-word table; nothing else ever shuffles.
  *
  * Merge semantics: symbols start as single characters; each round merges
  * the globally most frequent adjacent pair (count weighted by word
  * frequency; ties break on the lexicographically smallest pair), applied
  * left-to-right non-overlapping. BpeSpec replays the whole procedure
  * independently and checks the learned merges and tokenizations exactly.
  * Driver check is rows-only: the merges are data-dependent, so no static
  * SQL oracle can state them.
  */
object BpeTrain {

  val NumMerges = 10

  /** The distributed dictionary pass both training and tokenization share —
    * the only thing that touches the corpus. */
  def wordCounts(s: SparkSession, dir: String): Array[(String, Long)] =
    Tables.documents(s, dir)
      .select(explode(split(col("text"), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))

  /** The learned merge list, most-frequent first. */
  def trainMerges(s: SparkSession, dir: String): Seq[(String, String)] =
    learn(wordCounts(s, dir), NumMerges)

  /** Pure merge loop over the (word, count) dictionary. */
  def learn(wordCounts: Array[(String, Long)], rounds: Int): Seq[(String, String)] = {
    var dict = wordCounts.map { case (w, n) => (w.map(_.toString).toVector, n) }
    val merges = Vector.newBuilder[(String, String)]
    for (_ <- 0 until rounds) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      dict.foreach { case (syms, n) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => pairCounts((a, b)) = pairCounts.getOrElse((a, b), 0L) + n
          case _ =>
        }
      }
      if (pairCounts.nonEmpty) {
        val best = pairCounts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        dict = dict.map { case (syms, n) => (applyMerge(syms, best), n) }
      }
    }
    merges.result()
  }

  /** Left-to-right non-overlapping merge of one pair in a symbol sequence. */
  def applyMerge(syms: Vector[String], pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += (pair._1 + pair._2); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Per-word BPE token count under a merge list — exact applyMerge fold. */
  def tokensOf(word: String, merges: Seq[(String, String)]): Long =
    merges.foldLeft(word.map(_.toString).toVector)(applyMerge).length.toLong

  /** `text_bpe_vocab`: per-document token counts under the learned
    * tokenizer — character count, post-merge BPE count, compression.
    * The word→token-count table is computed on the driver from the same
    * dictionary the merges were learned on and shipped as a constant map,
    * so corpus tokenization is a zero-shuffle map-side pass (with a large
    * real-world vocab the same table rides a broadcast join instead). */
  def bpeVocab(s: SparkSession, dir: String): DataFrame = {
    val dict = wordCounts(s, dir)
    val merges = learn(dict, NumMerges)
    // typedLit handles the empty-corpus case (map() with zero args has no
    // usable type); element_at misses coalesce to 0 below
    val tokenMap =
      if (dict.isEmpty) typedLit(Map.empty[String, Long])
      else map(dict.flatMap { case (w, _) =>
        Seq(lit(w), lit(tokensOf(w, merges))) }.toSeq: _*)
    val ws = split(col("text"), "\\s+")
    Tables.documents(s, dir)
      .select(col("doc_id"), ws.as("w"))
      .select(col("doc_id"),
        aggregate(transform(col("w"), x => length(x).cast("long")), lit(0L), (acc, x) => acc + x)
          .as("n_char_tokens"),
        aggregate(transform(col("w"), x => coalesce(element_at(tokenMap, x), lit(0L))),
          lit(0L), (acc, x) => acc + x).as("n_bpe_tokens"))
      // greatest() guards the whitespace-only/empty-doc case (0 tokens):
      // compression degrades to 0.0 instead of a null that poisons the
      // driver's hash compare
      .withColumn("compression",
        round(col("n_char_tokens").cast("double") / greatest(col("n_bpe_tokens"), lit(1L)), 4))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bpe_vocab" -> (bpeVocab _))
}
