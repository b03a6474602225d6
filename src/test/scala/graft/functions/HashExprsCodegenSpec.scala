package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Pins the point of the HashRuntime refactor: every sketch expression
  * participates in whole-stage codegen. Run with
  * spark.sql.codegen.fallback=false so a janino compile error in the
  * generated static calls FAILS the test instead of silently reverting to
  * interpreted eval (the default fallback hides exactly the regression this
  * spec exists to catch). */
class HashExprsCodegenSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def withStrictCodegen[A](f: => A): A = {
    val key = "spark.sql.codegen.fallback"
    val before = spark.conf.get(key)
    spark.conf.set(key, "false")
    try f finally spark.conf.set(key, before)
  }

  test("all sketch expressions compile under strict codegen and stay in a WholeStageCodegen span") {
    HashExprs.register(spark)
    withStrictCodegen {
      val docs = Tables.documents(spark, sf).limit(50)
        .select(
          col("doc_id"),
          HashExprs.minhashSig(HashExprs.shingles3(col("text"))).as("sig"),
          HashExprs.simhash64(HashExprs.bigramsAll(col("text"))).as("sh"),
          HashExprs.repStats(col("text")).as("rs"),
          HashExprs.phash64(encode(col("text"), "UTF-8")).as("ph"),
          HashExprs.delNeighbors(substring(col("text"), 1, 6), 2).as("dn"),
          HashExprs.cdcChunks(col("text")).as("cdc"))
        .withColumn("m", HashExprs.sigMatchCount(col("sig"), col("sig")))
        .withColumn("j", HashExprs.jaccardSim(HashExprs.shingles3(lit("a b c d")),
          HashExprs.shingles3(lit("a b c e"))))
      val docRows = docs.collect()
      assert(docRows.length == 50)
      // self-match: all 64 signature slots equal
      assert(docRows.forall(_.getAs[Int]("m") == 64))
      // ≤2-deletion neighborhood of a 6-char string: at most 1 + 6 + 15
      // distinct variants, the original always first (insertion order)
      assert(docRows.forall { r =>
        val dn = r.getAs[scala.collection.Seq[String]]("dn")
        dn.nonEmpty && dn.size <= 22 && dn.head.length == 6
      })
      // chunks partition the text losslessly
      assert(docRows.forall(_.getAs[scala.collection.Seq[String]]("cdc").nonEmpty))

      val embDf = Tables.embeddings(spark, sf).limit(50)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
        .select(
          col("vec_id"),
          HashExprs.cosineSim(col("emb"), col("emb")).as("cs"),
          HashExprs.hyperplaneBands(col("emb")).as("hb"),
          HashExprs.topCells(col("emb"), array(col("emb")), 1).as("tc"),
          HashExprs.pqScore(array(lit(0L), lit(1L)),
            typedlit(Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)))).as("pq"),
          HashExprs.vecSub(col("emb"), col("emb")).as("vs"))
      val embRows = embDf.collect()
      assert(embRows.length == 50)
      // self-cosine 1.0; nearest of {self, -self} is self (index 0)
      assert(embRows.forall(r => math.abs(r.getAs[Double]("cs") - 1.0) < 1e-9))
      assert(embRows.forall(_.getAs[Seq[Long]]("tc") == Seq(0L)))
      // lut[0][0] + lut[1][1]
      assert(embRows.forall(_.getAs[Double]("pq") == 5.0))
      // v - v = exact zero vector
      assert(embRows.forall(_.getAs[Seq[Double]]("vs").forall(_ == 0.0)))

      // the sketch projection must sit INSIDE a codegen stage, not fall out
      for (df <- Seq(docs, embDf)) {
        val p = df.queryExecution.executedPlan.toString
        assert("""\*\(\d+\) Project""".r.findFirstIn(p).isDefined,
          s"sketch projection fell out of whole-stage codegen:\n$p")
      }
    }
  }
}
