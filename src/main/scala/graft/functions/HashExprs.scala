package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom hash/sketch expressions.
  *
  * Spark's higher-order functions (transform/aggregate) are interpreted
  * (CodegenFallback) — a MinHash signature written as nested lambdas costs
  * hundreds of interpreted expression evals per element, and Catalyst
  * re-inlines the whole tree into every consumer projection (e.g. one copy
  * per LSH band). These expressions instead compute the complete sketch in
  * one JVM call per row: one pass to base-hash the tokens, then tight
  * primitive loops. Benchmarked ~1000× faster than the lambda formulation
  * at sf0.1 (1384 s → ~1 s for the MinHash stage).
  *
  * Every expression generates a static call into `HashRuntime` (the
  * HaversineMeters pattern), so interpreted and generated paths share ONE
  * definition and the expressions sit INSIDE whole-stage codegen — no
  * CodegenFallback boxing in projections, filters, or join conditions. */
object HashExprs {

  /** FNV-1a 64-bit over UTF-8 bytes — cheap, deterministic, dependency-free.
    * Used where the hash never needs a cross-engine twin (CDC rolling hash);
    * sketches that ARE oracle-checked use [[md5u64]] instead. */
  def fnv64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    h
  }

  private val md5Tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 bytes of md5 over UTF-8 bytes, big-endian, as the raw 64-bit
    * pattern (unsigned semantics — callers use `remainderUnsigned`, never
    * signed division). This is the repo's CROSS-ENGINE token hash: the
    * DuckDB twin is `('0x' || substr(md5(s), 1, 16))::UBIGINT`, which is why
    * the MinHash/SimHash sketches build on it rather than on [[fnv64]] —
    * the oracle can replay every signature bit in SQL. ~10× slower per call
    * than FNV, but the sketch cost at scale is dominated by the shingle
    * split and the band shuffle, not the digest. */
  def md5u64(bytes: Array[Byte]): Long = {
    val md = md5Tl.get()
    md.reset()
    val d = md.digest(bytes)
    ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
  }

  /** First 10 hex digits (top 5 bytes) of md5 as a non-negative long — the
    * 40-bit cross-engine hash behind the hashed-bigram feature space
    * (`text_hash_embed` / `text_quality_classifier` convention): the Spark
    * Column twin is `conv(substring(md5(t), 1, 10), 16, 10)::bigint`, the
    * DuckDB twin `('0x' || substr(md5(t), 1, 10))::BIGINT`. */
  def md5u40(bytes: Array[Byte]): Long = {
    val md = md5Tl.get()
    md.reset()
    val d = md.digest(bytes)
    ((d(0) & 0xffL) << 32) | ((d(1) & 0xffL) << 24) | ((d(2) & 0xffL) << 16) |
      ((d(3) & 0xffL) << 8) | (d(4) & 0xffL)
  }

  val MinHashP = 2147483647L // 2^31 - 1

  /** splitmix64 finalizer — deterministic pseudo-random bits from an index,
    * identical on every executor with no broadcast state. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def register(spark: SparkSession): Unit = synchronized {
    val r = spark.sessionState.functionRegistry
    r.createOrReplaceTempFunction("minhash_sig",
      exprs => MinHashSignature(exprs.head), "built-in")
    r.createOrReplaceTempFunction("simhash64",
      exprs => SimHash64(exprs.head), "built-in")
    r.createOrReplaceTempFunction("shingles3",
      exprs => Shingles(exprs.head, 3), "built-in")
    r.createOrReplaceTempFunction("bigrams_all",
      exprs => Shingles(exprs.head, 2, distinct = false), "built-in")
    r.createOrReplaceTempFunction("cosine_sim",
      exprs => CosineSim(exprs(0), exprs(1)), "built-in")
    r.createOrReplaceTempFunction("jaccard_sim",
      exprs => JaccardSim(exprs(0), exprs(1)), "built-in")
    r.createOrReplaceTempFunction("hyperplane_bands",
      exprs => HyperplaneBands(exprs.head), "built-in")
    r.createOrReplaceTempFunction("top_cells", buildTopCells, "built-in")
    r.createOrReplaceTempFunction("rep_stats",
      exprs => RepStats(exprs.head), "built-in")
    r.createOrReplaceTempFunction("sig_match_count",
      exprs => SigMatchCount(exprs(0), exprs(1)), "built-in")
    r.createOrReplaceTempFunction("phash64",
      exprs => PHash64(exprs.head), "built-in")
    r.createOrReplaceTempFunction("pq_score",
      exprs => PqScore(exprs(0), exprs(1)), "built-in")
    r.createOrReplaceTempFunction("vec_sub",
      exprs => VecSub(exprs(0), exprs(1)), "built-in")
    r.createOrReplaceTempFunction("del_neighbors", buildDelNeighbors, "built-in")
    r.createOrReplaceTempFunction("cdc_chunks",
      exprs => CdcChunks(exprs.head), "built-in")
    r.createOrReplaceTempFunction("quality_margin", buildQualityMargin, "built-in")
  }

  /** Builder requiring the trained weights as a literal array (the model is
    * a plan-time constant — the "broadcast 67 longs" deployment shape). */
  val buildQualityMargin: Seq[Expression] => Expression = { exprs =>
    val w = exprs(1) match {
      case e if e.foldable => e.eval(null) match {
        case a: ArrayData => a.toLongArray()
        case other => throw new IllegalArgumentException(
          s"quality_margin weights must be an array<bigint> literal, got $other")
      }
      case _ => throw new IllegalArgumentException(
        "quality_margin weights must be a literal")
    }
    QualityMargin(exprs.head, w.toIndexedSeq)
  }

  /** Builder requiring a literal maxDel (the neighborhood depth is a
    * plan-time constant baked into the generated code). */
  val buildDelNeighbors: Seq[Expression] => Expression = { exprs =>
    val d = exprs(1) match {
      case e if e.foldable => e.eval(null) match {
        case i: java.lang.Integer => i.intValue
        case l: java.lang.Long => l.intValue
        case other => throw new IllegalArgumentException(
          s"del_neighbors maxDel must be an integer literal, got $other")
      }
      case _ => throw new IllegalArgumentException("del_neighbors maxDel must be a literal")
    }
    DelNeighbors(exprs.head, d)
  }

  /** Builder with numeric coercion (SQL decimal literals → double arrays). */
  val buildTopCells: Seq[Expression] => Expression = { exprs =>
    import org.apache.spark.sql.catalyst.expressions.Cast
    val embT = ArrayType(DoubleType, containsNull = false)
    def arr(e: Expression) = e.dataType match {
      case ArrayType(DoubleType, _) => e
      case _ => Cast(e, embT)
    }
    val cents = exprs(1).dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => exprs(1)
      case _ => Cast(exprs(1), ArrayType(embT, containsNull = false))
    }
    val k = exprs(2) match {
      case e if e.foldable => e.eval(null) match {
        case i: java.lang.Integer => i.intValue
        case l: java.lang.Long => l.intValue
        case s: java.lang.Short => s.intValue
        case b: java.lang.Byte => b.intValue
        case other => throw new IllegalArgumentException(
          s"top_cells k must be an integer literal, got $other")
      }
      case _ => throw new IllegalArgumentException("top_cells k must be a literal")
    }
    TopCells(arr(exprs(0)), cents, k)
  }

  def qualityMargin(text: Column, w: Array[Long]): Column =
    call_function("quality_margin", text, lit(w))
  def minhashSig(c: Column): Column = call_function("minhash_sig", c)
  def simhash64(c: Column): Column = call_function("simhash64", c)
  def shingles3(c: Column): Column = call_function("shingles3", c)
  def bigramsAll(c: Column): Column = call_function("bigrams_all", c)
  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)
  def jaccardSim(a: Column, b: Column): Column = call_function("jaccard_sim", a, b)
  def hyperplaneBands(c: Column): Column = call_function("hyperplane_bands", c)
  def topCells(emb: Column, cents: Column, k: Int): Column =
    call_function("top_cells", emb, cents, org.apache.spark.sql.functions.lit(k))
  def repStats(c: Column): Column = call_function("rep_stats", c)
  def sigMatchCount(a: Column, b: Column): Column = call_function("sig_match_count", a, b)
  def phash64(c: Column): Column = call_function("phash64", c)
  def pqScore(codes: Column, lut: Column): Column = call_function("pq_score", codes, lut)
  def vecSub(a: Column, b: Column): Column = call_function("vec_sub", a, b)
  def delNeighbors(c: Column, maxDel: Int): Column =
    call_function("del_neighbors", c, org.apache.spark.sql.functions.lit(maxDel))
  def cdcChunks(c: Column): Column = call_function("cdc_chunks", c)

  /** DuckDB literal for the 16×64 hyperplane sign matrix, generated from the
    * SAME mix64 stream the compiled HyperplaneBands expression reads — the
    * planes are fixed deterministic parameters of the operator (like a
    * stop-word list), so embedding them as literals keeps the oracle an
    * independent replay of everything data-dependent: the dot products, the
    * sign bits, the banding, and the candidate join. */
  lazy val hyperplaneSignsSql: String =
    (0 until 16).map { p =>
      (0 until 64).map { d =>
        if ((mix64(p.toLong * 1000003L + d) & 1L) == 0L) "1.0" else "-1.0"
      }.mkString("[", ",", "]")
    }.mkString("[", ",", "]") + "::DOUBLE[][]"

  /** DuckDB CTE chain `e → mm → pb → bd`: every embeddings row's
    * (band, bkey) hyperplane-LSH index, replaying HyperplaneBands bit for
    * bit (list_dot_product sums in the same sequential order as the
    * compiled loop, and the band key packs the 4 sign bits MSB-first). */
  lazy val hyperplaneChainSql: String =
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
       |mm AS (SELECT $hyperplaneSignsSql AS m),
       |pb AS (SELECT vec_id, p,
       |  CASE WHEN list_dot_product(emb, m[p+1]) >= 0 THEN 1::BIGINT ELSE 0::BIGINT END AS bit
       | FROM e CROSS JOIN (SELECT unnest(range(0,16)) AS p) ps CROSS JOIN mm),
       |bd AS (SELECT vec_id, (p // 4)::BIGINT AS band,
       |  sum(bit * (1 << (3 - (p % 4))))::BIGINT AS bkey
       | FROM pb GROUP BY vec_id, p // 4)""".stripMargin
}

/** The one implementation of every sketch, called by BOTH the interpreted
  * eval and the generated code (standalone object → static forwarders, so
  * janino-compiled code reaches these directly). */
object HashRuntime {

  /** See RepStats. */
  def repStats(input: UTF8String): InternalRow = {
    val words = input.toString.split("\\s+", -1)
    val wc = new java.util.HashMap[String, Long](words.length * 2)
    var i = 0
    while (i < words.length) {
      wc.merge(words(i), 1L, (a, b) => a + b)
      i += 1
    }
    var topWord = 0L
    val wIt = wc.values().iterator()
    while (wIt.hasNext) { val v = wIt.next(); if (v > topWord) topWord = v }
    val nBigrams = math.max(0, words.length - 1)
    val bc = new java.util.HashMap[String, Long](nBigrams * 2)
    i = 0
    while (i < nBigrams) {
      bc.merge(words(i) + " " + words(i + 1), 1L, (a, b) => a + b)
      i += 1
    }
    var dup = 0L
    val bIt = bc.values().iterator()
    while (bIt.hasNext) { val v = bIt.next(); if (v > 1) dup += v }
    InternalRow(words.length.toLong, topWord, nBigrams.toLong, dup)
  }

  /** See QualityMargin. One pass per document: lower+split+filter exactly
    * as the training chain's `filter(split(lower(text)))` (UTF8String
    * lowering = Spark's Lower under the default collation), hashed-bigram
    * signed sums into `dims` buckets, HALF_UP L2 integerization (the
    * BigDecimal.valueOf form Spark's `round` uses), gopher aux stats off
    * the RAW split, exact-integer dot product with the trained weights. */
  def qualityMargin(input: UTF8String, w: Array[Long]): Long = {
    val dims = w.length - 3
    def r0(x: Double): Long = java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    val ws = input.toLowerCase.toString.split("\\s+", -1).filter(_.nonEmpty)
    val wr = new Array[Long](dims)
    var i = 0
    while (i < ws.length - 1) {
      val h = HashExprs.md5u40(
        (ws(i) + " " + ws(i + 1)).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      wr((h % dims).toInt) += (h / dims % 2) * 2 - 1
      i += 1
    }
    var ss = 0L
    var d = 0
    while (d < dims) { ss += wr(d) * wr(d); d += 1 }
    var mi = 0L
    if (ss > 0L) {
      val sq = java.lang.Math.sqrt(ss.toDouble)
      d = 0
      while (d < dims) {
        if (wr(d) != 0L) mi += w(d) * r0(wr(d).toDouble * 10000.0 / sq)
        d += 1
      }
    }
    // aux features: the gopher convention — RAW whitespace split, no filter
    val gw = input.toString.split("\\s+", -1)
    val nWords = gw.length.toLong
    val lenX = java.lang.Math.min(
      r0(java.lang.Math.log(nWords.toDouble + 1.0) * 1000.0), 10000L)
    val uniq = new java.util.HashSet[String](gw.length * 2)
    i = 0
    while (i < gw.length) { uniq.add(gw(i)); i += 1 }
    val ur = java.math.BigDecimal.valueOf(uniq.size.toDouble / nWords)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    mi + w(dims) * lenX + w(dims + 1) * r0(ur * 10000.0) + w(dims + 2) * 10000L
  }

  /** See MinHashSignature. */
  def minhashSig(arr: ArrayData): ArrayData = {
    val K = 64
    val n = arr.numElements()
    val base = new Array[Long](n)
    var i = 0
    while (i < n) {
      val h = HashExprs.md5u64(arr.getUTF8String(i).getBytes)
      base(i) = java.lang.Long.remainderUnsigned(h, HashExprs.MinHashP)
      i += 1
    }
    val sig = new Array[Long](K)
    var k = 0
    while (k < K) {
      val a = 2L * k + 1
      val b = 40503L * k + 13
      var m = Long.MaxValue
      i = 0
      while (i < n) {
        val v = (a * base(i) + b) % HashExprs.MinHashP
        if (v < m) m = v
        i += 1
      }
      sig(k) = if (n == 0) 0L else m
      k += 1
    }
    new GenericArrayData(sig)
  }

  /** See SimHash64. */
  def simhash64(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = HashExprs.md5u64(arr.getUTF8String(i).getBytes)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** See Shingles. */
  def shingles(input: UTF8String, k: Int, distinct: Boolean): ArrayData = {
    val words = input.toString.split("\\s+", -1)
    val n = math.max(0, words.length - k + 1)
    val acc = new java.util.LinkedHashSet[String](math.max(4, n * 2))
    val all = if (distinct) null else new Array[Any](n)
    var i = 0
    while (i < n) {
      val sb = new java.lang.StringBuilder(64)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      if (distinct) acc.add(sb.toString)
      else all(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    if (!distinct) new GenericArrayData(all)
    else {
      val out = new Array[Any](acc.size)
      val it = acc.iterator()
      var p = 0
      while (it.hasNext) { out(p) = UTF8String.fromString(it.next()); p += 1 }
      new GenericArrayData(out)
    }
  }

  /** See CdcChunks. */
  def cdcChunks(input: UTF8String, avgBits: Int, minWords: Int, maxWords: Int): ArrayData = {
    val words = input.toString.split("\\s+", -1)
    val mask = (1L << avgBits) - 1L
    val out = new java.util.ArrayList[Any](words.length / minWords + 1)
    var start = 0
    var h = 0L
    var i = 0
    while (i < words.length) {
      h = (h << 1) + HashExprs.fnv64(words(i).getBytes("UTF-8"))
      val len = i - start + 1
      if ((len >= minWords && (h & mask) == 0L) || len >= maxWords || i == words.length - 1) {
        val sb = new java.lang.StringBuilder(64)
        var j = start
        while (j <= i) {
          if (j > start) sb.append(' ')
          sb.append(words(j))
          j += 1
        }
        out.add(UTF8String.fromString(sb.toString))
        start = i + 1
        h = 0L
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** See DelNeighbors. */
  def delNeighbors(input: UTF8String, maxDel: Int): ArrayData = {
    val s = input.toString
    val seen = new java.util.LinkedHashSet[String]
    seen.add(s)
    var frontier: Array[String] = Array(s)
    var round = 0
    while (round < maxDel) {
      val next = new java.util.ArrayList[String]
      var i = 0
      while (i < frontier.length) {
        val t = frontier(i)
        var j = 0
        while (j < t.length) {
          val v = new java.lang.StringBuilder(t.length - 1)
            .append(t, 0, j).append(t, j + 1, t.length).toString
          if (seen.add(v)) next.add(v)
          j += 1
        }
        i += 1
      }
      frontier = next.toArray(new Array[String](next.size))
      round += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = UTF8String.fromString(it.next()); p += 1 }
    new GenericArrayData(out)
  }

  /** See CosineSim. */
  def cosineSim(l: ArrayData, r: ArrayData): Double = {
    val a = l.toDoubleArray()
    val b = r.toDoubleArray()
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) { dot += a(i) * b(i); i += 1 }
    i = 0
    while (i < a.length) { na += a(i) * a(i); i += 1 }
    i = 0
    while (i < b.length) { nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** See HyperplaneBands. */
  def hyperplaneBands(input: ArrayData, planes: Int, bandBits: Int): ArrayData = {
    val emb = input.toDoubleArray()
    val bits = new Array[Long](planes)
    var p = 0
    while (p < planes) {
      var acc = 0.0
      var d = 0
      while (d < emb.length) {
        val sign = if ((HashExprs.mix64(p.toLong * 1000003L + d) & 1L) == 0L) 1.0 else -1.0
        acc += emb(d) * sign
        d += 1
      }
      bits(p) = if (acc >= 0) 1L else 0L
      p += 1
    }
    val nBands = planes / bandBits
    val keys = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var k = 0L
      var i = 0
      while (i < bandBits) { k = k * 2 + bits(b * bandBits + i); i += 1 }
      keys(b) = k
      b += 1
    }
    new GenericArrayData(keys)
  }

  /** See TopCells. */
  def topCells(l: ArrayData, r: ArrayData, k: Int): ArrayData = {
    val emb = l.toDoubleArray()
    val cents = r
    val n = cents.numElements()
    val scores = new Array[Double](n)
    var i = 0
    while (i < n) {
      val raw = cosineRaw(emb, cents.getArray(i).toDoubleArray())
      // zero-norm vector or centroid → NaN cosine: rank it last
      // deterministically (BigDecimal.valueOf(NaN) would throw)
      scores(i) =
        if (java.lang.Double.isNaN(raw)) Double.NegativeInfinity
        else java.math.BigDecimal.valueOf(raw)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      i += 1
    }
    val kk = math.min(k, n)
    val out = new Array[Long](kk)
    val used = new Array[Boolean](n)
    var j = 0
    while (j < kk) {
      var best = -1
      i = 0
      while (i < n) {
        if (!used(i) && (best < 0 || scores(i) > scores(best))) best = i
        i += 1
      }
      used(best) = true
      out(j) = best.toLong
      j += 1
    }
    new GenericArrayData(out)
  }

  private def cosineRaw(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) { dot += a(i) * b(i); i += 1 }
    i = 0
    while (i < a.length) { na += a(i) * a(i); i += 1 }
    i = 0
    while (i < b.length) { nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** See SigMatchCount. */
  def sigMatchCount(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var m = 0
    var i = 0
    while (i < n) {
      // null positions never match — same as the zip_with lambda, where a
      // null comparison folds to "no match" (UnsafeArrayData would otherwise
      // read a null slot as 0 and pair two nulls as equal)
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) m += 1
      i += 1
    }
    m
  }

  /** See JaccardSim. */
  def jaccardSim(a: ArrayData, b: ArrayData): Double = {
    val setA = new java.util.HashSet[UTF8String](a.numElements() * 2)
    var i = 0
    while (i < a.numElements()) { setA.add(a.getUTF8String(i)); i += 1 }
    val seenB = new java.util.HashSet[UTF8String](b.numElements() * 2)
    var inter = 0
    var bOnly = 0
    i = 0
    while (i < b.numElements()) {
      val s = b.getUTF8String(i)
      if (seenB.add(s)) {
        if (setA.contains(s)) inter += 1 else bOnly += 1
      }
      i += 1
    }
    val union = setA.size + bOnly
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** See PqScore. */
  def pqScore(codes: ArrayData, lut: ArrayData): Double = {
    val m = codes.numElements()
    var acc = 0.0
    var s = 0
    while (s < m) {
      acc += lut.getArray(s).getDouble(codes.getLong(s).toInt)
      s += 1
    }
    acc
  }

  /** See VecSub. */
  def vecSub(l: ArrayData, r: ArrayData): ArrayData = {
    val n = math.min(l.numElements(), r.numElements())
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = l.getDouble(i) - r.getDouble(i); i += 1 }
    new GenericArrayData(out)
  }

  /** See PHash64. */
  def phash64(bytes: Array[Byte]): Long = {
    val k = 4
    if (bytes.length < k) return 0L
    val votes = new Array[Int](64)
    var i = 0
    while (i <= bytes.length - k) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < k) {
        h = (h ^ (bytes(i + j) & 0xffL)) * 0x100000001b3L
        j += 1
      }
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) >= 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Repetition statistics of a document in one compiled pass — the counters
  * behind Gopher-style repetition quality filters (repeated-token fraction,
  * duplicated-n-gram mass): struct(n_words, top_word_n, n_bigrams,
  * dup_bigram_n). dup_bigram_n is the total occurrence count of bigrams
  * occurring more than once (the "fraction of text in duplicated n-grams"
  * numerator). The two hash maps live for one row; nothing shuffles. */
case class RepStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("top_word_n", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("dup_bigram_n", LongType, nullable = false)))
  override def prettyName: String = "rep_stats"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"rep_stats needs string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    HashRuntime.repStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashRuntime.repStats($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Exact-integer margin of one document under the trained hashed-bigram
  * quality model (`text_quality_classifier`): the whole scoring chain —
  * lowercased whitespace bigrams, 40-bit md5 bucket hash with ±1 second-hash
  * sign, per-doc HALF_UP L2 integerization, gopher aux stats, bias — in ONE
  * compiled call per row. Weight layout: [0, n−3) bigram buckets, then
  * scaled log-length, uniq-ratio, bias (the bucket count is inferred from
  * the weight length). Bit-identical to the classifier's distributed
  * explode→groupBy→window margin chain (StreamQualityScoreSpec pins it
  * doc-by-doc), which is what makes the trained gate deployable as a
  * STATELESS STREAMING SELECT — the nested-lambda formulation of the same
  * math is the §6 interpreted-HOF trap (re-evaluates the token array per
  * bucket: minutes per micro-batch at 500 docs).
  *
  * Weights are an `IndexedSeq` (value equality), NOT an `Array`: case-class
  * equality over an Array is reference-based, so two structurally identical
  * quality_margin expressions would never canonicalize together and
  * Catalyst CSE would evaluate the (expensive) margin twice. */
case class QualityMargin(child: Expression, weights: IndexedSeq[Long])
    extends UnaryExpression {

  private lazy val weightArr: Array[Long] = weights.toArray

  override def dataType: DataType = LongType
  override def prettyName: String = "quality_margin"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if weights.length >= 4 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      "quality_margin needs >= 4 weights (buckets + len/uniq/bias)")
    case t => TypeCheckResult.TypeCheckFailure(s"quality_margin needs string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    HashRuntime.qualityMargin(input.asInstanceOf[UTF8String], weightArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("qmWeights", weightArr, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.HashRuntime.qualityMargin($c, $wRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** K=64 MinHash signature of an array<string> of shingles:
  * sig[k] = min over shingles of ((2k+1)·h + 40503·k + 13) mod (2^31-1),
  * h = md5u64(shingle) mod (2^31-1) (unsigned) — md5-based so the whole
  * signature replays in the DuckDB oracle (see HashExprs.md5u64). */
case class MinHashSignature(child: Expression) extends UnaryExpression {
  val K = 64

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sig needs array<string>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    HashRuntime.minhashSig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashRuntime.minhashSig($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash of an array<string> of tokens: bit b is set iff the sum of
  * ±1 votes (sign of bit b of each token hash) is non-negative; the token
  * hash is md5u64 so every bit replays in the DuckDB oracle. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 needs array<string>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    HashRuntime.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashRuntime.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct k-word shingles of a whitespace-separated text column, one
  * compiled call per row. The lambda formulation
  * (transform(sequence, i -> element_at(split(text), i) ...)) re-splits the
  * text for every index under interpreted HOF eval — O(words²) regex work
  * per document. */
/** Content-defined chunking of a word stream (the gear-hash / FastCDC idea
  * of Xia et al., USENIX ATC 2016, at word granularity): a rolling hash
  * accumulates `h = (h << 1) + fnv64(word)` from the current chunk start,
  * and a chunk boundary falls after any word where the low `avgBits` bits
  * of h are zero (expected chunk ≈ minWords + 2^avgBits), subject to
  * [min, max] word guards; the hash resets at each boundary. Boundaries
  * therefore depend only on LOCAL content — an insertion or deletion
  * perturbs chunks near the edit and the chunking re-synchronizes at the
  * next surviving boundary, which is exactly the property fixed-width
  * windows (dedup_rewrite) lack: there a one-word insertion shifts every
  * downstream chunk. One JVM call per row, inside whole-stage codegen. */
case class CdcChunks(child: Expression,
    avgBits: Int = 3, minWords: Int = 4, maxWords: Int = 16)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_chunks"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"cdc_chunks needs string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    HashRuntime.cdcChunks(input.asInstanceOf[UTF8String], avgBits, minWords, maxWords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashRuntime.cdcChunks($c, $avgBits, $minWords, $maxWords)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class Shingles(child: Expression, k: Int, distinct: Boolean = true)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"shingles needs string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    HashRuntime.shingles(input.asInstanceOf[UTF8String], k, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashRuntime.shingles($c, $k, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct strings reachable from the input by deleting at most `maxDel`
  * characters, the input itself included — the FastSS deletion neighborhood
  * (Bocek, Hunt & Stiller, "Fast Similarity Search in Large Dictionaries",
  * 2007). Guarantee: two strings with Levenshtein distance ≤ d always share
  * a common ≤d-deletion variant (each edit consumes at most one deletion on
  * each side), so equality on the exploded neighborhood is an EXACT
  * candidate generator for dist ≤ d — no character-q-gram length caveats,
  * no missed pairs. |del≤2(s)| = 1 + n + n(n−1)/2, bounded by string
  * length, never by corpus size. */
case class DelNeighbors(child: Expression, maxDel: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "del_neighbors"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"del_neighbors needs string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    HashRuntime.delNeighbors(input.asInstanceOf[UTF8String], maxDel)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashRuntime.delNeighbors($c, $maxDel)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Cosine similarity of two array<double> columns in one compiled pass,
  * reproducing the widen-then-multiply sequential-sum order of the HOF
  * formulation (and DuckDB's list_dot_product) bit for bit. */
case class CosineSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"cosine_sim needs two array<double>, got $t")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    HashRuntime.cosineSim(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.HashRuntime.cosineSim($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH band keys of an array<double> embedding in one
  * compiled call per row: `planes` sign bits (plane p's component for
  * dimension d is ±1 from splitmix64(p·1000003 + d) — deterministic on every
  * executor, no plane-matrix broadcast), packed into planes/bandBits band
  * keys. Replaces the nested interpreted-HOF formulation (16 planes × 64
  * dims of interpreted eval per row — the exact SURVEY §6 trap). */
case class HyperplaneBands(child: Expression, planes: Int = 16, bandBits: Int = 4)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_bands"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"hyperplane_bands needs array<double>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    HashRuntime.hyperplaneBands(input.asInstanceOf[ArrayData], planes, bandBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashRuntime.hyperplaneBands($c, $planes, $bandBits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Top-k centroid cells for an embedding against a literal centroid matrix
  * (array<array<double>>, index = cell id), ordered by round(cosine, 6)
  * descending with ascending-index tie-break — the same deterministic argmax
  * a windowed `row_number` over a crossJoin computes, but entirely map-side:
  * one compiled call per row, zero shuffle, zero join. k=1 is IVF cell
  * assignment; k=nprobe is query probing. */
case class TopCells(left: Expression, right: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "top_cells"
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"top_cells needs (array<double>, array<array<double>>), got $t")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    HashRuntime.topCells(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.HashRuntime.topCells($a, $b, $k)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Count of positionally-equal components of two array<long> MinHash
  * signatures — the numerator of the unbiased Jaccard estimator
  * (est J = matches / K). The zip_with+aggregate lambda formulation is the
  * SURVEY §6 trap twice over: Spark HOFs are interpreted (CodegenFallback)
  * AND Catalyst re-inlines the whole lambda tree into every consumer, so a
  * band-join condition plus its downstream projection each pay the
  * interpreted element walk per colliding candidate pair. This is one
  * compiled primitive loop per pair, cheap enough to sit in a join
  * condition. */
case class SigMatchCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sig_match_count"
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"sig_match_count needs two array<long>, got $t")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    HashRuntime.sigMatchCount(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.HashRuntime.sigMatchCount($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Jaccard similarity of two array<string> columns in one compiled pass:
  * |a ∩ b| / |distinct(a ++ b)|, matching
  * len(list_intersect)/len(list_distinct(list_concat)) in the oracle. One
  * hash set per row instead of the two set-builds array_intersect +
  * array_union cost — and cheap enough that Catalyst duplicating it into a
  * pushed-down filter predicate doesn't matter. */
case class JaccardSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"jaccard_sim needs two array<string>, got $t")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    HashRuntime.jaccardSim(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.HashRuntime.jaccardSim($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Product-quantization asymmetric distance: codes is a vector's per-
  * subspace codebook assignment (array<long>, one entry per subspace), lut
  * a query's precomputed lookup table lut[s][c] = dot(q_sub_s, cb[s][c])
  * (array<array<double>>). Score = Σ_s lut[s][codes[s]], accumulated in
  * ascending-subspace order — the fixed order the DuckDB oracle replays
  * term by term, so the doubles match bit for bit. This is the ADC scan of
  * Jégou et al. (TPAMI 2011): per candidate, m array reads and adds
  * instead of a Dim-wide dot product, against 8-byte codes instead of
  * 256-byte vectors. One compiled call per (query, candidate) pair. */
case class PqScore(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_score"
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_score needs (array<long>, array<array<double>>), got $t")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    HashRuntime.pqScore(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.HashRuntime.pqScore($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Element-wise difference of two array<double> vectors — the residual
  * step of IVFADC (Jégou et al. TPAMI 2011 §IV: quantize r = v − cent(v),
  * not v itself). Exact IEEE subtraction, so the oracle's replay is
  * bit-identical; compiled so the per-row residual projection in the
  * corpus encode path stays inside whole-stage codegen (a zip_with lambda
  * here would put an interpreted walk on every scanned vector). */
case class VecSub(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_sub"
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"vec_sub needs two array<double>, got $t")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    HashRuntime.vecSub(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.HashRuntime.vecSub($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 64-bit perceptual fingerprint of an opaque BINARY media payload: a
  * SimHash over the payload's byte 4-grams (each window FNV-hashed, ±1
  * votes per bit, sign bit out) — the shift-invariant locality-sensitive
  * shape of the ssdeep/TLSH family. Small payload edits (changed bytes,
  * insertions, truncations) leave most 4-grams shared, so near-identical
  * media land within a few bits; unrelated payloads differ in ~32.
  *
  * Measured against the alternative: a dHash-style positional grid (8×9
  * byte-chunk means, adjacent-mean sign bits) finds ZERO pairs on the
  * driver corpus — a length-changing edit shifts every downstream chunk
  * boundary and scrambles the grid. Positional grids assume an aligned
  * raster, which a real image DECODE produces but a raw byte stream does
  * not; over byte streams the n-gram formulation is the correct
  * perceptual hash. One compiled pass per row, computed map-side. */
case class PHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "phash64"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"phash64 needs binary, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    HashRuntime.phash64(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashRuntime.phash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
