package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expressions for the MinHash dedup hot path
  * (`datatools/Dedup.scala`) — the `UrlExprs` pattern applied to the
  * two scalar UDFs the round-2 verdict flagged as the remaining q25
  * cost: the word-shingle builder and the MinHash signature.
  *
  * Both operate directly on the row's `UTF8String` BYTES: tokens are
  * located by scanning for the 6 ASCII `\s` byte values (multi-byte
  * UTF-8 sequences never contain ASCII bytes, so the scan is
  * codepoint-safe), k-gram bytes are assembled into a reusable scratch
  * buffer, and the murmur3/permutation arithmetic runs over those bytes
  * without ever allocating a java.lang.String per shingle. Parity with
  * the UDF twins (which the q24/q25 oracle results were hashed against)
  * is pinned by MinHashParitySpec; the one decode the UDFs did that
  * bytes can't reproduce — full-Unicode `String.toLowerCase` — is kept
  * by lowercasing the decoded string once per document.
  *
  * The signature skips the UDF's distinct-shingle step entirely: a
  * minimum over a multiset equals the minimum over its support, so
  * deduplication cannot change any permutation's min.
  */
object MinHashExprs {

  private val MersennePrime = (1L << 31) - 1

  /** Whitespace per java.util.regex `\s` = [ \t\n\x0B\f\r]. */
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** Lowercase with full String semantics (parity with the UDFs), then
    * UTF-8 bytes. One decode + one encode per document.
    */
  private def lowerBytes(text: UTF8String): Array[Byte] =
    text.toString.toLowerCase.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** Token spans (start, end) over `bytes`, maximal non-\s runs.
    * A fully-empty/whitespace input yields ONE zero-length token — the
    * exact quirk of the UDF twin's `"".split(" ") == Array("")`, which
    * makes an empty doc carry the single shingle `""` at k=1.
    */
  private def tokenSpans(bytes: Array[Byte]): (Array[Int], Int) = {
    var n = 0
    var spans = new Array[Int](32)
    var i = 0
    val len = bytes.length
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isWs(bytes(i))) i += 1
        if (2 * n + 2 > spans.length) spans = java.util.Arrays.copyOf(spans, spans.length * 2)
        spans(2 * n) = start; spans(2 * n + 1) = i
        n += 1
      }
    }
    if (n == 0) { spans(0) = 0; spans(1) = 0; n = 1 }
    (spans, n)
  }

  /** MinHash signature of the k-gram shingle set of `text`: for each
    * permutation i, min over shingles of `floorMod(a_i·h + b_i, p)`
    * where `h = floorMod(murmur3(shingleUtf8), p)` — bit-identical to
    * the UDF stack `minhashSignature(shingles(text, k), perms)`.
    * `perms` is the (a,b) sequence flattened [a0,b0,a1,b1,...].
    */
  def signature(text: UTF8String, k: Int, perms: Array[Long]): ArrayData = {
    val bytes = lowerBytes(text)
    val (spans, n) = tokenSpans(bytes)
    val numPerms = perms.length / 2
    val mins = new Array[Long](numPerms)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var scratch = new Array[Byte](256)
    var t = 0
    while (t + k <= n) {
      // assemble the joined k-gram bytes (single 0x20 separators)
      var pos = 0
      var j = 0
      while (j < k) {
        val s = spans(2 * (t + j)); val e = spans(2 * (t + j) + 1)
        val need = pos + (e - s) + 1
        if (need > scratch.length)
          scratch = java.util.Arrays.copyOf(scratch, math.max(need, scratch.length * 2))
        if (j > 0) { scratch(pos) = ' '; pos += 1 }
        System.arraycopy(bytes, s, scratch, pos, e - s)
        pos += e - s
        j += 1
      }
      val h = Math.floorMod(
        Murmur3_x86_32.hashUnsafeBytes(scratch, Platform.BYTE_ARRAY_OFFSET, pos, 42).toLong,
        MersennePrime)
      var i = 0
      while (i < numPerms) {
        val v = Math.floorMod(h * perms(2 * i) + perms(2 * i + 1), MersennePrime)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      t += 1
    }
    new GenericArrayData(mins)
  }

  /** Distinct k-gram shingles in first-occurrence order — byte-level
    * twin of the `Dedup.shingles` UDF (same output values and order).
    */
  def shingleArray(text: UTF8String, k: Int): ArrayData = {
    val bytes = lowerBytes(text)
    val (spans, n) = tokenSpans(bytes)
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var scratch = new Array[Byte](256)
    var t = 0
    while (t + k <= n) {
      var pos = 0
      var j = 0
      while (j < k) {
        val s = spans(2 * (t + j)); val e = spans(2 * (t + j) + 1)
        val need = pos + (e - s) + 1
        if (need > scratch.length)
          scratch = java.util.Arrays.copyOf(scratch, math.max(need, scratch.length * 2))
        if (j > 0) { scratch(pos) = ' '; pos += 1 }
        System.arraycopy(bytes, s, scratch, pos, e - s)
        pos += e - s
        j += 1
      }
      seen.add(UTF8String.fromBytes(java.util.Arrays.copyOf(scratch, pos)))
      t += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = it.next(); idx += 1 }
    new GenericArrayData(out)
  }

  // one digest instance per thread: getInstance("MD5") is a provider
  // lookup + allocation, and simhash hashes once per TOKEN
  private val md5Digest = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** 64-bit SimHash — byte-level twin of `Dedup.simhash64` (which the
    * q26/q37 oracles were verified against): tokens are maximal non-`\s`
    * byte runs of the lowercased text, each token hashed with
    * `md5_number_lower` semantics (little-endian read of MD5 digest
    * bytes 8..16 — the token's byte slice IS its UTF-8 encoding, so
    * hashing the slice equals hashing `token.getBytes(UTF_8)`), folded
    * into 64 signed counters. A doc with no non-empty token returns 0L,
    * replicating the twin's `filter(_.nonEmpty)` + empty-guard.
    */
  def simhash(text: UTF8String): Long = {
    val bytes = lowerBytes(text)
    val (spans, n) = tokenSpans(bytes)
    val md = md5Digest.get()
    val acc = new Array[Int](64)
    var any = false
    var t = 0
    while (t < n) {
      val s = spans(2 * t); val e = spans(2 * t + 1)
      if (e > s) { // tokenSpans' one zero-length token for empty docs is skipped
        any = true
        md.update(bytes, s, e - s)
        val d = md.digest() // digest() finalizes AND resets
        val h = java.nio.ByteBuffer.wrap(d, 8, 8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) acc(bit) += 1 else acc(bit) -= 1
          bit += 1
        }
      }
      t += 1
    }
    if (!any) return 0L
    var out = 0L
    var bit = 0
    while (bit < 64) { if (acc(bit) > 0) out |= (1L << bit); bit += 1 }
    out
  }

  def signatureCol(text: Column, k: Int, perms: Seq[(Long, Long)]): Column =
    GraftBridge.column(MinHashSigExpr(GraftBridge.expression(text), k,
      perms.flatMap(p => Seq(p._1, p._2)).toArray))

  def shinglesCol(text: Column, k: Int): Column =
    GraftBridge.column(ShinglesExpr(GraftBridge.expression(text), k))

  def simhashCol(text: Column): Column =
    GraftBridge.column(SimHashExpr(GraftBridge.expression(text)))

  /** Fixed-point hashed-feature linear classifier score — the fastText-
    * style quality-filter shape with a deterministic weight table:
    * per token (maximal non-`\s` byte run of the RAW text — the q51
    * `\s+` tokenizer, no lowercasing), feature id f = md5_number_lower
    * (token) & 0xFFFF (bitwise AND, not mod — signed Long and UBIGINT
    * agree on low bits), weight w(f) = ((f · 2654435761) >> 13) mod 17
    * − 8 ∈ [−8, 8] (Knuth multiplicative scramble; products stay under
    * 2⁴⁸ so no engine overflows). Returns (n_terms, Σw). The weights
    * are a documented stand-in for a trained model: production swaps
    * the arithmetic w(f) for a broadcast weight array lookup — same
    * expression shape, same zero-exchange plan.
    */
  def classifierScore(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    val (spans, n) = tokenSpans(bytes)
    val md = md5Digest.get()
    var terms = 0L
    var score = 0L
    var t = 0
    while (t < n) {
      val s = spans(2 * t); val e = spans(2 * t + 1)
      if (e > s) {
        terms += 1L
        md.update(bytes, s, e - s)
        val d = md.digest()
        val h = java.nio.ByteBuffer.wrap(d, 8, 8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
        val f = h & 0xffffL
        score += ((f * 2654435761L) >> 13) % 17L - 8L
      }
      t += 1
    }
    new GenericInternalRow(Array[Any](terms, score))
  }

  def classifierScoreCol(text: Column): Column =
    GraftBridge.column(ClassifierScoreExpr(GraftBridge.expression(text)))

  /** `md5_number_lower(s) & (2⁴⁸−1)` — the engine-pinned 48-bit hash
    * the sketch layer (KMV, count-min) applies per VALUE of the input
    * stream; bit-identical to `TextAnalysis.md5Lower64(s) & Mask48`
    * (UTF8String.getBytes IS the UTF-8 encoding — SketchesSpec pins
    * the parity).
    */
  def md5Low48(s: UTF8String): Long = {
    val bytes = s.getBytes
    md5Low48(bytes, 0, bytes.length)
  }

  /** Byte-slice overload — the ONE home of the little-endian 48-bit
    * extraction (CdcExprs' boundary hash delegates here so the
    * bit-parity-critical masking cannot drift between the sketch and
    * chunking layers).
    */
  def md5Low48(bytes: Array[Byte], from: Int, len: Int): Long = {
    val md = md5Digest.get()
    md.update(bytes, from, len)
    val d = md.digest()
    java.nio.ByteBuffer.wrap(d, 8, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong & ((1L << 48) - 1)
  }

  def md5Low48Col(s: Column): Column =
    GraftBridge.column(Md5Low48Expr(GraftBridge.expression(s)))
}

/** text → array<long> MinHash signature (fused shingle+hash loop inside
  * WholeStageCodegen; the permutation table rides along as a reference
  * object, not a serialized closure).
  */
case class MinHashSigExpr(child: Expression, k: Int, perms: Array[Long])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    MinHashExprs.signature(input.asInstanceOf[UTF8String], k, perms)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val permsRef = ctx.addReferenceObj("perms", perms, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashExprs.signature($c, $k, $permsRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "minhash_signature"
}

/** text → 64-bit SimHash signature (fused tokenize+md5+fold loop inside
  * WholeStageCodegen) — replaces the per-row scalar UDF `udf(simhash64 _)`
  * that BENCH_r03 measured as the slowest headline family (q26 3.79 s).
  */
case class SimHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    MinHashExprs.simhash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashExprs.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** text → array<string> distinct word k-grams (first-occurrence order). */
case class ShinglesExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    MinHashExprs.shingleArray(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashExprs.shingleArray($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "word_shingles"
}

/** text → struct(n_terms, score): fixed-point hashed-feature linear
  * classifier score (fused tokenize+md5+weight loop inside
  * WholeStageCodegen) — see [[MinHashExprs.classifierScore]].
  */
case class ClassifierScoreExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_terms", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("score", LongType, nullable = false)))
  override def nullSafeEval(input: Any): Any =
    MinHashExprs.classifierScore(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashExprs.classifierScore($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "classifier_score"
}

/** string → md5-low-48 long (fused inside WholeStageCodegen) — the
  * sketch layer's per-value hash; replaces the scalar UDF on the
  * KMV/count-min build paths, which hash every value of the stream.
  */
case class Md5Low48Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    MinHashExprs.md5Low48(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashExprs.md5Low48($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "md5_low48"
}
