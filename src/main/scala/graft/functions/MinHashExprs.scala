package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
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

  def signatureCol(text: Column, k: Int, perms: Seq[(Long, Long)]): Column =
    GraftBridge.column(MinHashSigExpr(GraftBridge.expression(text), k,
      perms.flatMap(p => Seq(p._1, p._2)).toArray))

  def shinglesCol(text: Column, k: Int): Column =
    GraftBridge.column(ShinglesExpr(GraftBridge.expression(text), k))
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
