package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen kernel for content-defined chunking
  * (`Dedup.cdcChunkDedup`, q105) — the `MinHashExprs`/`SimHashExpr`
  * pattern applied to the slowest remaining headline projection.
  *
  * The Column formulation it replaces walks `transform(sequence(w, len))`
  * through three interpreted higher-order functions, and every element
  * evaluates a character-indexed catalyst `Substring` whose char→byte
  * offset resolution rescans the string from position 0 — O(len²) byte
  * work per document plus one boxed tree-walk per character, all outside
  * WholeStageCodegen. This kernel makes ONE pass over the UTF-8 bytes,
  * stepping char offsets with the same `numBytesForFirstByte` table the
  * catalyst substring uses, keeps the trailing `window` char offsets in a
  * ring buffer, and hashes each window byte-slice in place — O(len·w)
  * with zero per-position allocation.
  *
  * Bit-parity contract (pinned by CdcParitySpec, and what the q105
  * DuckDB oracle was hashed against):
  *   - boundary AFTER 1-based char position i (w ≤ i ≤ len) iff
  *     md5_low48(chars [i-w+1, i]) % divisor == 0, where md5_low48 is
  *     bytes [8,16) of the MD5 digest as a little-endian long masked to
  *     48 bits (`MinHashExprs.md5Low48` over the identical byte slice);
  *   - cut points 0 ∪ boundaries ∪ len, deduplicated; consecutive cuts
  *     (p, q] frame a chunk — char length q-p, fingerprint = lowercase
  *     hex MD5 of the chunk's UTF-8 bytes (= Spark/DuckDB `md5`);
  *   - len < w ⇒ one chunk (the whole text); len == 0 ⇒ empty array;
  *     null text ⇒ null (the Column stack's null-join behavior drops the
  *     doc from the occurrence frame either way).
  */
object CdcExprs {

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  /** Boundary hash — delegates to the sketch layer's byte-slice
    * overload so the bit-parity-critical little-endian 48-bit
    * extraction has exactly one home.
    */
  private def md5Low48(bytes: Array[Byte], from: Int, len: Int): Long =
    MinHashExprs.md5Low48(bytes, from, len)

  /** Lowercase 32-hex MD5 of a byte slice — what Spark's `md5(string)`
    * (and the DuckDB oracle's `md5`) computes over the chunk text.
    */
  private def md5Hex(bytes: Array[Byte], from: Int, len: Int): UTF8String = {
    val md = md5Digest.get()
    md.update(bytes, from, len)
    val d = md.digest()
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexChars(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** text → array<struct<clen: long, fp: string>> of content-defined
    * chunks in document order (the posexplode ordinal is the chunk
    * position downstream).
    */
  def chunks(text: UTF8String, window: Int, divisor: Int): ArrayData = {
    val bytes = text.getBytes
    val total = bytes.length
    if (total == 0) return new GenericArrayData(Array.empty[Any])
    // ring(c % (window+1)) = byte offset where 0-based char c starts;
    // maintained for the trailing window+1 chars only.
    val ring = new Array[Int](window + 1)
    var rows: Array[AnyRef] = new Array[AnyRef](8)
    var nRows = 0
    def emit(clen: Long, from: Int, byteLen: Int): Unit = {
      if (nRows == rows.length) rows = java.util.Arrays.copyOf(rows, nRows * 2)
      rows(nRows) = new GenericInternalRow(
        Array[Any](clen, md5Hex(bytes, from, byteLen)))
      nRows += 1
    }
    var byteOff = 0    // byte offset of the NEXT char
    var charIdx = 0    // chars consumed so far (== 1-based index of last consumed)
    var prevCutChar = 0
    var prevCutByte = 0
    while (byteOff < total) {
      ring(charIdx % (window + 1)) = byteOff
      byteOff += UTF8String.numBytesForFirstByte(bytes(byteOff))
      if (byteOff > total) byteOff = total // malformed tail guard
      charIdx += 1
      if (charIdx >= window) {
        val winStart = ring((charIdx - window) % (window + 1))
        if (md5Low48(bytes, winStart, byteOff - winStart) % divisor == 0) {
          emit((charIdx - prevCutChar).toLong, prevCutByte, byteOff - prevCutByte)
          prevCutChar = charIdx
          prevCutByte = byteOff
        }
      }
    }
    // final chunk unless the last boundary coincided with the end
    if (charIdx > prevCutChar)
      emit((charIdx - prevCutChar).toLong, prevCutByte, total - prevCutByte)
    new GenericArrayData((if (nRows == rows.length) rows
      else java.util.Arrays.copyOf(rows, nRows)).asInstanceOf[Array[Any]])
  }

  def chunksCol(text: Column, window: Int, divisor: Int): Column =
    GraftBridge.column(CdcChunksExpr(GraftBridge.expression(text), window, divisor))
}

/** text → array<struct<clen, fp>> content-defined chunks (fused
  * boundary-hash + chunk-fingerprint loop inside WholeStageCodegen).
  */
case class CdcChunksExpr(child: Expression, window: Int, divisor: Int)
    extends UnaryExpression {
  require(window >= 1 && divisor >= 1,
    s"cdc_chunks needs window >= 1 and divisor >= 1, got ($window, $divisor)")
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("clen", LongType, nullable = false),
      StructField("fp", StringType, nullable = false))),
    containsNull = false)
  override def nullSafeEval(input: Any): Any =
    CdcExprs.chunks(input.asInstanceOf[UTF8String], window, divisor)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CdcExprs.chunks($c, $window, $divisor)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "cdc_chunks"
}
