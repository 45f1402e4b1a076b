package graft

import graft.datatools.Dedup
import org.apache.spark.sql.functions._

/** Pins the fused content-defined-chunking kernel (`CdcChunksExpr`)
  * to the Column-stack formulation whose output the q105 DuckDB oracle
  * was hashed against: identical per-document chunk frames (ordinal,
  * char length, md5 fingerprint) and therefore an identical
  * `cdcChunkDedup` result, across non-ASCII text, docs shorter than
  * the window, empty docs, boundary-at-end coincidences, and several
  * (window, divisor) configs.
  */
class CdcParitySpec extends SparkSpec {

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog and keeps running past the fence",
    "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa", // uniform content
    "abcabcabcabcabcabcabcabcabcabcabcabcabcabc", // short period
    "short", // len < window
    "", // empty → no chunks
    "exactly8", // len == window: single window position
    "Üñïçödé tëxt wíth Àççents ánd ß shàrp-ß — chunk boundaries must count codepoints",
    "ＣＪＫ　ｆｕｌｌｗｉｄｔｈ ｃｈａｒｓ ｅｖｅｒｙｗｈｅｒｅ！", // 3-byte seqs
    "emoji 😀😀 inside 🎉 the stream 😀 shift byte offsets but not char counts",
    "newlines\nand\ttabs\rare ordinary bytes to the chunker",
    ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod " * 12),
    (0 until 400).map(i => s"w$i").mkString(" "), // long, high-entropy
    ("abcdefgh" * 50) // repeating 8-grams → many duplicate fingerprints
  )

  private def docs = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  for ((w, d) <- Seq((8, 16), (6, 8), (8, 4), (5, 8), (12, 32))) {
    test(s"native cdcChunkDedup == Column formulation, window=$w divisor=$d") {
      val native = Dedup.cdcChunkDedup(docs, w, d).orderBy("doc_id")
        .collect().map(_.toSeq)
      val column = Dedup.cdcChunkDedup(docs, w, d, native = false).orderBy("doc_id")
        .collect().map(_.toSeq)
      assert(native.toSeq == column.toSeq)
    }
  }

  test("native chunk frame matches Column frame field-for-field (w=8 d=16)") {
    // compare below the rollup too, so a compensating error inside the
    // aggregation cannot hide a frame divergence
    import graft.functions.CdcExprs
    val nat = docs.select(col("doc_id"),
        posexplode(CdcExprs.chunksCol(col("text"), 8, 16)).as(Seq("pos", "c")))
      .select(col("doc_id"), col("pos"), col("c.clen"), col("c.fp"))
      .orderBy("doc_id", "pos").collect().map(_.toSeq)
    val colFrame = {
      import org.apache.spark.sql.GraftBridge
      import org.apache.spark.sql.catalyst.expressions.Substring
      def sub(s: org.apache.spark.sql.Column, p: org.apache.spark.sql.Column,
              l: org.apache.spark.sql.Column) =
        GraftBridge.column(Substring(GraftBridge.expression(s),
          GraftBridge.expression(p), GraftBridge.expression(l)))
      val base = docs.select(col("doc_id"), col("text").as("t"))
        .withColumn("len", length(col("t")))
      base
        .withColumn("bnds",
          when(col("len") >= 8,
            filter(
              transform(sequence(lit(8), col("len")),
                i => when(pmod(graft.functions.MinHashExprs.md5Low48Col(
                    sub(col("t"), i - lit(7), lit(8))), lit(16)) === 0, i)
                  .otherwise(lit(-1))),
              x => x >= 0))
            .otherwise(array().cast("array<int>")))
        .withColumn("cuts", array_distinct(
          concat(array(lit(0)), col("bnds"), array(col("len")))))
        .withColumn("starts", slice(col("cuts"), lit(1), size(col("cuts")) - 1))
        .withColumn("ends", slice(col("cuts"), lit(2), size(col("cuts")) - 1))
        .withColumn("chunks", zip_with(col("starts"), col("ends"),
          (p, q) => sub(col("t"), p + 1, q - p)))
        .select(col("doc_id"), posexplode(col("chunks")).as(Seq("pos", "chunk")))
        .select(col("doc_id"), col("pos"),
          length(col("chunk")).cast("long").as("clen"), md5(col("chunk")).as("fp"))
        .orderBy("doc_id", "pos").collect().map(_.toSeq)
    }
    assert(nat.toSeq == colFrame.toSeq)
  }

  test("chunk lengths partition the doc and mean length tracks the divisor") {
    import graft.functions.CdcExprs
    val rows = docs.filter(length(col("text")) > 0).select(col("doc_id"),
        length(col("text")).cast("long").as("n"),
        aggregate(CdcExprs.chunksCol(col("text"), 8, 16),
          lit(0L), (acc, c) => acc + c.getField("clen")).as("sum_clen"))
      .collect()
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"doc ${r.get(0)}: chunk lengths ${r.getLong(2)} != doc length ${r.getLong(1)}"))
  }
}
