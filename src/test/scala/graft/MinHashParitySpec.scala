package graft

import graft.datatools.Dedup
import org.apache.spark.sql.functions._

/** Pins the native codegen MinHash expressions
  * (`functions/MinHashExprs.scala`) to the scalar-UDF twins whose
  * outputs the q24/q25 oracles were hashed against: identical shingle
  * arrays (values AND first-occurrence order) and bit-identical
  * signatures, across whitespace runs, non-ASCII text, degenerate
  * inputs, and both k=1 and k=2.
  */
class MinHashParitySpec extends SparkSpec {

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "  leading and   trailing   whitespace  ",
    "tabs\tand\nnewlinesmixed\fwith\rreturns separate tokens",
    "repeated repeated repeated repeated tokens tokens",
    "single",
    "", // no tokens at all
    "   ", // whitespace only
    "Üñïçödé tëxt wíth Àççents ánd ß sharp-s Iİstanbul",
    "ＣＪＫ　fullwidth nbsp stays-inside-token", // U+3000/U+00A0 are NOT \s
    "MiXeD CaSe TOKENS with UPPER and lower",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    "punctuation, stays. glued! to? tokens; (like) [this]",
    "x " * 200 + "tail", // long repetitive doc
    (0 until 300).map(i => s"tok$i").mkString(" ") // many distinct tokens
  )

  private def df = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "text")
  }

  for (k <- Seq(1, 2)) {
    test(s"shingle expression == shingle UDF (values and order), k=$k") {
      val rows = df
        .withColumn("expr_sh", graft.functions.MinHashExprs.shinglesCol(col("text"), k))
        .withColumn("udf_sh", Dedup.shingles(col("text"), k))
        .select("id", "expr_sh", "udf_sh")
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](1) === r.getSeq[String](2),
          s"shingle mismatch for id=${r.getInt(0)} text=${texts(r.getInt(0)).take(40)}")
      }
      assert(rows.length === texts.length)
    }

    test(s"signature expression == signature UDF (bit-identical), k=$k") {
      val perms = Dedup.permutations(64, seed = 42L)
      val rows = df
        .withColumn("expr_sig", graft.functions.MinHashExprs.signatureCol(col("text"), k, perms))
        .withColumn("udf_sig", Dedup.minhashSignature(Dedup.shingles(col("text"), k), perms))
        .select("id", "expr_sig", "udf_sig")
        .collect()
      rows.foreach { r =>
        val e = r.getSeq[Long](1); val u = r.getSeq[Long](2)
        // the UDF twin emits Long.MaxValue mins for shingle-less docs too
        assert(e === u, s"signature mismatch for id=${r.getInt(0)}")
      }
    }
  }

  test("expression runs inside whole-stage codegen (no UDF boundary)") {
    // a range source (not a LocalRelation, which constant-folds the
    // expressions at optimization time) so the physical plan is real
    val perms = Dedup.permutations(8, seed = 1L)
    val plan = spark.range(0, 1000)
      .select(concat(lit("tok"), col("id"), lit(" tok"), col("id") + 1).as("text"))
      .withColumn("sig", graft.functions.MinHashExprs.signatureCol(col("text"), 2, perms))
      .withColumn("sh", graft.functions.MinHashExprs.shinglesCol(col("text"), 2))
      .queryExecution.executedPlan.toString()
    // '*(n)' is the WholeStageCodegen marker in the simple plan string;
    // both expressions must sit INSIDE a starred stage
    val exprLine = plan.linesIterator
      .find(l => l.contains("minhash_signature") && l.contains("word_shingles"))
    assert(exprLine.exists(_.contains("*(")), plan)
  }
}
