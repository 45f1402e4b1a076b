package graft

import graft.datatools.TextAnalysis
import org.apache.spark.sql.functions._

/** Pins the fused single-pass text-analysis UDFs to the Column-
  * expression stack bit-for-bit: the Column stack is what the DuckDB
  * oracle mirrors, so fused == column ⇒ fused == oracle. Runs over the
  * real driver corpus plus crafted edge cases (overlap traps, leading
  * separators, empty/whitespace, non-ASCII).
  */
class TextFusedParitySpec extends SparkSpec {

  private lazy val corpus = {
    import spark.implicits._
    val edge = Seq(
      "", " ", "   ", "\ta b", "a b\t", " the the the ", "a a a a",
      "THE AND OF", "der und die der", "le la et", "el los y y y",
      "的是在的是在", "no stopwords here!!", "x", "a.b,c;d:e!f?g",
      "  padded  with   runs  ", "\n\nnewlines\nonly\n",
      "mixed 的 content the 和 der")
      .toDF("text")
    spark.read.parquet(s"$sfDir/documents.parquet").select("text")
      .unionByName(edge)
  }

  test("langIdFused == langId (Column) over corpus + edges") {
    val diff = corpus
      .withColumn("a", TextAnalysis.langId(col("text")))
      .withColumn("b", TextAnalysis.langIdFused(col("text")))
      .filter(col("a") =!= col("b"))
    assert(diff.count() === 0, diff.take(5).mkString("; "))
  }

  test("qualityScoreFused == qualityScore (Column) over corpus + edges") {
    val diff = corpus
      .withColumn("a", TextAnalysis.qualityScore(col("text")))
      .withColumn("b", TextAnalysis.qualityScoreFused(col("text")))
      .filter(col("a") =!= col("b"))
    assert(diff.count() === 0, diff.take(5).mkString("; "))
  }

  test("tokenCountScala == tokenCount (Column) over corpus + edges") {
    val f = udf(TextAnalysis.tokenCountScala _)
    val diff = corpus
      .withColumn("a", TextAnalysis.tokenCount(col("text")))
      .withColumn("b", f(col("text")))
      .filter(col("a") =!= col("b"))
    assert(diff.count() === 0, diff.take(5).mkString("; "))
  }
}
