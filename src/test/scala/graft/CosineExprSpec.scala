package graft

import graft.functions.CosineSimilarityExpr
import org.apache.spark.sql.functions._

/** The custom Catalyst expression: value parity with a reference UDF,
  * null semantics, and codegen participation.
  */
class CosineExprSpec extends SparkSpec {

  private val refUdf = udf { (a: Seq[Double], b: Seq[Double]) =>
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("expression matches the reference loop bit-for-bit on real vectors") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val a = emb.select(col("vec_id").as("ia"), col("embedding").cast("array<double>").as("va"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").cast("array<double>").as("vb"))
    val pairs = a.join(b, col("ia") < col("ib")).limit(5000)
    val diff = pairs
      .withColumn("e", CosineSimilarityExpr.cosine(col("va"), col("vb")))
      .withColumn("u", refUdf(col("va"), col("vb")))
      .filter(col("e") =!= col("u")) // bitwise-equal doubles expected
      .count()
    assert(diff === 0L)
  }

  test("null input yields null; mismatched lengths use common prefix") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 0.0)), Some(Seq(1.0, 0.0))),
      (None, Some(Seq(1.0, 0.0))),
      (Some(Seq(1.0, 0.0, 5.0)), Some(Seq(1.0, 0.0)))
    ).toDF("a", "b")
    val out = df.select(CosineSimilarityExpr.cosine(col("a"), col("b")).as("c")).collect()
    assert(out(0).getDouble(0) === 1.0)
    assert(out(1).isNullAt(0))
    // prefix [1,0]·[1,0] but |a| uses only the prefix too → 1.0
    assert(out(2).getDouble(0) === 1.0)
  }

  test("null elements yield null; zero-norm yields -1.0 (DuckDB parity)") {
    import spark.implicits._
    val df = Seq(
      (Seq(Some(1.0), None), Seq(Some(1.0), Some(2.0))),         // null element → null
      (Seq(Some(0.0), Some(0.0)), Seq(Some(1.0), Some(2.0))),    // zero norm → -1.0
      (Seq(Some(1e-200), Some(0.0)), Seq(Some(1e-200), Some(0.0))) // underflow → NaN → -1.0
    ).toDF("a", "b")
    val out = df.select(CosineSimilarityExpr.cosine(col("a"), col("b")).as("c")).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getDouble(0) === -1.0)
    assert(out(2).getDouble(0) === -1.0)
  }

  test("the expression participates in whole-stage codegen") {
    val df = spark.range(100)
      .withColumn("a", array(col("id").cast("double"), lit(2.0)))
      .withColumn("b", array(lit(3.0), col("id").cast("double")))
      .select(CosineSimilarityExpr.cosine(col("a"), col("b")).as("c"))
    val plan = df.queryExecution.executedPlan.toString()
    // the '*' prefix marks operators inside a WholeStageCodegen stage
    assert(plan.linesIterator.next().trim.startsWith("*"), plan)
    assert(!plan.contains("CodegenFallback"), plan)
  }
}
