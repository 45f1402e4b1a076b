package graft.tools

import graft.functions.{UrlExprs, UrlFunctions}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Canonicalizer A/B micro-bench: same 4M-row URL frame, three
  * implementations, alternating reps in one JVM — isolates the scalar
  * cost from crawl noise. `runMain graft.tools.MicroBench [rows]`.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 4000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val urls = spark.range(rows).select(
      concat(lit("https://HOST"), pmod(col("id"), lit(20000L)), lit(".example.test:443/page/"),
        pmod(col("id"), lit(5000L)),
        when(pmod(col("id"), lit(7L)) === 0, "/").otherwise("")).as("url"))

    val scalaUdf = udf(UrlFunctions.canonicalizeUrl _)
    val variants: Seq[(String, Column)] = Seq(
      "scala-udf" -> scalaUdf(col("url")),
      "regex-columns" -> UrlFunctions.canonicalizeUrlCol(col("url")),
      "native-expr" -> UrlExprs.canonicalize(col("url")))

    (1 to 3).foreach { rep =>
      variants.foreach { case (name, expr) =>
        val t0 = System.nanoTime()
        urls.select(expr.as("c")).write.format("noop").mode("overwrite").save()
        println(f"MICRO rep=$rep $name%-14s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
