package graft.frontier

import graft.model.{HostIps, RobotsRule}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** F5 at scale (`chromium/events.go:58-189`): every sub-resource URL a
  * page pulls is re-checked against the allow/deny/IP policy; file://
  * resources pass only under an explicit prefix (`events.go:277-287`);
  * failures aggregate back per document (A2 error join,
  * `events.go:260-266`).
  *
  * Physical shape: explode(resources) → the same plan-time rlike
  * verdict columns as the main-page filter (F1) → groupBy(doc) with
  * count/collect — one generate + one aggregation, no UDF on the regex
  * path, resource fan-out never leaves its partition until the final
  * per-doc aggregation.
  */
object SubResources {

  /** `df` must carry `idCol` and `resourcesCol: array<string>`.
    * Returns one row per doc: n_allowed, n_denied, errors (sorted).
    */
  def filterResources(
      spark: SparkSession,
      df: DataFrame,
      rules: Seq[RobotsRule],
      hostMap: Dataset[HostIps],
      allowedFilePrefixes: Seq[String] = Nil,
      idCol: String = "doc_id",
      resourcesCol: String = "resources"
  ): DataFrame = {
    val exploded = df.select(col(idCol), explode(col(resourcesCol)).as("res_url"))
    val isFile = lower(col("res_url")).startsWith("file://")
    val filePrefixOk =
      if (allowedFilePrefixes.isEmpty) lit(false) // default-deny (events.go:277-287)
      else allowedFilePrefixes.map(p => col("res_url").startsWith("file://" + p))
        .reduce(_ || _)
    val decided = RobotsFilter.decide(spark, exploded, "res_url", rules, hostMap)
      .withColumn("res_verdict",
        when(isFile && filePrefixOk, lit("ok"))
          .when(isFile, lit("denied: file access is not allowed"))
          .otherwise(col("robots_verdict")))
    decided.groupBy(col(idCol))
      .agg(
        sum(when(col("res_verdict") === "ok", 1L).otherwise(0L)).as("n_allowed"),
        sum(when(col("res_verdict") =!= "ok", 1L).otherwise(0L)).as("n_denied"),
        array_sort(collect_list(when(col("res_verdict") =!= "ok",
          concat(lit("'"), col("res_url"), lit("': "), col("res_verdict")))))
          .as("errors"))
  }
}
