package graft.tools
import org.apache.spark.sql.SparkSession

/** Scratch plan-audit main for the newest queries — repointed each
  * batch (PlanAudit holds the stable list).
  */
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    println("==== q107 hybrid_rrf ====")
    graft.queries.Queries.q107HybridRrf(spark, dir).explain("formatted")
    spark.stop()
  }
}
