package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false).getOrCreate()
    val dir = "/root/testdata/sf0.001"
    println("==== q73 ===="); graft.queries.Queries.q73SaltedJoin(spark, dir).explain("formatted")
    println("==== q74 ===="); graft.queries.Queries.q74RollupStats(spark, dir).explain("formatted")
    spark.stop()
  }
}
