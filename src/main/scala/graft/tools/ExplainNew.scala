package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false).getOrCreate()
    val dir = "/root/testdata/sf0.001"
    println("==== q70 ===="); graft.queries.Queries.q70AggMaintain(spark, dir).explain("formatted")
    println("==== q71 ===="); graft.queries.Queries.q71SaltedAgg(spark, dir).explain("formatted")
    println("==== q72 ===="); graft.queries.Queries.q72BloomJoin(spark, dir).explain("formatted")
    spark.stop()
  }
}
