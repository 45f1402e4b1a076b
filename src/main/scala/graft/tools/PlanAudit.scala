package graft.tools
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    println("==== q55 repetition ====")
    graft.queries.Queries.q55Repetition(spark, dir).explain("formatted")
    println("==== q57 shard_pack ====")
    graft.queries.Queries.q57ShardPack(spark, dir).explain("formatted")
    println("==== q53 decontaminate ====")
    graft.queries.Queries.q53Decontaminate(spark, dir).explain("formatted")
    println("==== q54 chunk_dedup ====")
    graft.queries.Queries.q54ChunkDedup(spark, dir).explain("formatted")
    println("==== q56 mixture ====")
    graft.queries.Queries.q56MixtureWeights(spark, dir).explain("formatted")
    println("==== q58 pii_scrub ====")
    graft.queries.Queries.q58PiiScrub(spark, dir).explain("formatted")
    println("==== q59 vocab_encode ====")
    graft.queries.Queries.q59VocabEncode(spark, dir).explain("formatted")
    println("==== q60 rarity_score ====")
    graft.queries.Queries.q60RarityScore(spark, dir).explain("formatted")
    println("==== q61 fuzzy_decontaminate ====")
    graft.queries.Queries.q61FuzzyDecontaminate(spark, dir).explain("formatted")
    println("==== q62 group_quantiles ====")
    graft.queries.Queries.q62GroupQuantiles(spark, dir).explain("formatted")
    println("==== q63 classifier_score ====")
    graft.queries.Queries.q63ClassifierScore(spark, dir).explain("formatted")
    println("==== q64 merge_induction (final round's plan) ====")
    graft.queries.Queries.q64MergeInduction(spark, dir).explain("formatted")
    println("==== q65 containment ====")
    graft.queries.Queries.q65Containment(spark, dir).explain("formatted")
    spark.stop()
  }
}
