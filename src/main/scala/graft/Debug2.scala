package graft
import org.apache.spark.sql.SparkSession
object Debug2 {
  def crawl(threads: Int, seeds: Int, rounds: Int): (Long, Double) = {
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions","64").config("spark.ui.enabled","false")
      .config("spark.sql.adaptive.enabled","true").config("spark.local.dir","/dev/shm/spark-local").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val uni = graft.sources.SyntheticWeb.Universe(numHosts=20000, pagesPerHost=5000, outlinksPerDoc=4)
    val cfg = graft.model.CrawlConfig(numPartitions=64, saltsPerHost=4, hostBudgetPerRound=64,
      maxRounds=rounds, bloomExpectedItems=1L<<21)
    val root = java.nio.file.Files.createTempDirectory(java.nio.file.Paths.get("/dev/shm"), s"bench$threads").toString
    val t0 = System.nanoTime()
    val sum = graft.pipeline.CrawlJob.run(spark, uni.seedUrlsDS(spark, seeds),
      graft.sources.SyntheticWeb.defaultRobots, graft.sources.SyntheticWeb.hostMap(uni.numHosts).toDS(),
      uni, cfg, root)
    val secs = (System.nanoTime()-t0)/1e9
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val f = sum.rounds.map(_.fetched).sum
    println(f"crawl threads=$threads fetched=$f secs=$secs%.1f thr=${f/secs}%.0f")
    (f, secs)
  }
  def main(a: Array[String]): Unit = {
    crawl(8, 30000, 2) // warmup (JIT both code paths incl. seen layer)
    crawl(32, 100000, 2) // more warmup
    val n = 400000
    val (f2a, s2a) = crawl(2, n, 2)
    val (f8a, s8a) = crawl(8, n, 2)
    val (f2b, s2b) = crawl(2, n, 2)
    val (f8b, s8b) = crawl(8, n, 2)
    val s2 = math.min(s2a, s2b); val s8 = math.min(s8a, s8b)
    println(f"best2=$s2%.1f best8=$s8%.1f eff2to8 ${(s2/s8)/4.0}%.3f")
  }
}
