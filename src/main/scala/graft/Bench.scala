package graft

import graft.model.CrawlConfig
import graft.pipeline.CrawlJob
import graft.sources.SyntheticWeb
import org.apache.spark.sql.SparkSession

/** Benchmark main. Two parts:
  *
  *  1. headline operator queries on `SPARK_GRAFT_SF_DIR` at
  *     local[SPARK_GRAFT_CPUS];
  *  2. the north metric: frontier throughput (URLs fetched+converted/s)
  *     of the same crawl job at two parallelism levels on identical
  *     input — the sandbox stand-in for N vs 4N executors — with
  *     scaling efficiency = (thr_4N / thr_N) / 4.
  *
  * The N→4N pair is local[2]→local[8]: this VM's parallel CPU capacity
  * is linear only up to ~16 workers (a pure-CPU spin scales 8→32 by
  * only ~2.9×, i.e. a 0.73 ceiling), so the 2→8 pair measures the
  * ENGINE's scaling inside the hardware's linear region; local[32] is
  * still run for the headline absolute throughput, and the measured
  * hardware ceiling ships in BASELINE.md for context. Runs alternate
  * N/4N twice and take the best of each (JIT + page-cache warmth and
  * host noise swing single runs by ±30%).
  *
  * Prints ONE JSON line. Workload knobs via env:
  * SPARK_GRAFT_BENCH_SEEDS (default 2000000), SPARK_GRAFT_BENCH_ROUNDS
  * (default 2).
  */
object Bench {

  private val fastDir =
    if (new java.io.File("/dev/shm").isDirectory) "/dev/shm" else System.getProperty("java.io.tmpdir")

  private def newSession(threads: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$threads]")
      .appName(s"graft-bench-$threads")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", s"$fastDir/graft-spark-local")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One crawl at the given parallelism; returns (urls fetched+converted, seconds). */
  private def crawlOnce(threads: Int, seeds: Int, rounds: Int): (Long, Double) = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .appName(s"graft-bench-crawl-$threads")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", s"$fastDir/graft-spark-local")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val universe = SyntheticWeb.Universe(
      numHosts = 20000, pagesPerHost = 5000, seed = 42L, outlinksPerDoc = 4)
    // partitions fixed (not thread-count-dependent) so the PLAN is
    // identical at both sizes — only execution parallelism changes
    val cfg = CrawlConfig(numPartitions = 64, saltsPerHost = 4,
      hostBudgetPerRound = 64, maxRounds = rounds,
      bloomExpectedItems = 1L << 21)
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(fastDir), s"graft-bench-$threads").toString
    val t0 = System.nanoTime()
    val summary = CrawlJob.run(spark, universe.seedUrlsDS(spark, seeds),
      SyntheticWeb.defaultRobots, SyntheticWeb.hostMap(universe.numHosts).toDS(),
      universe, cfg, root)
    val secs = (System.nanoTime() - t0) / 1e9
    val fetched = summary.rounds.map(_.fetched).sum
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    (fetched, secs)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val seeds = sys.env.getOrElse("SPARK_GRAFT_BENCH_SEEDS", "2000000").toInt
    val rounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROUNDS", "2").toInt

    // ---- part 1: operator queries ----
    val headline = Seq(
      "q01_agg_pushdown", "q03_join_broadcast", "q05_semi_join",
      "q06_url_canonicalize", "q08_politeness_admission", "q10_status_expansion",
      "q14_net_aggregate", "q16_window_offset", "q17_split_explode",
      "q22_sessionize", "q23_dedup_exact", "q25_minhash_lsh",
      "q26_simhash", "q28_ann_brute", "q29_lang_id", "q31_token_count")
    val qmap = SparkEntry.queries
    val spark = newSession(cpus)
    // a failing headline query FAILS the bench (no silent near-zero
    // timings for broken queries)
    val results = headline.map { name =>
      val fn = qmap.getOrElse(name,
        sys.error(s"bench headline query $name missing from SparkEntry.queries"))
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      name -> (System.nanoTime() - t0) / 1e9
    }
    spark.stop()

    // ---- part 2: crawl throughput at N and 4N parallelism ----
    crawlOnce(8, math.min(seeds / 8, 50000), rounds) // JIT warmup
    val (f2a, s2a) = crawlOnce(2, seeds, rounds)
    val (f8a, s8a) = crawlOnce(8, seeds, rounds)
    val (_, s2b) = crawlOnce(2, seeds, rounds)
    val (_, s8b) = crawlOnce(8, seeds, rounds)
    val (f32, s32) = crawlOnce(32, seeds, rounds)
    val s2 = math.min(s2a, s2b); val s8 = math.min(s8a, s8b)
    val urls = f2a
    val thr2 = urls / s2
    val thr8 = urls / s8
    val thr32 = f32 / s32
    val eff = (thr8 / thr2) / 4.0

    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val totalQuerySec = results.map(_._2).sum
    println(
      f"""{"metric":"frontier throughput (URLs fetched+converted/sec) at local[32]","value":$thr32%.1f,"unit":"urls/sec","queries":$qs,"sf":"$sfDir","crawl":{"urls_per_run":$urls,"n_pair":"local[2] -> local[8]","sec_n_best":$s2%.2f,"sec_n_runs":[$s2a%.2f,$s2b%.2f],"urls_per_sec_n":$thr2%.1f,"sec_4n_best":$s8%.2f,"sec_4n_runs":[$s8a%.2f,$s8b%.2f],"urls_per_sec_4n":$thr8%.1f,"scaling_efficiency_n_to_4n":$eff%.3f,"urls_local32":$f32,"sec_local32":$s32%.2f,"urls_per_sec_local32":$thr32%.1f},"total_query_sec":$totalQuerySec%.2f}""")
  }
}
