package graft.tools

import graft.model.CrawlConfig
import graft.pipeline.CrawlJob
import graft.sources.SyntheticWeb
import org.apache.spark.sql.SparkSession

/** Ad-hoc crawl profiler: `runMain graft.tools.ProfileCrawl <threads>
  * <seeds> <rounds> [reps]` — one JVM, fresh session+store per rep,
  * prints per-rep seconds. Same universe/config as graft.Bench. Builder
  * tool only.
  */
object ProfileCrawl {
  def main(args: Array[String]): Unit = {
    val threads = args(0).toInt
    val seeds = args(1).toInt
    val rounds = args(2).toInt
    val reps = if (args.length > 3) args(3).toInt else 2
    val fastDir = if (new java.io.File("/dev/shm").isDirectory) "/dev/shm"
      else System.getProperty("java.io.tmpdir")
    val jdk17AddOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")
    (1 to reps).foreach { rep =>
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      // GRAFT_MASTER=local-cluster[N,1,4096] runs executors as separate
      // JVMs (the real-cluster stand-in); default stays local[threads]
      val master = sys.env.getOrElse("GRAFT_MASTER", s"local[$threads]")
      val builder = SparkSession.builder()
        .master(master)
        .appName(s"graft-profile-crawl-$threads")
        .config("spark.sql.shuffle.partitions",
          sys.env.getOrElse("GRAFT_PARTS", "64"))
        .config("spark.sql.adaptive.enabled", sys.env.getOrElse("GRAFT_AQE", "true"))
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", s"$fastDir/graft-spark-local")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      // A/B experiment: GRAFT_CONF_A / GRAFT_CONF_B = "k=v;k=v" — odd
      // reps apply A, even reps B, inside ONE warm JVM so JIT state is
      // shared and the delta isolates the conf change from host noise
      val abConf = if (rep % 2 == 1) sys.env.get("GRAFT_CONF_A") else sys.env.get("GRAFT_CONF_B")
      val abLabel = if (rep % 2 == 1) "A" else "B"
      abConf.toSeq.flatMap(_.split(";")).map(_.trim).filter(_.nonEmpty).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      }
      if (master.startsWith("local-cluster")) {
        builder
          .config("spark.executor.extraJavaOptions", jdk17AddOpens)
          .config("spark.executor.extraClassPath",
            new java.io.File("target/scala-2.13/classes").getAbsolutePath)
      }
      val spark = builder.getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._
      val universe = SyntheticWeb.Universe(
        numHosts = sys.env.getOrElse("GRAFT_HOSTS", "20000").toInt,
        pagesPerHost = 5000, seed = 42L, outlinksPerDoc = 4,
        spansPerDoc = sys.env.getOrElse("GRAFT_SPANS", "6").toInt)
      val cfg = CrawlConfig(
        // "graft.parts" in a GRAFT_CONF_A/B string lets the crawl's OWN
        // partitioning (the politeness repartition) participate in the
        // same-JVM A/B, not just the session shuffle partitions
        numPartitions = spark.conf.getOption("graft.parts")
          .getOrElse(sys.env.getOrElse("GRAFT_PARTS", "64")).toInt,
        saltsPerHost = 4,
        hostBudgetPerRound = 64, maxRounds = rounds,
        // sized like graft.Bench: 2x seeds keeps the fpp honest at any
        // workload (GRAFT_BLOOM_CAP overrides for sizing experiments)
        bloomExpectedItems = sys.env.get("GRAFT_BLOOM_CAP").map(_.toLong)
          .getOrElse(math.max(1L << 21, 2L * seeds)),
        // GRAFT_SHARDED=1 → per-bucket bloom shard files instead of the
        // broadcast bloom (the 10^10 escape hatch) — soak evidence for
        // BASELINE.md
        bloomSharded = sys.env.get("GRAFT_SHARDED").contains("1"),
        // "graft.dedup=true" in GRAFT_CONF_A/B (or GRAFT_DEDUP=1) turns
        // on the per-round incremental doc near-dup stage — same-JVM
        // A/B isolates its cost from host noise
        dedupDocs = spark.conf.getOption("graft.dedup").map(_.toBoolean)
          .getOrElse(sys.env.get("GRAFT_DEDUP").contains("1")),
        dedupThreshold = sys.env.getOrElse("GRAFT_DEDUP_T", "0.9").toDouble,
        dedupShingleK = sys.env.getOrElse("GRAFT_DEDUP_K", "3").toInt,
        // GRAFT_COMPACT_EVERY=k → in-crawl snapshot maintenance every k
        // rounds (compact metadata deltas, relocate history tables,
        // expire) — the `compact+expire` stage shows up in the per-stage
        // breakdown, the BASELINE.md maintenance-cost datum.
        // "graft.compactEvery" in GRAFT_CONF_A/B joins the same-JVM A/B
        // so the maintenance cost can be isolated from host noise.
        compactEvery = spark.conf.getOption("graft.compactEvery")
          .getOrElse(sys.env.getOrElse("GRAFT_COMPACT_EVERY", "0")).toInt)
      val root = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(fastDir), s"graft-profile-$threads").toString
      val taskTime = new java.util.concurrent.atomic.AtomicLong
      val gcTime = new java.util.concurrent.atomic.AtomicLong
      val taskCount = new java.util.concurrent.atomic.AtomicLong
      val stageNames = new java.util.concurrent.ConcurrentHashMap[Int, String]()
      val stageTime = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
      val stageJob = new java.util.concurrent.ConcurrentHashMap[Int, String]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val desc = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("?")
          e.stageIds.foreach(sid => stageJob.put(sid, desc))
          ()
        }
        override def onStageSubmitted(e: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit = {
          stageNames.put(e.stageInfo.stageId, e.stageInfo.name.take(60)); ()
        }
        override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          if (e.taskMetrics != null) {
            taskTime.addAndGet(e.taskMetrics.executorRunTime)
            gcTime.addAndGet(e.taskMetrics.jvmGCTime)
            stageTime.computeIfAbsent(e.stageId, _ => new java.util.concurrent.atomic.AtomicLong)
              .addAndGet(e.taskMetrics.executorRunTime)
          }
          taskCount.incrementAndGet()
          ()
        }
      })
      val t0 = System.nanoTime()
      val summary = CrawlJob.run(spark, universe.seedUrlsDS(spark, seeds),
        SyntheticWeb.defaultRobots, SyntheticWeb.hostMapDS(spark, universe.numHosts),
        universe, cfg, root)
      val secs = (System.nanoTime() - t0) / 1e9
      val util = taskTime.get() / 1000.0 / (secs * threads)
      summary.rounds.foreach { r =>
        println(s"  ROUND ${r.round}: candidates=${r.candidates} admitted=${r.admitted} " +
          s"fetched=${r.fetched} outlinks=${r.outlinks} seen_total=${r.seenTotal}")
      }
      println(f"PROFILE-CRAWL threads=$threads rep=$rep conf=$abLabel secs=$secs%.2f urls=${summary.rounds.map(_.fetched).sum} task_sec=${taskTime.get() / 1000.0}%.1f gc_sec=${gcTime.get() / 1000.0}%.1f tasks=${taskCount.get()} util=$util%.2f")
      if (sys.env.get("GRAFT_STAGES").contains("1")) {
        import scala.jdk.CollectionConverters._
        stageTime.asScala.toSeq.sortBy(-_._2.get()).take(12).foreach { case (sid, t) =>
          println(f"  STAGE $sid%4d ${t.get() / 1000.0}%8.1fs  ${stageJob.getOrDefault(sid, "?")}%-16s ${stageNames.getOrDefault(sid, "?")}")
        }
        stageTime.asScala.toSeq.groupBy(kv => stageJob.getOrDefault(kv._1, "?"))
          .map { case (g, xs) => g -> xs.map(_._2.get()).sum }
          .toSeq.sortBy(-_._2).foreach { case (g, t) =>
            println(f"  JOB   ${t / 1000.0}%8.1fs  $g")
          }
      }
      spark.stop()
      // GRAFT_KEEP_STORE=1 keeps the snapshot store for post-run
      // inspection (e.g. seen-set equality across bloom deployments)
      if (sys.env.get("GRAFT_KEEP_STORE").contains("1")) println(s"STORE $root")
      else org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }
}
