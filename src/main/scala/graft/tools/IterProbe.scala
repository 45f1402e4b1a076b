package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Builder-only experiment harness for the iterative graph tier: times
  * ONE PageRank-style round (the linkAuthority/trustRank/weightedAuthority
  * per-round shape) and one HITS half-step at sf0.1 under the Bench
  * session config, with and without pre-partitioned persisted edge
  * frames, and prints the EXECUTED (AQE-final) plans — the per-round
  * plans never appear in a query-level explain because the loop
  * checkpoints eagerly. Not part of the driver contract.
  *
  * `runMain graft.tools.IterProbe <sfDir>`
  */
object IterProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val fastDir = if (new java.io.File("/dev/shm").isDirectory) "/dev/shm"
      else System.getProperty("java.io.tmpdir")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", s"$fastDir/graft-spark-local")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val mx = orders.agg(max("o_orderkey")).first().getLong(0)
    val edges = spark.read.parquet(s"$sfDir/lineitem.parquet").select(
      col("l_orderkey").as("src"),
      (pmod(col("l_orderkey") + col("l_partkey") * 7, lit(mx)) + 1).as("dst"))

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    // ---- PageRank round: plain persisted eDeg vs pre-partitioned ----
    def prRound(label: String, partitioned: Boolean): Unit = {
      val e = edges
      val nodes = e.select(col("src").as("id"))
        .unionByName(e.select(col("dst").as("id"))).distinct()
        .localCheckpoint(true)
      val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      val eDeg0 = e.join(outdeg, "src")
      val eDeg = (if (partitioned) eDeg0.repartition(col("src")) else eDeg0)
        .persist(StorageLevel.MEMORY_AND_DISK)
      noop(eDeg) // materialize the cache outside the timed rounds
      var ranks = nodes.select(col("id"), lit(1000000L).as("rank"))
      var last: DataFrame = null
      (1 to 3).foreach { i =>
        val contrib = eDeg.join(ranks, eDeg("src") === ranks("id"))
          .select(col("dst"), expr("rank DIV outdeg").as("share"))
          .groupBy(col("dst")).agg(sum(col("share")).as("m"))
        val next = nodes.join(contrib, nodes("id") === contrib("dst"), "left")
          .select(col("id"),
            (lit(150000L) + expr("(bigint(85) * coalesce(m, bigint(0))) DIV 100")).as("rank"))
        val ck = time(s"$label round$i")(next.localCheckpoint(true))
        if (i == 1) last = ck
        ranks = ck
      }
      if (sys.env.get("SPARK_GRAFT_PROBE_EXPLAIN").contains("1")) {
        println(s"==== $label round-1 executed plan ====")
        println(last.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      }
      eDeg.unpersist()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    // ---- HITS half-step: plain e vs dst-partitioned e ----
    def hitsHalf(label: String, partitioned: Boolean): Unit = {
      val e0 = edges
      val e = (if (partitioned) e0.repartition(col("dst")) else e0)
        .persist(StorageLevel.MEMORY_AND_DISK)
      noop(e)
      val raw = e.groupBy(col("dst").as("id"))
        .agg((count(lit(1)) * 1000000L).as("raw"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val total = time(s"$label auth1-total")(
        raw.agg(sum(col("raw"))).head().getLong(0))
      val a = raw.select(col("id"), expr(s"raw * 1000000L DIV ${math.max(total, 1L)}L").as("s"))
        .localCheckpoint(false)
      val rh = e.join(a, e("dst") === a("id"))
        .groupBy(col("src").as("id")).agg(sum(col("s")).as("raw"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val t2 = time(s"$label hub1-total")(
        rh.agg(sum(col("raw"))).head().getLong(0))
      println(s"PROBE $label totals=$total/$t2")
      if (sys.env.get("SPARK_GRAFT_PROBE_EXPLAIN").contains("1")) {
        println(s"==== $label hub1 raw executed plan ====")
        println(rh.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      }
      e.unpersist(); raw.unpersist(); rh.unpersist()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    // interleave variants so JIT/host noise hits both
    (1 to 2).foreach { rep =>
      prRound(s"pr-plain rep$rep", partitioned = false)
      prRound(s"pr-part  rep$rep", partitioned = true)
      hitsHalf(s"hits-plain rep$rep", partitioned = false)
      hitsHalf(s"hits-part  rep$rep", partitioned = true)
    }
    spark.stop()
  }
}
