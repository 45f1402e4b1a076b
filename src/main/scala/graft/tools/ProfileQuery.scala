package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query profiler: `runMain graft.tools.ProfileQuery <sfDir>
  * <query...>` times each named query (noop write, best of N via
  * SPARK_GRAFT_PROFILE_REPS) at local[SPARK_GRAFT_CPUS]. Not part of
  * the driver contract — a builder tool for plan iteration.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "2").toInt
    val fastDir = if (new java.io.File("/dev/shm").isDirectory) "/dev/shm"
      else System.getProperty("java.io.tmpdir")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", s"$fastDir/graft-spark-local")
      .config("spark.sql.session.timeZone", "UTC")
      // match Bench.newSession exactly so profiled plans/timings predict
      // the bench's (the default 10MB threshold changes join strategies)
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qmap = graft.SparkEntry.queries
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")
    names.foreach { name =>
      val fn = qmap(name)
      if (explain) {
        println(s"## $name\n")
        println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      } else {
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          // bench isolates passes the same way — without this, queries
          // that persist internal frames read their own warm cache on
          // rep 2+ and the profile understates the bench number
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
          dt
        }
        println(f"PROFILE $name best=${times.min}%.2fs runs=${times.map(t => f"$t%.2f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
