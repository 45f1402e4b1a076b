package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch smoke main for the driver's `SparkEntry.entry` contract:
  * build the flagship frame at local[8] and assert rows > 0. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]").appName("entry-smoke")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val n = graft.SparkEntry.entry(spark).count()
    println(s"ENTRY_SMOKE rows=$n")
    assert(n > 0, "entry returned no rows")
    spark.stop()
  }
}
