package graft

import graft.datatools.Sketches
import graft.streaming.StreamingSketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming KMV vs the batch sketch: each group's LAST emitted
  * estimate equals batch kmvDistinct over every row fed — KMV
  * insertion is order-independent, so micro-batch boundaries and
  * replays cannot change the sketch.
  */
class StreamingSketchesSpec extends SparkSpec {

  test("stream-final per-group estimate == batch kmvDistinct over all fed rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val k = 16
    val batch1 = (0 until 120).map(i => (s"g${i % 3}", s"v${i % 40}"))
    val batch2 = (0 until 90).map(i => (s"g${i % 3}", s"v${20 + (i % 50)}")) ++
      Seq(("g3", "only")) // a group born in batch 2
    val input = MemoryStream[(String, String)]
    val out = StreamingSketches.kmvDistinctStream(spark, input.toDS(), k)
    val query = out.writeStream.format("memory").queryName("streamkmv")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(batch1: _*)
      query.processAllAvailable()
      // mid-stream check: batch-1 prefix equality
      val mid = spark.table("streamkmv")
        .groupBy("g").agg(max(struct(col("n_kept"), col("kth_hash"), col("est_distinct"))).as("s"))
        .select(col("g"), col("s.est_distinct"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val batchMid = Sketches.kmvDistinct(batch1.toDF("g", "v"), "g", "v", k)
        .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
      assert(mid === batchMid)
      input.addData(batch2: _*)
      query.processAllAvailable()
      input.addData(batch1.take(30): _*) // at-least-once replay: no-op inserts
      query.processAllAvailable()
      // the FINAL emission per group: a KMV sketch only improves —
      // n_kept is nondecreasing and, at equal n_kept, kth_hash is
      // nonincreasing — so the lexicographic max of
      // (n_kept, −kth_hash) IS the latest state (no reliance on sink
      // row order)
      val finalRows = spark.table("streamkmv")
        .groupBy("g").agg(max(struct(col("n_kept"), (-col("kth_hash")).as("nk"),
          col("est_distinct"))).as("s"))
        .select(col("g"), col("s.n_kept"), (-col("s.nk")).as("kth"), col("s.est_distinct"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val batchAll = Sketches.kmvDistinct(
          (batch1 ++ batch2 ++ batch1.take(30)).toDF("g", "v"), "g", "v", k)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(finalRows === batchAll)
    } finally query.stop()
  }

  test("stream-final per-group HLL registers == batch hllDistinct over all fed rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch1 = (0 until 150).map(i => (s"g${i % 2}", s"v${i % 60}"))
    val batch2 = (0 until 80).map(i => (s"g${i % 2}", s"v${40 + (i % 70)}")) ++
      Seq(("g9", "solo"))
    val input = MemoryStream[(String, String)]
    val out = StreamingSketches.hllDistinctStream(spark, input.toDS())
    val query = out.writeStream.format("memory").queryName("streamhll")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(batch1: _*)
      query.processAllAvailable()
      input.addData(batch2: _*)
      query.processAllAvailable()
      input.addData(batch2.take(40): _*) // at-least-once replay: register max is idempotent
      query.processAllAvailable()
      // register sums only decrease as registers grow (2^30 >> reg
      // shrinks), and n_zero_regs only decreases — so the latest state
      // per group is the lexicographic MIN of (n_zero_regs, reg_sum)
      val finalRows = spark.table("streamhll")
        .groupBy("g").agg(min(struct(col("n_zero_regs"), col("reg_sum"),
          col("est_distinct"))).as("s"))
        .select(col("g"), col("s.n_zero_regs"), col("s.reg_sum"), col("s.est_distinct"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val batchAll = Sketches.hllDistinct(
          (batch1 ++ batch2 ++ batch2.take(40)).toDF("g", "v"), "g", "v")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(finalRows === batchAll)
    } finally query.stop()
  }
}
