package graft

import graft.datatools.Dedup
import graft.streaming.StreamingDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming near-dup vs the batch oracle: the DISTINCT pair set
  * emitted across micro-batches equals one batch simhashPairs run over
  * every doc fed — in-batch pairs, cross-batch pairs (state), and
  * nothing invented.
  */
class StreamingDedupSpec extends SparkSpec {

  // long docs so a one-token edit stays within the hamming radius
  private def doc(i: Int, edit: Boolean = false): (String, String) = {
    val toks = (0 until 200).map(j => s"s${i}t$j").toArray
    if (edit) toks(77) = "CHANGED"
    (if (edit) f"dup$i%03d" else f"doc$i%03d", toks.mkString(" "))
  }

  test("distinct streamed pairs == batch simhashPairs over all fed docs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch1 = (0 until 10).map(doc(_))                     // 10 bases
    val batch2 = (0 until 5).map(doc(_, edit = true)) ++      // near-dups of 0-4
      (10 until 14).map(doc(_))                               // fresh bases
    val input = MemoryStream[(String, String)]
    val out = StreamingDedup.simhashPairsStream(spark, input.toDS(), maxDist = 12)
    val query = out.writeStream.format("memory").queryName("streamdup")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(batch1: _*)
      query.processAllAvailable()
      val afterB1 = spark.table("streamdup").count()
      input.addData(batch2: _*)
      query.processAllAvailable()
      val streamed = spark.table("streamdup")
        .select("id_a", "id_b", "hamming").distinct().collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
      val batchPairs = Dedup.simhashPairs(
        (batch1 ++ batch2).toDF("doc_id", "text"), maxDist = 12)
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
      assert(batchPairs.nonEmpty, "fixture produced no pairs")
      assert(streamed === batchPairs)
      // the planted pairs are cross-batch: base in batch 1, dup in
      // batch 2 — found only through state, not in-batch collision
      assert(spark.table("streamdup").count() > afterB1,
        "batch 2 emitted nothing — state path not exercised")
      // planted pairs are cross-batch (base fed in batch 1, dup in
      // batch 2) — found only through state. 4×16 banding is a
      // recall/cost trade (a pair whose diff bits spread across all 4
      // bands collides in none — DatatoolsSpec documents the same),
      // so require MOST planted pairs, and the batch-equality assert
      // above already proves streaming loses nothing batch finds.
      val planted = (0 until 5).count { i =>
        streamed.exists { case (a, b, _) => a == f"doc$i%03d" && b == f"dup$i%03d" }
      }
      assert(planted >= 3, s"only $planted/5 planted cross-batch pairs found")
    } finally query.stop()
  }

  test("re-fed doc id does not self-pair; empty batch emits nothing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val out = StreamingDedup.simhashPairsStream(spark, input.toDS(), maxDist = 12)
    val query = out.writeStream.format("memory").queryName("streamdup2")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(doc(0))
      query.processAllAvailable()
      input.addData(doc(0)) // same id, same text — at-least-once replay
      query.processAllAvailable()
      val pairs = spark.table("streamdup2").collect()
      assert(pairs.forall(r => r.getString(0) != r.getString(1)))
      assert(!pairs.exists(r => r.getString(0) == "doc000" && r.getString(1) == "doc000"))
      // replay idempotence: state keeps ONE entry per doc per band —
      // a neighbor pairs with doc000 once per colliding band as usual,
      // and a FURTHER replay of doc000 after that emits nothing new
      // (the un-guarded version would re-pair the replayed row against
      // everything in state)
      input.addData(doc(0, edit = true)) // near-dup neighbor
      query.processAllAvailable()
      val withNeighbor = spark.table("streamdup2").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      assert(withNeighbor.contains("doc000" -> "dup000"), "neighbor pair missing")
      input.addData(doc(0)) // third replay, now with dup000 in state
      query.processAllAvailable()
      assert(spark.table("streamdup2").count() === withNeighbor.size,
        "a replayed doc id re-emitted pairs against state")
    } finally query.stop()
  }
}
