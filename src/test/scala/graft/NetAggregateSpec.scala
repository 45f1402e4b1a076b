package graft

import graft.operators.NetAggregate
import graft.operators.NetAggregate.ResourceEvent
import org.apache.spark.sql.functions._

/** The typed single-pass A1 aggregator vs the relational five-agg form
  * on the same data, plus the origin cap and arg-max determinism.
  */
class NetAggregateSpec extends SparkSpec {

  test("typed aggregator equals the relational aggregates on driver events") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(
        (col("user_id") % 10).cast("long").as("conv"),
        (col("user_id") % 64).cast("string").as("origin"),
        concat(lit("r"), col("event_id")).as("url"),
        abs(col("value") * 100).cast("long").as("bytes"),
        (col("event_type") === "error").as("failed"))
    val typed = ev.select(col("conv"), struct("origin", "url", "bytes", "failed").as("e"))
      .as[(Long, ResourceEvent)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(NetAggregate.agg.toColumn)
      .collect().toMap
    val relational = ev.groupBy("conv").agg(
        count(lit(1)).as("n"), sum("bytes").as("b"),
        sum(when(col("failed"), 1L).otherwise(0L)).as("f"),
        least(count_distinct(col("origin")), lit(64L)).as("o"),
        max("bytes").as("hb"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    relational.foreach { case (conv, (n, b, f, o, hb)) =>
      val s = typed(conv)
      assert(s.n_requests === n, s"conv $conv requests")
      assert(s.bytes_total === b)
      assert(s.n_failed === f)
      assert(s.n_origins === o)
      assert(s.heaviest_bytes === hb)
    }
  }

  test("origin tracking caps at 64 like the reference (maxTrackedOrigins)") {
    import spark.implicits._
    val events = (0 until 200).map(i =>
      ResourceEvent(s"origin$i", s"u$i", 10L, failed = false)).toDS()
    val s = events.groupByKey(_ => 1).agg(NetAggregate.agg.toColumn).collect()(0)._2
    assert(s.n_origins === 64L)
    assert(s.origins_capped)
  }

  test("heaviest arg-max is merge-order independent (ties → first URL)") {
    import spark.implicits._
    val events = Seq(
      ResourceEvent("o", "zzz", 100L, failed = false),
      ResourceEvent("o", "aaa", 100L, failed = false),
      ResourceEvent("o", "mid", 50L, failed = true)).toDS().repartition(3)
    val s = events.groupByKey(_ => 1).agg(NetAggregate.agg.toColumn).collect()(0)._2
    assert(s.heaviest_url === "aaa" && s.heaviest_bytes === 100L)
    assert(s.n_failed === 1L)
  }
}
