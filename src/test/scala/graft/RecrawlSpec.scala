package graft

import graft.frontier.Recrawl
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

class RecrawlSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, String, Long, String)], asOf: String) =
    Recrawl.schedule(
        rows.toDF("url", "ts_s", "tie", "fp")
          .withColumn("ts", col("ts_s").cast("timestamp")),
        "url", "ts", "tie", fpCol = col("fp"),
        asOf = lit(asOf).cast("timestamp"))
      .orderBy("url_key")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq

  test("schedule estimates change rate and staleness priority per URL") {
    // u1: fps A,A,B,B,C over 4 days → 4 pairs, 2 changes, rate 500000
    //     ppm; last fetch 48h before asOf → priority capped at 10⁶
    //     (500000 * 48 > 10⁶).
    // u2: single fetch → no pairs, rate 0, priority 0 at any age.
    // u3: 2 fetches 1 change, rate 10⁶, fetched 30 min before asOf →
    //     age_hours 0 → priority 0 (fresh page, nothing owed yet).
    val rows = Seq(
      ("u1", "2026-01-01 00:00:00", 1L, "A"),
      ("u1", "2026-01-02 00:00:00", 2L, "A"),
      ("u1", "2026-01-03 00:00:00", 3L, "B"),
      ("u1", "2026-01-04 00:00:00", 4L, "B"),
      ("u1", "2026-01-05 00:00:00", 5L, "C"),
      ("u2", "2026-01-06 12:00:00", 6L, "X"),
      ("u3", "2026-01-06 00:00:00", 7L, "P"),
      ("u3", "2026-01-06 23:30:00", 8L, "Q"))
    assert(run(rows, "2026-01-07 00:00:00") === Seq(
      ("u1", 4L, 2L, 500000L, 48L, 1000000L),
      ("u2", 0L, 0L, 0L, 12L, 0L),
      ("u3", 1L, 1L, 1000000L, 0L, 0L)))
  }

  test("schedule is deterministic under equal timestamps via the tiebreak") {
    // Two fetches share a timestamp; tie order decides the pair
    // sequence A,(B,B) → changes 1 of 2 — not A,(B),B ordering noise.
    val rows = Seq(
      ("u", "2026-01-01 00:00:00", 1L, "A"),
      ("u", "2026-01-02 00:00:00", 3L, "B"),
      ("u", "2026-01-02 00:00:00", 2L, "B"))
    val got = run(rows, "2026-01-02 01:00:00")
    val gotShuffled = run(rows.reverse, "2026-01-02 01:00:00")
    assert(got === Seq(("u", 2L, 1L, 500000L, 1L, 500000L)))
    assert(gotShuffled === got)
  }

  test("schedule matches brute force on random fetch histories") {
    val gen = for {
      n <- Gen.choose(0, 40)
      rows <- Gen.listOfN(n, for {
        u <- Gen.oneOf("a", "b", "c")
        day <- Gen.choose(1, 9)
        hour <- Gen.oneOf(0, 6, 12)
        fp <- Gen.oneOf("x", "y")
      } yield (u, f"2026-01-0$day%d $hour%02d:00:00", fp))
    } yield rows.zipWithIndex.map { case ((u, t, f), i) => (u, t, i.toLong, f) }
    val asOf = "2026-01-10 00:00:00"
    val asOfUs = java.time.Instant.parse("2026-01-10T00:00:00Z").toEpochMilli * 1000L
    sample(gen, 12, 90L) { rows =>
      val expect = rows.groupBy(_._1).toSeq.map { case (u, xs) =>
        val sorted = xs.sortBy(r => (r._2, r._3))
        val pairs = sorted.map(_._4).zip(sorted.map(_._4).drop(1))
        val nObs = pairs.size.toLong
        val nChanges = pairs.count { case (a, b) => a != b }.toLong
        val rate = if (nObs > 0) nChanges * 1000000L / nObs else 0L
        val lastUs = java.time.Instant
          .parse(sorted.last._2.replace(" ", "T") + "Z").toEpochMilli * 1000L
        val age = (asOfUs - lastUs) / 3600000000L
        (u, nObs, nChanges, rate, age, math.min(1000000L, rate * age))
      }.sortBy(_._1)
      assert(run(rows, asOf) === expect, s"rows=$rows")
    }
  }

  // ---- aimdRates ----

  /** Brute-force AIMD fold in (ts, tie) order. */
  private def bruteAimd(rows: Seq[(String, Long, Long, Boolean)],
                        start: Long, add: Long, cap: Long,
                        fl: Long): Map[String, (Long, Long, Long, Long)] =
    rows.groupBy(_._1).map { case (h, rs) =>
      var rate = start; var mn = start
      val ordered = rs.sortBy(r => (r._2, r._3))
      ordered.foreach { case (_, _, _, fail) =>
        rate = if (fail) math.max(rate / 2, fl) else math.min(rate + add, cap)
        mn = math.min(mn, rate)
      }
      h -> (rs.size.toLong, rs.count(_._4).toLong, rate, mn)
    }

  test("aimdRates: halve on failure, additive climb on success, floor and cap bind") {
    // host a: 3 ok then 2 fails → 1000+3·200=1600 → 800 → 400
    // host b: fails drive to the floor; host c: successes hit the cap
    val rows =
      Seq.tabulate(5)(i => ("a", i.toLong, i.toLong, i >= 3)) ++
      Seq.tabulate(6)(i => ("b", i.toLong, i.toLong, true)) ++
      Seq.tabulate(40)(i => ("c", i.toLong, i.toLong, false))
    val got = graft.frontier.Recrawl.aimdRates(
        rows.toDF("host", "ts", "tie", "fail"), "host", "ts", "tie", col("fail"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got === bruteAimd(rows, 1000, 200, 8000, 125))
    assert(got("a")._3 === 400L)
    assert(got("b")._3 === 125L && got("b")._4 === 125L) // floor binds
    assert(got("c")._3 === 8000L)                        // cap binds
  }

  test("aimdRates matches brute force and ignores input order (sort inside the row)") {
    val gen = for {
      n <- Gen.choose(0, 60)
      rows <- Gen.listOfN(n, for {
        h <- Gen.oneOf("h1", "h2", "h3")
        ts <- Gen.choose(0L, 20L)
        fail <- Gen.oneOf(true, false)
      } yield (h, ts, fail))
    } yield rows.zipWithIndex.map { case ((h, ts, f), i) => (h, ts, i.toLong, f) }
    sample(gen, 8, 55L) { rows =>
      val got = graft.frontier.Recrawl.aimdRates(
          rows.reverse.toDF("host", "ts", "tie", "fail"), "host", "ts", "tie",
          col("fail"))
        .as[(String, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
      assert(got === bruteAimd(rows, 1000, 200, 8000, 125), s"rows=$rows")
    }
  }
}
