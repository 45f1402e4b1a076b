package graft

import graft.datatools.Funnel
import org.scalacheck.Gen

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  test("funnel = greedy-earliest chain vs brute force (random event streams)") {
    val stages = Seq("a", "b", "c")
    val gen = for {
      n <- Gen.choose(0, 120)
      rows <- Gen.listOfN(n, Gen.zip(
        Gen.choose(0L, 6L), // user
        Gen.choose(0L, 40L), // ts
        Gen.oneOf("a", "b", "c", "x"))) // x = noise stage
    } yield rows.zipWithIndex.map { case ((u, ts, t), i) => (i.toLong, u, ts, t) }
    sample(gen, 15, 41L) { rows =>
      val got = Funnel.funnel(rows.toDF("event_id", "user_id", "ts", "event_type"),
          stages)
        .as[(Long, Option[Long], Option[Long], Option[Long], Long)]
        .collect().map(r => r._1 -> ((r._2, r._3, r._4), r._5)).toMap
      val expect = rows.groupBy(_._2).flatMap { case (u, es) =>
        def earliest(stage: String, after: Option[Long]): Option[Long] = {
          val c = es.filter(e => e._4 == stage && after.forall(e._3 > _)).map(_._3)
          if (c.isEmpty) None else Some(c.min)
        }
        earliest("a", None).map { t0 =>
          val t1 = earliest("b", Some(t0))
          val t2 = t1.flatMap(t => earliest("c", Some(t)))
          u -> (((Some(t0): Option[Long]), t1, t2),
            1L + t1.size + t2.size)
        }
      }
      assert(got === expect)
    }
  }

  test("funnel depth semantics: strict ordering, same-timestamp events do not chain") {
    val rows = Seq(
      (1L, 10L, "a"), (1L, 10L, "b"), (1L, 11L, "c"), // b NOT after a (same ts)
      (2L, 10L, "a"), (2L, 11L, "b"), (2L, 11L, "c"), // c NOT after b
      (3L, 10L, "a"), (3L, 11L, "b"), (3L, 12L, "c"), // full chain
      (4L, 5L, "b"), (4L, 6L, "c")) // never enters (no stage a)
      .toDF("user_id", "ts", "event_type")
    val got = Funnel.funnel(rows, Seq("a", "b", "c"))
      .select("user_id", "depth")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }
}
