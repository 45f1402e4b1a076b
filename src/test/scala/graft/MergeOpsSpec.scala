package graft

import graft.operators.MergeOps
import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen

class MergeOpsSpec extends SparkSpec {
  import spark.implicits._

  private def rowSet(df: DataFrame): Set[(Long, Long, String)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  test("upsert = last-writer-wins vs brute force (updates, inserts, duplicate versions)") {
    val gen = for {
      nb <- Gen.choose(0, 60)
      nd <- Gen.choose(0, 60)
      base <- Gen.listOfN(nb, Gen.zip(Gen.choose(0L, 30L), Gen.choose(0L, 5L), Gen.oneOf("p", "q")))
      delta <- Gen.listOfN(nd, Gen.zip(Gen.choose(0L, 40L), Gen.choose(0L, 5L), Gen.oneOf("x", "y", "z")))
      bcast <- Gen.oneOf(true, false)
    } yield (base.distinctBy(_._1), delta, bcast) // base: one row per key
    sample(gen, 15, 5L) { case (base, delta, bcast) =>
      val b = base.toDF("k", "rev", "payload")
      val d = delta.toDF("k", "rev", "payload")
      val got = rowSet(MergeOps.upsert(b, d, Seq("k"), "rev", broadcastDelta = bcast))
      // brute force: per delta key the lexicographically greatest
      // (rev, payload); base rows only for keys absent from the delta
      val latest = delta.groupBy(_._1).map { case (k, rs) =>
        val (_, rev, p) = rs.maxBy(r => (r._2, r._3))
        (k, rev, p)
      }.toSet
      val expect = base.filterNot(r => latest.exists(_._1 == r._1)).toSet ++ latest
      assert(got === expect)
    }
  }

  test("upsert with an empty delta is the base; with an empty base is the deduped delta") {
    val b = Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("k", "rev", "payload")
    val empty = Seq.empty[(Long, Long, String)].toDF("k", "rev", "payload")
    assert(rowSet(MergeOps.upsert(b, empty, Seq("k"), "rev")) ===
      Set((1L, 1L, "a"), (2L, 1L, "b")))
    val d = Seq((7L, 1L, "x"), (7L, 3L, "y"), (8L, 2L, "z")).toDF("k", "rev", "payload")
    assert(rowSet(MergeOps.upsert(empty, d, Seq("k"), "rev")) ===
      Set((7L, 3L, "y"), (8L, 2L, "z")))
  }

  test("upsert rejects mismatched schemas and non-payload version columns") {
    val b = Seq((1L, 1L, "a")).toDF("k", "rev", "payload")
    val bad = Seq((1L, 1L)).toDF("k", "rev")
    intercept[IllegalArgumentException](MergeOps.upsert(b, bad, Seq("k"), "rev"))
    intercept[IllegalArgumentException](MergeOps.upsert(b, b, Seq("k", "rev"), "rev"))
  }

  // ---- scd2 ----

  test("scd2 collapses consecutive duplicates into validity intervals (vs brute force)") {
    val gen = for {
      n <- Gen.choose(0, 80)
      rows <- Gen.listOfN(n, Gen.zip(
        Gen.choose(0L, 4L), // key
        Gen.choose(0L, 50L), // ts
        Gen.option(Gen.oneOf("a", "b", "c")))) // value (nullable)
    } yield rows.zipWithIndex.map { case ((k, ts, v), i) => (k, ts, v, i.toLong) }
    sample(gen, 15, 31L) { rows =>
      val got = MergeOps.scd2(rows.toDF("k", "ts", "v", "tie"),
          Seq("k"), "ts", "v", "tie")
        .select("k", "v", "valid_from", "valid_to", "is_current")
        .as[(Long, Option[String], Long, Option[Long], Boolean)]
        .collect().toSet
      val expect = rows.groupBy(_._1).flatMap { case (k, rs) =>
        val ordered = rs.sortBy(r => (r._2, r._4))
        // keep rows whose value differs from the previous row's
        val kept = ordered.foldLeft(Vector.empty[(Long, Option[String])]) {
          case (acc, (_, ts, v, _)) =>
            if (acc.isEmpty || acc.last._2 != v) acc :+ (ts, v) else acc
        }
        kept.zipWithIndex.map { case ((ts, v), i) =>
          val to = if (i + 1 < kept.size) Some(kept(i + 1)._1) else None
          (k, v, ts, to, to.isEmpty)
        }
      }.toSet
      assert(got === expect)
    }
  }

  test("scd2 shuffles the change stream once (shared exchange across both windows)") {
    val df = (0 until 50).map(i => ((i % 5).toLong, (i / 5).toLong, s"v${i % 3}", i.toLong))
      .toDF("k", "ts", "v", "tie")
    val plan = MergeOps.scd2(df, Seq("k"), "ts", "v", "tie")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected one key exchange, plan:\n$plan")
  }
}
