package graft

import graft.operators.JoinOps
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** As-of and range join operators vs straight-line brute force. */
class JoinOpsSpec extends SparkSpec {
  import spark.implicits._


  // ---- asofJoin ----

  test("asofJoin: latest right row at-or-before each left ts, per key; LEFT semantics") {
    val left = Seq((1L, "a", 10L), (2L, "a", 5L), (3L, "b", 7L), (4L, "c", 9L))
      .toDF("lid", "k", "t")
    val right = Seq((100L, "a", 3L, 1.0), (101L, "a", 10L, 2.0), (102L, "a", 11L, 3.0),
      (103L, "b", 8L, 4.0)).toDF("rid", "k", "t", "v")
    val got = JoinOps.asofJoin(left, right, key = "k", ts = "t",
        ridCol = "rid", rightCols = Seq("v"))
      .select("lid", "matched_rid", "matched_v")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getDouble(2))))).toMap
    assert(got(1L) === Some((101L, 2.0))) // equal ts matches
    assert(got(2L) === Some((100L, 1.0)))
    assert(got(3L) === None)              // only later right rows
    assert(got(4L) === None)              // key never on the right
  }

  test("asofJoin: NULL keys never match (equi-join semantics, both sides)") {
    // Spark windows put every NULL partition key in ONE partition — an
    // unguarded union-window form would hand a NULL-key left row the
    // latest NULL-key right payload, where ASOF (and the q68 DuckDB
    // oracle) treats NULL = NULL as false
    val left = Seq((1L, Option("a"), 10L), (2L, Option.empty[String], 10L))
      .toDF("lid", "k", "t")
    val right = Seq((100L, Option("a"), 5L, 1.0), (101L, Option.empty[String], 5L, 2.0))
      .toDF("rid", "k", "t", "v")
    val got = JoinOps.asofJoin(left, right, "k", "t", "rid", Seq("v"))
      .select("lid", "matched_rid")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(1L) === Some(100L)) // real key still matches
    assert(got(2L) === None)       // NULL key: no match, row survives (LEFT)
  }

  test("asofJoin: right-ts ties break to the greatest rid (deterministic)") {
    val left = Seq((1L, "a", 10L)).toDF("lid", "k", "t")
    val right = Seq((5L, "a", 4L, 1.0), (9L, "a", 4L, 2.0), (7L, "a", 4L, 3.0))
      .toDF("rid", "k", "t", "v")
    val got = JoinOps.asofJoin(left, right, "k", "t", "rid", Seq("v"))
      .select("matched_rid", "matched_v").head()
    assert(got.getLong(0) === 9L && got.getDouble(1) === 2.0)
  }

  test("property: asofJoin equals brute force and is partitioning-invariant") {
    val gen = for {
      nl <- Gen.choose(1, 25)
      nr <- Gen.choose(0, 25)
      lrows <- Gen.listOfN(nl, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(0L, 20L)))
      rrows <- Gen.listOfN(nr, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(0L, 20L)))
    } yield (
      lrows.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) },
      rrows.zipWithIndex.map { case ((k, t), i) => (100L + i, k, t, i / 10.0) })
    sample(gen, 15, 13L) { case (lrows, rrows) =>
      val expect = lrows.map { case (lid, k, t) =>
        val cands = rrows.filter(r => r._2 == k && r._3 <= t)
        lid -> (if (cands.isEmpty) None
                else Some(cands.maxBy(r => (r._3, r._1))).map(r => (r._1, r._4)))
      }.toMap
      Seq(1, 7).foreach { parts =>
        val got = JoinOps.asofJoin(
            lrows.toDF("lid", "k", "t").repartition(parts),
            rrows.toDF("rid", "k", "t", "v").repartition(parts),
            "k", "t", "rid", Seq("v"))
          .select("lid", "matched_rid", "matched_v")
          .collect().map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getDouble(2))))).toMap
        assert(got === expect, s"l=$lrows r=$rrows parts=$parts")
      }
    }
  }

  // ---- rangeJoin ----

  test("rangeJoin: boundary semantics lo ≤ p < hi, no duplicate pairs across buckets") {
    val ranges = Seq((1L, "a", 0.0, 5.0), (2L, "a", -3.0, 1.0), (3L, "b", 0.0, 100.0))
      .toDF("range_id", "k", "lo", "hi")
    val points = Seq(("a", 0.0), ("a", 4.999), ("a", 5.0), ("a", -3.0), ("b", 50.0))
      .toDF("k", "p")
    val got = JoinOps.rangeJoin(ranges, points, "k", "range_id", "lo", "hi", "p", 2.0)
      .select("range_id", "p").as[(Long, Double)].collect().toSeq
    // no duplicates even though range 3 spans 51 buckets
    assert(got.size === got.distinct.size)
    assert(got.toSet === Set((1L, 0.0), (1L, 4.999), (2L, 0.0), (2L, -3.0), (3L, 50.0)))
  }

  test("property: rangeJoin equals the theta join at any bucket width, negatives included") {
    val gen = for {
      nr <- Gen.choose(0, 12)
      np <- Gen.choose(0, 30)
      w <- Gen.oneOf(0.5, 1.0, 3.0, 10.0)
      ranges <- Gen.listOfN(nr, Gen.zip(Gen.oneOf("a", "b"),
        Gen.choose(-20, 20).map(_ / 2.0), Gen.choose(1, 12).map(_ / 2.0)))
      points <- Gen.listOfN(np, Gen.zip(Gen.oneOf("a", "b"), Gen.choose(-25, 25).map(_ / 2.0)))
    } yield (
      ranges.zipWithIndex.map { case ((k, lo, width), i) => (i.toLong, k, lo, lo + width) },
      points, w)
    sample(gen, 15, 13L) { case (ranges, points, w) =>
      val expect = (for {
        (rid, k, lo, hi) <- ranges
        (pk, p) <- points if pk == k && p >= lo && p < hi
      } yield (rid, p)).groupBy(identity).view.mapValues(_.size).toMap
      val got = JoinOps.rangeJoin(ranges.toDF("range_id", "k", "lo", "hi"),
          points.toDF("k", "p"), "k", "range_id", "lo", "hi", "p", w)
        .select("range_id", "p").as[(Long, Double)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(got === expect, s"ranges=$ranges points=$points w=$w")
    }
  }

  // ---- saltedSkewJoin ----

  test("saltedSkewJoin: equals the plain join on a hot key, at several salt counts") {
    // one key holds 90% of the fact side — the shape salting exists for
    val fact = ((1 to 90).map(i => (i.toLong, "hot", i * 1.5)) ++
      (91 to 100).map(i => (i.toLong, s"cold${i % 3}", i * 1.5)))
      .toDF("rid", "k", "v")
    val dim = Seq(("hot", 10.0), ("cold0", 20.0), ("cold1", 30.0),
      ("missing", 99.0)).toDF("k", "w")
    val plain = fact.join(dim, Seq("k")).select("rid", "k", "v", "w")
      .as[(Long, String, Double, Double)].collect().sorted.toSeq
    for (n <- Seq(1, 2, 16, 64)) {
      val got = JoinOps.saltedSkewJoin(fact, dim, "k", "rid", n)
        .select("rid", "k", "v", "w")
        .as[(Long, String, Double, Double)].collect().sorted.toSeq
      assert(got === plain, s"numSalts=$n")
    }
  }

  test("property: saltedSkewJoin equals the plain join, duplicate dim keys included") {
    // dim rows replicate ×numSalts; a fact row must still meet each
    // matching dim ROW exactly once (multiplicity preserved)
    val gen = for {
      nf <- Gen.choose(0, 40)
      nd <- Gen.choose(0, 10)
      n <- Gen.oneOf(1, 3, 8, 32)
      fact <- Gen.listOfN(nf, Gen.zip(Gen.choose(0L, 500L), Gen.oneOf("a", "b", "c")))
      dim <- Gen.listOfN(nd, Gen.zip(Gen.oneOf("a", "b", "c", "d"), Gen.choose(0, 9)))
    } yield (fact, dim, n)
    sample(gen, 12, 13L) { case (fact, dim, n) =>
      val expect = (for {
        (rid, k) <- fact
        (dk, w) <- dim if dk == k
      } yield (rid, k, w)).groupBy(identity).view.mapValues(_.size).toMap
      val got = JoinOps.saltedSkewJoin(
          fact.toDF("rid", "k"), dim.toDF("k", "w"), "k", "rid", n)
        .select("rid", "k", "w").as[(Long, String, Int)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(got === expect, s"fact=$fact dim=$dim n=$n")
    }
  }
}
