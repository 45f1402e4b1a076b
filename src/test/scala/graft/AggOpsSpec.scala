package graft

import graft.operators.{AggOps, JoinOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Incremental agg-state maintenance, salted aggregation, and the
  * bloom-pruned join vs their single-shot equivalents.
  */
class AggOpsSpec extends SparkSpec {
  import spark.implicits._


  private def stateMap(df: DataFrame): Map[String, (Long, Double, Double, Double)] =
    df.select(col("k"), col("cnt"), round(col("sum_v"), 6), col("min_v"), col("max_v"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap

  // ---- mergeAggState ----

  test("mergeAggState: state ⊕ delta equals the full recompute, incl. delta-only keys") {
    val base = Seq(("a", 1.0), ("a", 2.0), ("b", -1.0)).toDF("k", "v")
    val delta = Seq(("a", 10.0), ("c", 5.0)).toDF("k", "v")
    val merged = AggOps.mergeAggState(
      AggOps.buildAggState(base, Seq("k"), "v"), delta, Seq("k"), "v")
    val full = AggOps.buildAggState(base.unionByName(delta), Seq("k"), "v")
    assert(stateMap(merged) === stateMap(full))
    assert(stateMap(merged)("c") === ((1L, 5.0, 5.0, 5.0)))
  }

  test("mergeAggState: empty delta is a no-op; repeated folds accumulate") {
    val base = Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v")
    val state = AggOps.buildAggState(base, Seq("k"), "v")
    val noop = AggOps.mergeAggState(state, base.limit(0), Seq("k"), "v")
    assert(stateMap(noop) === stateMap(state))
    val d1 = Seq(("a", 3.0)).toDF("k", "v")
    val d2 = Seq(("a", -7.0), ("b", 0.5)).toDF("k", "v")
    val twice = AggOps.mergeAggState(
      AggOps.mergeAggState(state, d1, Seq("k"), "v"), d2, Seq("k"), "v")
    val full = AggOps.buildAggState(
      base.unionByName(d1).unionByName(d2), Seq("k"), "v")
    assert(stateMap(twice) === stateMap(full))
  }

  test("property: mergeAggState equals full recompute at any base/delta split") {
    val gen = for {
      n <- Gen.choose(1, 40)
      rows <- Gen.listOfN(n, Gen.zip(Gen.oneOf("a", "b", "c", "d"),
        Gen.choose(-100, 100).map(_ / 4.0)))
      cut <- Gen.choose(0, n)
    } yield (rows, cut)
    sample(gen, 12, 29L) { case (rows, cut) =>
      val (b, d) = rows.splitAt(cut)
      val base = b.toDF("k", "v")
      val delta = d.toDF("k", "v")
      val merged = AggOps.mergeAggState(
        AggOps.buildAggState(base, Seq("k"), "v"), delta, Seq("k"), "v")
      val full = AggOps.buildAggState(rows.toDF("k", "v"), Seq("k"), "v")
      assert(stateMap(merged) === stateMap(full))
    }
  }

  // ---- saltedAgg ----

  test("saltedAgg: equals the plain groupBy at several salt counts, hot key included") {
    // one hot key holding ~80% of rows — the shape salting exists for
    val rows = (0 until 400).map(i =>
      (i.toLong, if (i % 5 == 0) ("cold" + (i % 3)) else "hot", i / 7.0))
    val df = rows.toDF("id", "k", "v")
    val plain = stateMap(df.groupBy(col("k")).agg(
      count(lit(1)).as("cnt"), sum(col("v")).as("sum_v"),
      min(col("v")).as("min_v"), max(col("v")).as("max_v")))
    for (salts <- Seq(1, 2, 32)) {
      val got = stateMap(AggOps.saltedAgg(df, Seq("k"), "v", "id", salts))
      assert(got === plain, s"numSalts=$salts")
    }
  }

  test("property: saltedAgg is partitioning-invariant and salt-count-invariant") {
    val gen = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, Gen.zip(Gen.oneOf("x", "y"),
        Gen.choose(-50, 50).map(_ / 3.0)))
      salts <- Gen.oneOf(1, 3, 8, 32)
      parts <- Gen.oneOf(1, 2, 7)
    } yield (rows.zipWithIndex.map { case ((k, v), i) => (i.toLong, k, v) }, salts, parts)
    sample(gen, 12, 29L) { case (rows, salts, parts) =>
      val df = rows.toDF("id", "k", "v").repartition(parts)
      val plain = stateMap(df.groupBy(col("k")).agg(
        count(lit(1)).as("cnt"), sum(col("v")).as("sum_v"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v")))
      assert(stateMap(AggOps.saltedAgg(df, Seq("k"), "v", "id", salts)) === plain)
    }
  }

  // ---- bloomPrunedJoin ----

  test("bloomPrunedJoin: exactly the plain inner join — no fp leakage, no drops") {
    val fact = (0L until 500L).map(i => (i, s"row$i")).toDF("fk", "payload")
    val dim = Seq((3L, "a"), (250L, "b"), (499L, "c"), (9999L, "d"))
      .toDF("dk", "attr")
    val got = JoinOps.bloomPrunedJoin(fact, dim, "fk", "dk", expectedDimRows = 10L)
      .select("fk", "attr").as[(Long, String)].collect().sorted.toSeq
    assert(got === Seq((3L, "a"), (250L, "b"), (499L, "c")))
  }

  test("property: bloomPrunedJoin equals the plain join at any fpp / key overlap") {
    val gen = for {
      nf <- Gen.choose(0, 80)
      nd <- Gen.choose(0, 20)
      fks <- Gen.listOfN(nf, Gen.choose(0L, 60L))
      dks <- Gen.listOfN(nd, Gen.choose(0L, 60L))
      fpp <- Gen.oneOf(0.5, 0.03) // high fpp exercises fp-survival → join kill
    } yield (fks, dks.distinct, fpp)
    sample(gen, 12, 29L) { case (fks, dks, fpp) =>
      val fact = fks.zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("fk", "fid")
      val dim = dks.map(k => (k, s"d$k")).toDF("dk", "attr")
      val got = JoinOps.bloomPrunedJoin(fact, dim, "fk", "dk",
          expectedDimRows = math.max(1L, dks.size.toLong), fpp = fpp)
        .select("fid", "dk").as[(Long, Long)].collect().sorted.toSeq
      val want = (for { (k, i) <- fks.zipWithIndex; d <- dks if d == k }
        yield (i.toLong, d)).sorted
      assert(got === want)
    }
  }
}
