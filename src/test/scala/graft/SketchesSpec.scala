package graft

import graft.datatools.{Sketches, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def kmvMap(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long, Long)] =
    df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

  test("kmvDistinct is exact below k and matches the closed form at or above k") {
    val gen = for {
      n <- Gen.choose(0, 400)
      rows <- Gen.listOfN(n, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(0L, 120L)))
      k <- Gen.oneOf(2, 8, 32)
      parts <- Gen.oneOf(1, 3, 7)
    } yield (rows, k, parts)
    sample(gen, 12, 7L) { case (rows, k, parts) =>
      val df = rows.toDF("g", "v").repartition(parts)
      val got = kmvMap(Sketches.kmvDistinct(df, "g", "v", k))
      val expect = rows.groupBy(_._1).map { case (g, rs) =>
        val hs = rs.map(r => TextAnalysis.md5Lower64(r._2.toString) & Sketches.Mask48)
          .distinct.sorted
        val kept = hs.take(k)
        val est =
          if (kept.size < k) kept.size.toLong
          else ((k - 1).toLong << 48) / kept.last
        g -> (kept.size.toLong, if (kept.isEmpty) 0L else kept.last, est)
      }
      assert(got === expect)
      // fewer distinct values than k ⇒ the sketch IS the distinct set
      expect.foreach { case (g, (nKept, _, est)) =>
        val exact = rows.filter(_._1 == g).map(_._2).distinct.size
        if (nKept < k) assert(est === exact.toLong)
      }
    }
  }

  test("kmvDistinct estimate lands within the KMV error envelope at k=64") {
    // 1000 distinct values, one group: relative error should be well
    // inside ~3/sqrt(k) ≈ 0.375 (actual is usually < 0.15)
    val df = (0L until 1000L).map(v => ("g", v)).toDF("g", "v").repartition(8)
    val est = kmvMap(Sketches.kmvDistinct(df, "g", "v", 64))("g")._3
    assert(math.abs(est - 1000.0) / 1000.0 < 0.375, s"estimate $est too far from 1000")
  }

  test("kmvDistinct ignores duplicates and partitioning (sketch is a set statistic)") {
    val base = (0L until 200L).map(v => ("g", v))
    val dup = base ++ base ++ base.take(50)
    val a = kmvMap(Sketches.kmvDistinct(base.toDF("g", "v").repartition(2), "g", "v", 16))
    val b = kmvMap(Sketches.kmvDistinct(dup.toDF("g", "v").repartition(13), "g", "v", 16))
    assert(a === b)
  }

  test("kmvDistinct drops nulls (COUNT DISTINCT semantics)") {
    val df = Seq(("g", Some(1L)), ("g", None), ("g", Some(2L)), ("h", None))
      .toDF("g", "v")
    val got = kmvMap(Sketches.kmvDistinct(df, "g", "v", 8))
    assert(got.keySet === Set("g"))
    assert(got("g")._1 === 2L)
  }

  test("hash48 codegen expression == md5Lower64 & Mask48 (incl. unicode and controls)") {
    val vals = Seq("", "a", "42", "hello world", "é中文🚀", "ctl\t",
      "x" * 300, "-17", "日本語のテキスト")
    val got = vals.toDF("v").select(Sketches.hash48(col("v")))
      .collect().map(_.getLong(0)).toSeq
    val expect = vals.map(v => TextAnalysis.md5Lower64(v) & Sketches.Mask48)
    assert(got === expect)
  }

  // ---- count-min ----

  private def cmHash(i: Int, v: String, width: Int): Long =
    (TextAnalysis.md5Lower64(s"$i:$v") & Sketches.Mask48) & (width - 1).toLong

  test("countMin cells match brute force and estimates never undercount") {
    val gen = for {
      n <- Gen.choose(0, 300)
      vals <- Gen.listOfN(n, Gen.choose(0, 40).map(v => s"t$v"))
      depth <- Gen.oneOf(1, 3, 4)
      width <- Gen.oneOf(16, 64)
      parts <- Gen.oneOf(1, 5)
    } yield (vals, depth, width, parts)
    sample(gen, 12, 3L) { case (vals, depth, width, parts) =>
      val df = vals.toDF("v").repartition(parts)
      val cells = Sketches.countMinCells(df, "v", depth, width)
      val gotCells = cells.collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val expectCells = vals.flatMap(v => (0 until depth).map(i => (i, cmHash(i, v, width))))
        .groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
      assert(gotCells === expectCells)
      val exact = vals.groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
      val queries = exact.keys.toSeq.toDF("v")
      val est = Sketches.countMinQuery(cells, queries, "v", depth, width)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      exact.foreach { case (v, cnt) =>
        assert(est(v) >= cnt, s"CM undercounted $v")
        // est = min over rows of that row's cell total
        val want = (0 until depth).map(i => expectCells((i, cmHash(i, v, width)))).min
        assert(est(v) === want)
      }
    }
  }

  test("kmvIntersectEstimate: exact in the under-full regime, estimator formula above it") {
    val gen = for {
      na <- Gen.choose(0, 150)
      nb <- Gen.choose(0, 150)
      as <- Gen.listOfN(na, Gen.choose(0L, 99L))
      bs <- Gen.listOfN(nb, Gen.choose(50L, 149L))
      k <- Gen.oneOf(8, 64, 256)
    } yield (as, bs, k)
    sample(gen, 12, 47L) { case (as, bs, k) =>
      val row = Sketches.kmvIntersectEstimate(
        as.toDF("v"), bs.toDF("v"), "v", k).collect()(0)
      val ha = as.map(v => TextAnalysis.md5Lower64(v.toString) & Sketches.Mask48)
        .distinct.sorted.take(k)
      val hb = bs.map(v => TextAnalysis.md5Lower64(v.toString) & Sketches.Mask48)
        .distinct.sorted.take(k)
      val union = (ha ++ hb).distinct.sorted.take(k)
      val fill = union.size
      def est(s: Seq[Long]) = if (s.size < k) s.size.toLong else ((k - 1).toLong << 48) / s.last
      val kInter = (ha.toSet & hb.toSet & union.toSet).size.toLong
      assert(row.getLong(0) === ha.size.toLong)
      assert(row.getLong(3) === kInter)
      assert(row.getLong(6) === est(union))
      if (fill > 0) {
        assert(row.getLong(7) === kInter * est(union) / fill)
        assert(row.getLong(8) === kInter * 1000000L / fill)
      }
      // under-full: everything is exact set arithmetic
      val exactA = as.distinct.size; val exactB = bs.distinct.size
      val exactI = (as.toSet & bs.toSet).size
      if (exactA + exactB <= k) {
        assert(row.getLong(4) === exactA.toLong)
        assert(row.getLong(5) === exactB.toLong)
        assert(row.getLong(7) === exactI.toLong)
      }
    }
  }

  test("countMin sketches merge by cell addition (two batches = one)") {
    val a = (0 until 100).map(v => s"x${v % 9}")
    val b = (0 until 70).map(v => s"x${v % 5}")
    val whole = Sketches.countMinCells((a ++ b).toDF("v"), "v", 4, 32).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val partA = Sketches.countMinCells(a.toDF("v"), "v", 4, 32).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val partB = Sketches.countMinCells(b.toDF("v"), "v", 4, 32).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = (partA.keySet ++ partB.keySet)
      .map(k => k -> (partA.getOrElse(k, 0L) + partB.getOrElse(k, 0L))).toMap
    assert(merged === whole)
  }

  test("sampleQuantiles matches brute force and is partition-independent") {
    val gen = for {
      n <- Gen.choose(1, 300)
      rows <- Gen.listOfN(n,
        Gen.zip(Gen.oneOf("a", "b"), Gen.choose(0L, 500L), Gen.choose(-100L, 100L)))
      k <- Gen.oneOf(2, 16, 64)
      parts <- Gen.oneOf(1, 5)
    } yield (rows, k, parts)
    sample(gen, 10, 11L) { case (rows, k, parts) =>
      val df = rows.toDF("g", "key", "v").repartition(parts)
      val got = Sketches.sampleQuantiles(df, "g", "key", col("v"), k)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      val expect = rows.groupBy(_._1).flatMap { case (g, rs) =>
        // duplicate keys and 48-bit collisions both collapse to min(v)
        val byHash = rs
          .groupBy(r => TextAnalysis.md5Lower64(r._2.toString) & Sketches.Mask48)
          .map { case (h, dup) => h -> dup.map(_._3).min }
        val samp = byHash.toSeq.sortBy(_._1).take(k).map(_._2).sorted
        val nS = samp.size.toLong
        Seq(500000L, 900000L, 990000L).map { q =>
          val kth = ((q * nS + 999999L) / 1000000L).toInt
          (g, q) -> (nS, samp(math.max(kth - 1, 0)))
        }
      }
      assert(got === expect)
      // under-full group ⇒ the p50/p90/p99 are the EXACT quantiles
      rows.groupBy(_._1).foreach { case (g, rs) =>
        val distinctKeys = rs.map(_._2).distinct.size
        if (distinctKeys <= k) {
          val vs = rs.groupBy(_._2).map(_._2.map(_._3).min).toSeq.sorted
          Seq(500000L, 900000L, 990000L).foreach { q =>
            val kth = ((q * vs.size + 999999L) / 1000000L).toInt
            assert(got((g, q))._2 === vs(math.max(kth - 1, 0)))
          }
        }
      }
    }
  }

  // ---- HLL ----

  /** The register model in pure Scala — the same closed form the
    * DuckDB oracle replays (bucket = low 6 bits, rank = 43 −
    * bit_length of the remaining 42, LC table below 2.5·m).
    */
  private def hllModel(values: Seq[Long]): (Long, Long, Long) = {
    val regs = new Array[Int](Sketches.HllM)
    values.distinct.foreach { v =>
      val h = TextAnalysis.md5Lower64(v.toString) & Sketches.Mask48
      val bucket = (h & 63).toInt
      val w = h >>> 6
      val rank = if (w == 0L) 43 else 43 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rank > regs(bucket)) regs(bucket) = rank
    }
    val nZero = regs.count(_ == 0).toLong
    val regSum = regs.map(r => (1L << 30) >> r).sum
    val raw = Sketches.HllNumerator / regSum / 1000000L
    val est = if (raw <= 160 && nZero > 0) Sketches.HllLcTable(nZero.toInt - 1) else raw
    (nZero, regSum, est)
  }

  private def hllMap(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long, Long)] =
    df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

  test("hllDistinct matches the register closed form, partition- and duplicate-invariant") {
    val gen = for {
      n <- Gen.choose(0, 500)
      rows <- Gen.listOfN(n, Gen.zip(Gen.oneOf("a", "b"), Gen.choose(0L, 300L)))
      parts <- Gen.oneOf(1, 3, 11)
    } yield (rows, parts)
    sample(gen, 10, 19L) { case (rows, parts) =>
      val got = hllMap(Sketches.hllDistinct(
        (rows ++ rows).toDF("g", "v").repartition(parts), "g", "v"))
      val expect = rows.groupBy(_._1).map { case (g, rs) => g -> hllModel(rs.map(_._2)) }
      assert(got === expect)
    }
  }

  test("hllDistinct raw estimate lands within the HLL error envelope at 5000 distinct") {
    // m = 64 ⇒ std err ≈ 1.04/√64 = 13%; allow 3σ
    val df = (0L until 5000L).map(v => ("g", v)).toDF("g", "v").repartition(8)
    val (_, _, est) = hllMap(Sketches.hllDistinct(df, "g", "v"))("g")
    assert(math.abs(est - 5000.0) / 5000.0 < 0.39, s"estimate $est too far from 5000")
  }

  test("hllDistinct small range takes the linear-counting branch (not raw HLL)") {
    val df = (0L until 15L).map(v => ("g", v)).toDF("g", "v")
    val (nZero, _, est) = hllMap(Sketches.hllDistinct(df, "g", "v"))("g")
    assert(nZero > 0)
    assert(est === Sketches.HllLcTable(nZero.toInt - 1))
    assert(math.abs(est - 15.0) / 15.0 < 0.5, s"LC estimate $est too far from 15")
  }

  test("hllDistinct drops nulls and empty input yields no rows") {
    val df = Seq(("g", Some(1L)), ("g", None), ("h", None)).toDF("g", "v")
    val got = hllMap(Sketches.hllDistinct(df, "g", "v"))
    assert(got.keySet === Set("g"))
    assert(got("g") === hllModel(Seq(1L)))
  }
}
