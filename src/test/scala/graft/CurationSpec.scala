package graft

import graft.datatools.Curation
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

class CurationSpec extends SparkSpec {
  import spark.implicits._


  // ---- keeperSelection ----

  /** Brute-force verdict: per cluster keep max quality, ties min id;
    * unclustered docs keep themselves.
    */
  private def bruteKeepers(docs: Seq[(Long, Double)],
                           clusters: Seq[(Long, Long)]): Map[Long, (Long, Long, Boolean)] = {
    val q = docs.toMap
    val byCluster = clusters.groupBy(_._2)
    val keeper = byCluster.map { case (c, members) =>
      c -> members.map(_._1).minBy(id => (-q(id), id))
    }
    val clusterOf = clusters.toMap
    docs.map { case (id, _) =>
      val c = clusterOf.getOrElse(id, id)
      val k = keeper.getOrElse(c, id)
      id -> (c, k, k == id)
    }.toMap
  }

  private def runKeepers(docs: Seq[(Long, Double)], clusters: Seq[(Long, Long)]): Map[Long, (Long, Long, Boolean)] = {
    val d = docs.toDF("doc_id", "qv")
    val c = clusters.toDF("id", "cluster_id")
    Curation.keeperSelection(d, c, col("qv"))
      .as[(Long, Long, Long, Boolean)].collect()
      .map { case (id, cl, k, kept) => id -> (cl, k, kept) }.toMap
  }

  test("keeperSelection: highest quality keeps, rest drop, singletons keep themselves") {
    val docs = Seq(1L -> 0.5, 2L -> 0.9, 3L -> 0.7, 4L -> 0.1, 9L -> 0.2)
    val clusters = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L) // one cluster {1,2,3}
    val got = runKeepers(docs, clusters)
    assert(got(2L) === ((1L, 2L, true)))  // max quality wins
    assert(got(1L) === ((1L, 2L, false)))
    assert(got(3L) === ((1L, 2L, false)))
    assert(got(4L) === ((4L, 4L, true)))  // unclustered: keeps itself
    assert(got(9L) === ((9L, 9L, true)))
  }

  test("keeperSelection: quality ties break to the smallest id") {
    val docs = Seq(7L -> 0.5, 3L -> 0.5, 5L -> 0.5)
    val clusters = Seq(7L -> 3L, 3L -> 3L, 5L -> 3L)
    val got = runKeepers(docs, clusters)
    assert(got(3L)._3 && !got(5L)._3 && !got(7L)._3)
  }

  test("property: keeperSelection equals brute force on random clusterings") {
    val gen = for {
      n <- Gen.choose(1, 14)
      qs <- Gen.listOfN(n, Gen.choose(0, 5).map(_ / 10.0)) // coarse → many ties
      cl <- Gen.listOfN(n, Gen.choose(0L, 4L))
    } yield {
      val ids = (1L to n.toLong)
      val docs = ids.zip(qs)
      // cluster label c groups its members under min member id (the
      // GraphOps contract); singleton "clusters" stay unclustered rows
      val groups = ids.zip(cl).groupBy(_._2).values.filter(_.size >= 2)
      val clusters = groups.flatMap { g =>
        val root = g.map(_._1).min
        g.map { case (id, _) => id -> root }
      }.toSeq
      (docs, clusters)
    }
    sample(gen, 8) { case (docs, clusters) =>
      assert(runKeepers(docs.toSeq, clusters) === bruteKeepers(docs.toSeq, clusters),
        s"docs=$docs clusters=$clusters")
    }
  }

  // ---- vocabTopK ----

  test("vocabTopK: counts, tie-break on token, empty and blank docs ignored") {
    val docs = Seq("b a a", "  ", "", "c b\t\na", "c").toDF("text")
    val got = Curation.vocabTopK(docs, k = 2).as[(String, Long)].collect().toSeq
    assert(got === Seq("a" -> 3L, "b" -> 2L)) // b ties c at 2 → token asc wins
    val all = Curation.vocabTopK(docs, k = 10).as[(String, Long)].collect().toSeq
    assert(all === Seq("a" -> 3L, "b" -> 2L, "c" -> 2L))
  }

  test("property: vocabTopK equals brute force") {
    val word = Gen.oneOf("x", "y", "zz", "w1", "v")
    val gen = for {
      n <- Gen.choose(0, 20)
      docs <- Gen.listOfN(n, Gen.listOf(word).map(_.mkString(" ")))
      k <- Gen.choose(1, 6)
    } yield (docs, k)
    sample(gen, 8) { case (docs, k) =>
      val expect = docs.flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.size.toLong).toSeq
        .sortBy { case (t, c) => (-c, t) }.take(k)
      val df = docs.toDF("text")
      val got = Curation.vocabTopK(df, k).as[(String, Long)].collect().toSeq
      assert(got === expect, s"docs=$docs k=$k")
    }
  }

  // ---- splitAssign ----

  test("splitAssign: md5-bucket assignment is exact, stable and exhaustive") {
    val docs = (1L to 300L).toDF("doc_id")
    val got = Curation.splitAssign(docs).select("doc_id", "bucket", "split_name")
      .as[(Long, Long, String)].collect()
    got.foreach { case (id, bucket, split) =>
      val expect = graft.datatools.TextAnalysis.md5Lower64(id.toString) & 1023L
      assert(bucket === expect)
      val want = if (bucket < 922) "train" else if (bucket < 973) "val" else "test"
      assert(split === want)
    }
    // all three splits materialize on 300 ids and partition the corpus
    val bySplit = got.groupBy(_._3).view.mapValues(_.length).toMap
    assert(bySplit.keySet === Set("train", "val", "test"))
    assert(bySplit.values.sum === 300)
    assert(bySplit("train") > bySplit("val") + bySplit("test")) // ≈90/5/5
  }

  // ---- decontaminate ----

  private def toks(s: String): Seq[String] =
    s.trim.split("\\s+").toSeq.filter(_.nonEmpty)

  private def bruteDecon(docs: Seq[(Long, String)], evalIds: Set[Long], n: Int): Map[Long, Long] = {
    def grams(s: String): Set[String] = {
      val t = toks(s)
      if (t.size < n) Set.empty else t.sliding(n).map(_.mkString(" ")).toSet
    }
    val evalGrams = docs.filter(d => evalIds(d._1)).flatMap(d => grams(d._2)).toSet
    docs.map { case (id, s) => id -> grams(s).count(evalGrams).toLong }
      .filter(_._2 > 0).toMap
  }

  test("decontaminate: flags docs sharing an n-gram with the eval set, counts distinct hits") {
    val docs = Seq(
      1L -> "a b c d e f",          // eval doc: grams {a b c, b c d, c d e, d e f}
      2L -> "x b c d y",            // shares "b c d" → 1 hit
      3L -> "c d e f q a b c z",    // shares "c d e", "d e f", "a b c" → 3
      4L -> "totally different words here", // clean
      5L -> "a b")                  // too short for a 3-gram
    val df = docs.toDF("doc_id", "text")
    val got = Curation.decontaminate(df, df.filter(col("doc_id") === 1L), n = 3)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 4L, 2L -> 1L, 3L -> 3L))
  }

  test("property: decontaminate equals brute force") {
    val word = Gen.oneOf("a", "b", "c", "dd", "e")
    val gen = for {
      n <- Gen.choose(1, 15)
      texts <- Gen.listOfN(n, Gen.listOf(word).map(_.mkString(" ")))
      ng <- Gen.choose(2, 4)
    } yield (texts.zipWithIndex.map { case (t, i) => (i + 1).toLong -> t }, ng)
    sample(gen, 8) { case (docs, ng) =>
      val evalIds = docs.map(_._1).filter(_ % 3 == 0).toSet
      val df = docs.toDF("doc_id", "text")
      val got = Curation.decontaminate(df, df.filter(col("doc_id") % 3 === 0), n = ng)
        .as[(Long, Long)].collect().toMap
      assert(got === bruteDecon(docs, evalIds, ng), s"docs=$docs n=$ng")
    }
  }

  // ---- chunkDedup ----

  private def bruteChunks(docs: Seq[(Long, String)], w: Int): Map[Long, (Long, Long)] = {
    val inst = docs.flatMap { case (id, s) =>
      toks(s).grouped(w).map(c => id -> c.mkString(" "))
    }
    val byChunk = inst.groupBy(_._2).view
      .mapValues(g => (g.size, g.map(_._1).min)).toMap
    val removed = inst.groupBy(_._1).view.mapValues { g =>
      g.count { case (id, c) => val (cnt, kd) = byChunk(c); cnt > 1 && kd != id }.toLong
    }.toMap
    val totals = inst.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    removed.filter(_._2 > 0).map { case (id, r) => id -> (totals(id), r) }.toMap
  }

  test("chunkDedup: repeated chunks removed everywhere but the smallest-id doc") {
    val docs = Seq(
      1L -> "w1 w2 w3 w4 w5 w6",  // chunks (w=3): [w1 w2 w3][w4 w5 w6]
      2L -> "w1 w2 w3 z1 z2",     // loses [w1 w2 w3] to doc 1; keeps [z1 z2]
      3L -> "w4 w5 w6",           // loses its only chunk
      4L -> "q r s")              // unique → absent from output
    val df = docs.toDF("doc_id", "text")
    val got = Curation.chunkDedup(df, chunkTokens = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got === Map(2L -> (2L, 1L), 3L -> (1L, 1L)))
  }

  test("property: chunkDedup equals brute force") {
    val word = Gen.oneOf("a", "b", "c", "d")
    val gen = for {
      n <- Gen.choose(1, 12)
      texts <- Gen.listOfN(n, Gen.listOf(word).map(_.mkString(" ")))
      w <- Gen.choose(1, 3)
    } yield (texts.zipWithIndex.map { case (t, i) => (i + 1).toLong -> t }, w)
    sample(gen, 8) { case (docs, w) =>
      val df = docs.toDF("doc_id", "text")
      val got = Curation.chunkDedup(df, chunkTokens = w)
        .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      assert(got === bruteChunks(docs, w), s"docs=$docs w=$w")
    }
  }

  // ---- mixtureWeights ----

  private def bruteMix(strata: Seq[String]): Map[String, (Long, Long, Long)] = {
    val counts = strata.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = strata.size.toLong
    val shares = counts.view.mapValues(n => n * 1000000L / total).toMap
    val wraw = shares.view.mapValues(p => math.floor(math.sqrt(p.toDouble * 1e6)).toLong).toMap
    val wsum = wraw.values.sum
    counts.map { case (s, n) => s -> (n, shares(s), wraw(s) * 1000000L / wsum) }
  }

  test("mixtureWeights: sqrt tempering upweights the tail, integers exact") {
    val strata = Seq.fill(90)("head") ++ Seq.fill(9)("mid") ++ Seq("tail")
    val df = strata.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "lang")
    val got = Curation.mixtureWeights(df, "lang")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got === bruteMix(strata))
    // tempering: tail's weight share strictly exceeds its doc share
    val (_, tailShare, tailW) = got("tail")
    assert(tailW > tailShare)
    val (_, headShare, headW) = got("head")
    assert(headW < headShare)
  }

  test("property: mixtureWeights equals brute force") {
    val gen = for {
      n <- Gen.choose(1, 80)
      ls <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d"))
    } yield ls
    sample(gen, 8) { strata =>
      val df = strata.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "lang")
      val got = Curation.mixtureWeights(df, "lang")
        .as[(String, Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      assert(got === bruteMix(strata), s"strata=$strata")
    }
  }

  // ---- shardPack ----

  private def bruteShards(docs: Seq[(Long, String)], s: Long): Map[Long, (Long, Long, Long)] = {
    var cum = 0L
    docs.sortBy(_._1).map { case (id, text) =>
      val n = if (text.trim.isEmpty) 0L else text.trim.split("\\s+").length.toLong
      val r = id -> (n, cum, cum / s)
      cum += n
      r
    }.toMap
  }

  test("shardPack: exclusive prefix sums and shard cuts, bucket-boundary safe") {
    // ids straddle several width-4 buckets, incl. a gap and an empty doc
    val docs = Seq(0L, 1L, 2L, 5L, 6L, 9L, 17L, 18L).map { id =>
      id -> (if (id == 5L) "" else Seq.fill((id % 7 + 1).toInt)("w").mkString(" "))
    }
    val got = Curation.shardPack(docs.toDF("doc_id", "text"), shardTokens = 5L, bucketWidth = 4L)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got === bruteShards(docs, 5L))
  }

  test("property: shardPack equals brute force and is partitioning-invariant") {
    val gen = for {
      n <- Gen.choose(1, 50)
      ids <- Gen.listOfN(n, Gen.choose(0L, 200L)).map(_.distinct)
      lens <- Gen.listOfN(n, Gen.choose(0, 12))
      s <- Gen.choose(1L, 30L)
      bw <- Gen.oneOf(1L, 7L, 64L)
    } yield (ids.zip(lens).map { case (id, k) => id -> Seq.fill(k)("t").mkString(" ") }, s, bw)
    sample(gen, 6) { case (docs, s, bw) =>
      val expect = bruteShards(docs, s)
      val df = docs.toDF("doc_id", "text")
      val got = Curation.shardPack(df, s, bw)
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      assert(got === expect, s"docs=${docs.map(d => d._1 -> d._2.length)} s=$s bw=$bw")
      val got11 = Curation.shardPack(df.repartition(11), s, bw)
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      assert(got11 === expect)
    }
  }

  // ---- vocabEncode ----

  private def bruteEncode(docs: Seq[(Long, String)], k: Int): Map[Long, (Long, Long, String)] = {
    val counts = docs.flatMap(d => if (d._2.trim.isEmpty) Nil else d._2.trim.split("\\s+").toSeq)
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val vocab = counts.sortBy { case (t, c) => (-c, t) }.take(k)
      .zipWithIndex.map { case ((t, _), i) => t -> (i + 1) }.toMap
    docs.map { case (id, text) =>
      val ids = if (text.trim.isEmpty) Seq.empty[Int]
                else text.trim.split("\\s+").toSeq.map(t => vocab.getOrElse(t, 0))
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(ids.mkString(" ").getBytes("UTF-8")).map("%02x".format(_)).mkString
      id -> (ids.size.toLong, ids.count(_ == 0).toLong, h)
    }.toMap
  }

  test("vocabEncode: ids by (count desc, token asc), OOV=0, empty docs") {
    val docs = Seq(
      1L -> "b b b a a c",   // counts: b=3(+1 below)=4? no — per-corpus
      2L -> "b rare a",
      3L -> "   ",
      4L -> "zz zz unseen")
    // corpus counts: b=4, a=3, zz=2, c=1, rare=1, unseen=1
    val got = Curation.vocabEncode(docs.toDF("doc_id", "text"), k = 3)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got === bruteEncode(docs, 3))
    // vocab = b->1, a->2, zz->3; doc2 = [1, 0, 2] → one OOV
    assert(got(2L)._2 === 1L)
    assert(got(3L) === ((0L, 0L, bruteEncode(docs, 3)(3L)._3)))
  }

  test("vocabEncode: all-blank corpus (empty vocab) stays well-typed") {
    val docs = Seq(1L -> "   ", 2L -> "")
    val got = Curation.vocabEncode(docs.toDF("doc_id", "text"), k = 5)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got === bruteEncode(docs, 5))
    assert(got(1L)._1 === 0L)
  }

  test("property: vocabEncode equals brute force") {
    val gen = for {
      n <- Gen.choose(1, 40)
      k <- Gen.choose(1, 6)
      texts <- Gen.listOfN(n, Gen.listOf(Gen.oneOf("a", "bb", "c", "dd", "e", "f"))
        .map(_.mkString(" ")))
    } yield (texts.zipWithIndex.map { case (t, i) => i.toLong -> t }, k)
    sample(gen, 6) { case (docs, k) =>
      val got = Curation.vocabEncode(docs.toDF("doc_id", "text"), k)
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      assert(got === bruteEncode(docs, k), s"docs=$docs k=$k")
    }
  }

  // ---- rarityScore ----

  private def bruteRarity(docs: Seq[(Long, String)], k: Int): Map[Long, (Long, Long, Long)] = {
    val all = docs.flatMap(d => if (d._2.trim.isEmpty) Nil else d._2.trim.split("\\s+").toSeq)
    val total = all.size.toLong
    val sp = all.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(k)
      .map { case (t, c) => t -> total * 1000L / c }.toMap
    val oov = total * 1000L
    docs.map { case (id, text) =>
      val sps = if (text.trim.isEmpty) Seq.empty[Long]
                else text.trim.split("\\s+").toSeq.map(sp.getOrElse(_, oov))
      val s = sps.sum
      id -> (sps.size.toLong, s, if (sps.isEmpty) 0L else s / sps.size)
    }.toMap
  }

  test("rarityScore: rare tokens score higher, OOV maximal, empty docs zero") {
    val docs = Seq(
      1L -> "common common common common rare",
      2L -> "common common",
      3L -> " ",
      4L -> "oovword")
    // total=8; with k=2 vocab={common:5, rare... ties} -> common,oovword? counts: common=6? no:
    // common appears 6x, rare 1x, oovword 1x; k=2 vocab = common(6), oovword(1) (tie rare/oovword -> alpha)
    val got = Curation.rarityScore(docs.toDF("doc_id", "text"), k = 2)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got === bruteRarity(docs, 2))
    // the rare-token doc's mean rarity strictly exceeds the common-only doc's
    assert(got(1L)._3 > got(2L)._3)
    assert(got(3L) === ((0L, 0L, 0L)))
  }

  test("property: rarityScore equals brute force") {
    val gen = for {
      n <- Gen.choose(1, 40)
      k <- Gen.choose(1, 6)
      texts <- Gen.listOfN(n, Gen.listOf(Gen.oneOf("a", "bb", "c", "dd", "e", "f", "g"))
        .map(_.mkString(" ")))
    } yield (texts.zipWithIndex.map { case (t, i) => i.toLong -> t }, k)
    sample(gen, 6) { case (docs, k) =>
      val got = Curation.rarityScore(docs.toDF("doc_id", "text"), k)
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      assert(got === bruteRarity(docs, k), s"docs=$docs k=$k")
    }
  }

  // ---- stratifiedSample ----

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Brute force: per stratum the k smallest (md5(id), id), ranked. */
  private def bruteSample(rows: Seq[(String, Long)], k: Int): Set[(String, Long, Long, String)] =
    rows.groupBy(_._1).flatMap { case (s, members) =>
      members.map(_._2).distinct.map(id => (md5hex(id.toString), id)).sorted
        .take(k).zipWithIndex
        .map { case ((h, id), i) => (s, (i + 1).toLong, id, h) }
    }.toSet

  test("stratifiedSample: k smallest md5(id) per stratum, rank order, short strata kept whole") {
    val rows = (1L to 40L).map(i => (if (i % 3 == 0) "en" else "de") -> i) ++ Seq("fr" -> 100L)
    val df = rows.toDF("lang", "doc_id")
    val got = Curation.stratifiedSample(df, "lang", k = 4)
      .as[(String, Long, Long, String)].collect().toSet
    assert(got === bruteSample(rows, 4))
    assert(got.count(_._1 == "fr") === 1) // stratum smaller than k: all of it
  }

  test("property: stratifiedSample equals brute force and is partitioning-invariant") {
    val gen = for {
      n <- Gen.choose(1, 60)
      ids <- Gen.listOfN(n, Gen.choose(1L, 500L))
      strata <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
      k <- Gen.choose(1, 6)
    } yield (strata.zip(ids).distinct, k)
    sample(gen, 6) { case (rows, k) =>
      val expect = bruteSample(rows, k)
      val df = rows.toDF("lang", "doc_id")
      val got = Curation.stratifiedSample(df, "lang", k)
        .as[(String, Long, Long, String)].collect().toSet
      assert(got === expect, s"rows=$rows k=$k")
      val got7 = Curation.stratifiedSample(df.repartition(7), "lang", k)
        .as[(String, Long, Long, String)].collect().toSet
      assert(got7 === expect)
    }
  }

  // ---- groupQuantiles ----

  test("groupQuantiles: ceil-rule k-th smallest, duplicates counted, per-stratum") {
    import spark.implicits._
    val df = Seq(("en", 1L), ("en", 2L), ("en", 2L), ("en", 10L), ("de", 5L))
      .toDF("lang", "v")
    val out = Curation.groupQuantiles(df, "lang", col("v"), Seq(500000L, 1000000L))
      .as[(String, Long, Long, Long, Long)].collect()
      .map { case (s0, q, n, k, v) => (s0, q) -> ((n, k, v)) }.toMap
    assert(out(("en", 500000L)) === ((4L, 2L, 2L)))   // k=ceil(.5*4)=2 -> dup value 2
    assert(out(("en", 1000000L)) === ((4L, 4L, 10L))) // max
    assert(out(("de", 500000L)) === ((1L, 1L, 5L)))
    assert(out.size === 4)
  }

  private def bruteQuantiles(rows: Seq[(String, Long)], qs: Seq[Long]): Map[(String, Long), (Long, Long, Long)] =
    rows.groupBy(_._1).flatMap { case (s0, g) =>
      val vs = g.map(_._2).sorted
      val n = vs.size.toLong
      qs.map { q =>
        val k = (q * n + 999999L) / 1000000L
        (s0, q) -> ((n, k, vs((k - 1).toInt)))
      }
    }

  test("property: groupQuantiles equals brute force and is partitioning-invariant") {
    import spark.implicits._
    val qs = Seq(250000L, 500000L, 900000L, 1000000L)
    val gen = for {
      n <- Gen.choose(1, 40)
      rows <- Gen.listOfN(n, for {
        s0 <- Gen.oneOf("en", "de", "zh")
        v <- Gen.choose(0L, 12L) // narrow range -> heavy duplicates
      } yield (s0, v))
    } yield rows
    sample(gen, 25) { rows =>
      val expect = bruteQuantiles(rows, qs)
      Seq(1, 7).foreach { parts =>
        val got = Curation.groupQuantiles(rows.toDF("lang", "v").repartition(parts), "lang", col("v"), qs)
          .as[(String, Long, Long, Long, Long)].collect()
          .map { case (s0, q, n, k, v) => (s0, q) -> ((n, k, v)) }.toMap
        assert(got === expect, s"rows=$rows parts=$parts")
      }
    }
  }

  // ---- mergeInduction ----

  /** Straight-line reference: count overlapping adjacent pairs, merge
    * the (count desc, pair asc) argmax left-to-right non-overlapping.
    */
  private def bruteMerge(docs: Seq[(Long, String)], rounds: Int): Map[Long, (Long, Long, String)] = {
    var seqs = docs.filter(_._2.trim.nonEmpty)
      .map { case (id, t) => id -> t.trim.split("\\s+").toVector }
    val orig = seqs.map { case (id, l) => id -> l.size.toLong }.toMap
    var r = 0
    var done = false
    while (r < rounds && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      seqs.foreach { case (_, l) =>
        l.zip(l.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + 1) }
      if (counts.isEmpty) done = true
      else {
        val (a, b) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }._1
        seqs = seqs.map { case (id, l) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < l.size) {
            if (i + 1 < l.size && l(i) == a && l(i + 1) == b) { out += a + " " + b; i += 2 }
            else { out += l(i); i += 1 }
          }
          id -> out.result()
        }
        r += 1
      }
    }
    seqs.map { case (id, l) =>
      val s = "\u0001" + l.mkString("\u0001\u0001") + "\u0001"
      id -> ((l.size.toLong, orig(id) - l.size, md5hex(s)))
    }.toMap
  }

  test("mergeInduction: argmax pair merged corpus-wide, ties lexicographic, re-merge across rounds") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b c"), (2L, "a b x"), (3L, "  "))
    val got = Curation.mergeInduction(docs.toDF("doc_id", "text"), rounds = 3)
      .as[(Long, Long, Long, String)].collect()
      .map { case (id, n, m, h) => id -> ((n, m, h)) }.toMap
    // r1 merges (a,b) everywhere; r2 merges ("a b","a b") (tie broken
    // lexicographically); r3 merges ("a b", x). Blank doc excluded.
    assert(got(1L)._1 === 2L && got(1L)._2 === 3L)
    assert(got(2L)._1 === 1L && got(2L)._2 === 2L)
    assert(!got.contains(3L))
    assert(got === bruteMerge(docs, 3))
  }

  test("property: mergeInduction equals brute force and is partitioning-invariant") {
    import spark.implicits._
    val gen = for {
      nDocs <- Gen.choose(1, 8)
      docs <- Gen.listOfN(nDocs, Gen.choose(0, 12).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" "))))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    sample(gen, 12) { docs =>
      val expect = bruteMerge(docs, 3)
      Seq(1, 5).foreach { parts =>
        val got = Curation.mergeInduction(docs.toDF("doc_id", "text").repartition(parts), rounds = 3)
          .as[(Long, Long, Long, String)].collect()
          .map { case (id, n, m, h) => id -> ((n, m, h)) }.toMap
        assert(got === expect, s"docs=$docs parts=$parts")
      }
    }
  }

  // ---- fuzzyDecontaminate ----

  test("fuzzyDecontaminate: best bench match per corpus doc, exact beats near, ties to min bench id") {
    import spark.implicits._
    def words(p: String, n: Int) = (0 until n).map(j => s"$p$j").mkString(" ")
    val c1 = words("a", 30); val c2 = words("b", 30); val c3 = words("c", 30)
    val near1 = { val t = c1.split(" "); t(15) = "CHANGED"; t.mkString(" ") }
    val near2 = { val t = c2.split(" "); t(3) = "CHANGED"; t.mkString(" ") }
    val corpus = Seq((1L, c1), (2L, c2), (3L, c3)).toDF("doc_id", "text")
    val bench = Seq((101L, near1), (103L, c2), (102L, near2)).toDF("doc_id", "text")
    val got = Curation.fuzzyDecontaminate(corpus, bench, k = 2, threshold = 0.8)
      .as[(Long, Long, Double, Long)].collect()
      .map { case (id, b, j, n) => id -> ((b, j, n)) }.toMap
    assert(got.keySet === Set(1L, 2L))
    assert(got(1L)._1 === 101L && got(1L)._3 === 1L)
    assert(got(2L)._1 === 103L && got(2L)._2 === 1.0 && got(2L)._3 === 2L) // exact copy wins
  }

  test("property: fuzzyDecontaminate equals brute force over exact shingle Jaccard") {
    import graft.datatools.Dedup
    import spark.implicits._
    // corpora of 20-token docs; bench docs are copies of corpus docs
    // with 0-2 tokens swapped (jaccard 1.0 / ~0.86 / ~0.74) or unrelated
    val gen = for {
      nc <- Gen.choose(2, 5)
      picks <- Gen.listOfN(3, for {
        src <- Gen.choose(0, nc - 1)
        swaps <- Gen.oneOf(0, 0, 1, 2, 9) // 9 = unrelated doc
      } yield (src, swaps))
    } yield {
      val corpus = (0 until nc).map(i => (i.toLong, (0 until 20).map(j => s"d${i}t$j").mkString(" ")))
      val bench = picks.zipWithIndex.map { case ((src, swaps), bi) =>
        val id = 100L + bi
        if (swaps == 9) (id, (0 until 20).map(j => s"x${bi}t$j").mkString(" "))
        else {
          val t = corpus(src)._2.split(" ")
          (0 until swaps).foreach(s0 => t(2 + 3 * s0) = s"SWAP$s0")
          (id, t.mkString(" "))
        }
      }
      (corpus, bench)
    }
    sample(gen, 10) { case (corpus, bench) =>
      val all = corpus ++ bench
      val sets = all.toDF("doc_id", "text")
        .select(col("doc_id"), Dedup.shingles(col("text"), 2).as("sh"))
        .as[(Long, Seq[String])].collect().map { case (id, sh) => id -> sh.toSet }.toMap
      val expect = corpus.flatMap { case (cid, _) =>
        val matches = bench.flatMap { case (bid, _) =>
          val (a, b) = (sets(cid), sets(bid))
          if (a.isEmpty || b.isEmpty) None
          else {
            val j = BigDecimal(a.intersect(b).size.toDouble / a.union(b).size)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            if (j >= 0.8) Some((bid, j)) else None
          }
        }
        if (matches.isEmpty) None
        else {
          val best = matches.minBy { case (bid, j) => (-j, bid) }
          Some(cid -> ((best._1, best._2, matches.size.toLong)))
        }
      }.toMap
      val got = Curation.fuzzyDecontaminate(
        corpus.toDF("doc_id", "text"), bench.toDF("doc_id", "text"), k = 2, threshold = 0.8)
        .as[(Long, Long, Double, Long)].collect()
        .map { case (id, b, j, n) => id -> ((b, j, n)) }.toMap
      assert(got === expect, s"corpus=$corpus bench=$bench")
    }
  }

  // ---- snapshotDiff ----

  test("snapshotDiff: added/removed/changed by normalized fingerprint, unchanged silent") {
    import spark.implicits._
    val oldSnap = Seq((1L, "a b"), (2L, "keep me"), (3L, "will change"), (4L, "ws   norm"))
    val newSnap = Seq((2L, "keep me"), (3L, "has changed"), (4L, "ws norm"), (5L, "brand new"))
    val got = Curation.snapshotDiff(oldSnap.toDF("doc_id", "text"), newSnap.toDF("doc_id", "text"))
      .as[(Long, String)].collect().toMap
    // doc 4 differs only in whitespace -> normalized-equal -> silent
    assert(got === Map(1L -> "removed", 3L -> "changed", 5L -> "added"))
  }

  test("property: snapshotDiff equals brute force and is partitioning-invariant") {
    import spark.implicits._
    def norm(t: String) = t.toLowerCase.replaceAll("\\s+", " ").trim
    val gen = for {
      nOld <- Gen.choose(0, 10)
      nNew <- Gen.choose(0, 10)
      oldDocs <- Gen.listOfN(nOld, Gen.zip(Gen.choose(0L, 7L), Gen.oneOf("x", "y y", "z")))
      newDocs <- Gen.listOfN(nNew, Gen.zip(Gen.choose(0L, 7L), Gen.oneOf("x", "y  y", "w")))
    } yield (oldDocs.distinctBy(_._1), newDocs.distinctBy(_._1))
    sample(gen, 20) { case (oldDocs, newDocs) =>
      val om = oldDocs.toMap; val nm = newDocs.toMap
      val expect = (om.keySet ++ nm.keySet).flatMap { id =>
        (om.get(id), nm.get(id)) match {
          case (None, Some(_)) => Some(id -> "added")
          case (Some(_), None) => Some(id -> "removed")
          case (Some(a), Some(b)) if norm(a) != norm(b) => Some(id -> "changed")
          case _ => None
        }
      }.toMap
      Seq(1, 5).foreach { parts =>
        val got = Curation.snapshotDiff(
          oldDocs.toDF("doc_id", "text").repartition(parts),
          newDocs.toDF("doc_id", "text").repartition(parts))
          .as[(Long, String)].collect().toMap
        assert(got === expect, s"old=$oldDocs new=$newDocs parts=$parts")
      }
    }
  }

  // ---- chunkWindows ----

  test("chunkWindows: stride starts, end clipping, per-chunk hash") {
    import spark.implicits._
    val toks = (0 until 14).map(i => s"t$i")
    val df = Seq((1L, toks.mkString(" ")), (2L, "solo"), (3L, " ")).toDF("doc_id", "text")
    val got = Curation.chunkWindows(df, window = 12, stride = 6)
      .as[(Long, Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // 14 tokens: starts 0, 6, 12 -> lengths 12, 8, 2
    assert(got(1L).map(c => (c._2, c._3, c._4)).toSeq ===
      Seq((0L, 0L, 12L), (1L, 6L, 8L), (2L, 12L, 2L)))
    assert(got(1L).head._5 === md5hex(toks.take(12).mkString(" ")))
    assert(got(2L).map(c => (c._2, c._3, c._4)).toSeq === Seq((0L, 0L, 1L)))
    assert(!got.contains(3L)) // blank doc contributes nothing
  }

  test("property: chunkWindows equals brute force") {
    import spark.implicits._
    val gen = for {
      w <- Gen.choose(1, 8)
      st <- Gen.choose(1, 8)
      docs <- Gen.listOfN(4, Gen.choose(0, 20).map(n => (0 until n).map(i => s"k$i").mkString(" ")))
    } yield (w, st, docs.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    sample(gen, 20) { case (w, st, docs) =>
      val expect = docs.flatMap { case (id, t) =>
        val toks = t.trim.split("\\s+").filter(_.nonEmpty)
        if (t.trim.isEmpty) Nil
        else (0 to (toks.length - 1) / st).map { j =>
          val c = toks.slice(j * st, j * st + w)
          (id, j.toLong, (j * st).toLong, c.length.toLong, md5hex(c.mkString(" ")))
        }
      }.toSet
      val got = Curation.chunkWindows(docs.toDF("doc_id", "text"), window = w, stride = st)
        .as[(Long, Long, Long, Long, String)].collect().toSet
      assert(got === expect, s"w=$w st=$st docs=$docs")
    }
  }

  // ---- mixtureSample ----

  test("mixtureSample: quotas from tempered weights, smallest-hash fill (vs brute force)") {
    val gen = for {
      n <- Gen.choose(0, 120)
      rows <- Gen.listOfN(n, Gen.oneOf("en", "de", "zh"))
      budget <- Gen.oneOf(0L, 7L, 25L, 500L)
    } yield (rows.zipWithIndex.map { case (s, i) => (i.toLong, s) }, budget)
    sample(gen, 12, 61L) { case (rows, budget) =>
      val got = Curation.mixtureSample(rows.toDF("doc_id", "lang"), budget)
        .as[(String, Long, Long, Long)].collect().toSet
      // brute force: q56 weight arithmetic → quotas → smallest-md5 draw
      val byS = rows.groupBy(_._2)
      val total = rows.size.toLong
      val shares = byS.map { case (s, rs) => s -> (rs.size.toLong * 1000000L / total) }
      val wRaw = shares.map { case (s, p) => s -> math.floor(math.sqrt(p * 1e6)).toLong }
      val wSum = wRaw.values.sum
      val expect = byS.flatMap { case (s, rs) =>
        val weight = wRaw(s) * 1000000L / wSum
        val quota = math.min(rs.size.toLong, budget * weight / 1000000L)
        rs.map(r => (md5hex(r._1.toString), r._1)).sortBy(identity)
          .take(quota.toInt).zipWithIndex
          .map { case ((_, id), i) => (s, quota, (i + 1).toLong, id) }
      }.toSet
      assert(got === expect, s"budget=$budget")
    }
  }

  // ---- phraseScores ----

  test("phraseScores matches brute-force word2phrase with deterministic ordering") {
    val words = Seq("new", "york", "machine", "learning", "the", "of")
    val gen = for {
      nd <- Gen.choose(0, 25)
      docs <- Gen.listOfN(nd, Gen.listOf(Gen.oneOf(words)).map(_.mkString(" ")))
      minCount <- Gen.oneOf(1, 2, 3)
      discount <- Gen.oneOf(0, 1, 2)
      k <- Gen.oneOf(3, 10, 100)
    } yield (docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }, minCount, discount, k)
    sample(gen, 15, 11L) { case (docs, minCount, discount, k) =>
      val tokenLists = docs.map(_._2.trim).filter(_.nonEmpty).map(_.split("\\s+").toSeq)
      val uni = tokenLists.flatten.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val total = uni.values.sum
      val big = tokenLists.filter(_.size >= 2)
        .flatMap(l => l.zip(l.tail))
        .groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
        .filter { case (_, c) => c >= minCount && c > discount }
      val expect = big.toSeq.map { case ((a, b), cab) =>
        (a, b, cab, ((cab - discount) * total * 1000L) / (uni(a) * uni(b)))
      }.sortBy { case (a, b, _, s) => (-s, a, b) }.take(k)
      val got = Curation.phraseScores(docs.toDF("doc_id", "text"),
          k = k, minCount = minCount, discount = discount)
        .as[(String, String, Long, Long)].collect().toSeq
      assert(got === expect, s"minCount=$minCount discount=$discount")
    }
  }

  // ---- boilerplateStrip ----

  /** Brute-force twin: \s+ tokens on the trimmed text (empty docs drop
    * out entirely), non-overlapping segTokens-token windows, a segment
    * in ≥ minDf DISTINCT docs is dropped at EVERY occurrence.
    */
  private def bruteBoiler(docs: Seq[(Long, String)], segTokens: Int, minDf: Int)
      : Map[Long, (String, Long, Long)] = {
    val segsByDoc = docs.flatMap { case (id, text) =>
      val t = text.trim
      if (t.isEmpty) None
      else Some(id -> t.split("\\s+").grouped(segTokens).map(_.mkString(" ")).toVector)
    }
    val df = segsByDoc.flatMap { case (id, segs) => segs.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (s, xs) => s -> xs.size }
    val boiler = df.filter(_._2 >= minDf).keySet
    segsByDoc.map { case (id, segs) =>
      val kept = segs.filterNot(boiler)
      id -> (kept.mkString(" "), segs.size.toLong, kept.size.toLong)
    }.toMap
  }

  test("boilerplateStrip drops cross-doc segments everywhere, keeps order, handles all-boiler docs") {
    // "cookie banner click here" appears in 3 docs → stripped from all
    // three, including doc 3 which is NOTHING BUT the banner (→ "").
    // Doc 4 repeats a segment internally (df = 1) → kept twice.
    val docs = Seq(
      1L -> "cookie banner click here alpha beta gamma delta",
      2L -> "one two three four cookie banner click here",
      3L -> "cookie banner click here",
      4L -> "five six seven eight five six seven eight",
      5L -> "   ").toDF("doc_id", "text")
    val got = Curation.boilerplateStrip(docs, segTokens = 4, minDf = 3)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got === Map(
      1L -> (("alpha beta gamma delta", 2L, 1L)),
      2L -> (("one two three four", 2L, 1L)),
      3L -> (("", 1L, 0L)),
      4L -> (("five six seven eight five six seven eight", 2L, 2L))))
  }

  test("boilerplateStrip matches brute force on random corpora") {
    val words = Seq("a", "b", "c", "d", "e")
    val gen = for {
      nd <- Gen.choose(0, 12)
      docs <- Gen.listOfN(nd, Gen.listOf(Gen.oneOf(words)).map(_.mkString(" ")))
      segTokens <- Gen.oneOf(1, 2, 3)
      minDf <- Gen.oneOf(2, 3)
    } yield (docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }, segTokens, minDf)
    sample(gen, 12, 88L) { case (docs, segTokens, minDf) =>
      val expect = bruteBoiler(docs, segTokens, minDf)
      val got = Curation.boilerplateStrip(docs.toDF("doc_id", "text"),
          segTokens = segTokens, minDf = minDf)
        .as[(Long, String, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      assert(got === expect, s"segTokens=$segTokens minDf=$minDf docs=$docs")
    }
  }

  /** Brute-force bigram-LM model: MLE transition ppm from the corpus,
    * floor-div mean per doc, bottom-k (score asc, id asc).
    */
  private def bruteBigramLm(docs: Seq[(Long, String)], k: Int): Seq[(Long, Long, Long)] = {
    def toks(t: String) = t.trim.split("\\s+").toSeq
    val perDoc = docs.filter(_._2.trim.nonEmpty)
      .map { case (id, t) => id -> toks(t).sliding(2).filter(_.size == 2)
        .map(p => (p(0), p(1))).toSeq }
      .filter(_._2.nonEmpty)
    val c2 = perDoc.flatMap(_._2).groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val c1 = c2.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    perDoc.map { case (id, bs) =>
      val ssum = bs.map(p => c2(p) * 1000000L / c1(p._1)).sum
      (id, bs.size.toLong, ssum / bs.size)
    }.sortBy(r => (r._3, r._1)).take(k)
  }

  test("bigramLmScore matches brute force on random corpora (bottom-k drop list)") {
    val words = Seq("x", "y", "z", "w")
    val gen = for {
      nd <- Gen.choose(0, 15)
      docs <- Gen.listOfN(nd, Gen.listOf(Gen.oneOf(words)).map(_.mkString(" ")))
      k <- Gen.oneOf(3, 10, 100)
    } yield (docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }, k)
    sample(gen, 12, 33L) { case (docs, k) =>
      val expect = bruteBigramLm(docs, k)
      val got = Curation.bigramLmScore(docs.toDF("doc_id", "text"), k)
        .as[(Long, Long, Long)].collect().toSeq
      assert(got === expect, s"k=$k docs=$docs")
    }
  }

  // ---- semDeDup ----

  test("semDeDup keeps the centroid-nearest member of each semantic-dup group") {
    // cluster A prototypes at x-axis: 1, 3, 4 are mutual near-dups
    // (cosine ≥ 0.999 pairwise); after one integer Lloyd round the A
    // centroid lands EXACTLY on vector 3 (mean of 0/10000/20000 in the
    // y slot), so 3 is the keeper (dist 0) and the 1-vs-4 dist tie
    // drops the larger id. Cluster B: 2 and 5 are dups (5 nearer the
    // centroid, which is dragged off-axis by non-dup 6).
    val vecs = Seq(
      1L -> Seq(1f, 0f, 0f, 0f),
      2L -> Seq(0f, 1f, 0f, 0f),
      3L -> Seq(1f, 0.01f, 0f, 0f),
      4L -> Seq(1f, 0.02f, 0f, 0f),
      5L -> Seq(0f, 1f, 0.005f, 0f),
      6L -> Seq(0f, 0.5f, 0.5f, 0f)
    ).toDF("vec_id", "embedding")
    val got = Curation.semDeDup(vecs, k = 2, iters = 1, tau = 0.99)
      .select("vec_id", "cluster", "kept")
      .as[(Long, Int, Boolean)].collect()
      .map { case (id, c, kk) => id -> ((c, kk)) }.toMap
    assert(got(1L) === ((0, false)) && got(3L) === ((0, true)) &&
      got(4L) === ((0, false)))
    assert(got(2L) === ((1, false)) && got(5L) === ((1, true)) &&
      got(6L) === ((1, true)))
  }

  test("semDeDup with a threshold above every cosine keeps everything") {
    val vecs = Seq(1L -> Seq(1f, 0f), 2L -> Seq(0f, 1f), 3L -> Seq(0.7f, 0.7f))
      .toDF("vec_id", "embedding")
    val got = Curation.semDeDup(vecs, k = 2, iters = 1, tau = 0.9999)
      .select("vec_id", "kept").as[(Long, Boolean)].collect().toMap
    assert(got.values.forall(identity) && got.size === 3)
  }

  // ---- dsirWeights ----

  test("dsirWeights ranks docs by the linearized target/source unigram gap") {
    // target = lang 'en'. counts: a → (src 3, tgt 2), b → (2, 1),
    // c → (5, 0); totals (10, 3). gaps: a = 666666-300000, b =
    // 333333-200000, c = 0-500000 (floor div, exact).
    val docs = Seq(
      (1L, "a a b", "en"),
      (2L, "a b c", "de"),
      (3L, "c c c c", "de")
    ).toDF("doc_id", "text", "lang")
    val got = Curation.dsirWeights(docs, col("lang") === "en", vocab = 10, n = 10)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 3L, 2L * 366666L + 133333L),
      (2L, 3L, 366666L + 133333L - 500000L),
      (3L, 4L, -2000000L)))
  }

  test("dsirWeights vocabulary cut drops out-of-vocab tokens from the weight") {
    // vocab = 1 keeps only the most frequent token 'c'; docs without
    // 'c' fall off the list entirely (no in-vocab tokens)
    val docs = Seq(
      (1L, "a a b", "en"),
      (2L, "a b c", "de"),
      (3L, "c c c c", "de")
    ).toDF("doc_id", "text", "lang")
    val got = Curation.dsirWeights(docs, col("lang") === "en", vocab = 1, n = 10)
      .as[(Long, Long, Long)].collect().toSeq
    // only 'c' survives: c_src 5, c_tgt 0 → t_tgt is 0 and the
    // greatest(t_tgt, 1) clamp must kick in (numerator 0, gap exact);
    // gap = 0 - (5·10⁶)//5 = -10⁶ per occurrence
    assert(got === Seq((2L, 1L, -1000000L), (3L, 4L, -4000000L)))
  }

  // ---- bpeMerges ----

  test("bpeMerges learns pair ranks by weighted count with lexicographic ties") {
    import spark.implicits._
    // word types: aa ×3, ab ×1. Round 1: (a,a) count 3 beats (a,b) 1;
    // round 2 merges the leftover (a,b); round 3 finds nothing and the
    // output stops at 2 rows even though merges=3.
    val docs = Seq((1L, "aa ab"), (2L, "aa aa")).toDF("doc_id", "text")
    val got = Curation.bpeMerges(docs, merges = 3)
      .as[(Int, String, String, Long, String, Long)].collect().toSeq
    assert(got === Seq(
      (1, "a", "a", 3L, "aa", 5L),  // 3 one-symbol 'aa' words + 'a b'
      (2, "a", "b", 1L, "ab", 4L)))
  }

  test("bpeMerges non-overlap contract: 'aaa' merges one pair per round") {
    import spark.implicits._
    // canonical BPE would take 'a a a' → 'aa a' too (leftmost-greedy),
    // but the count for round 1 sees BOTH adjacent pairs (weight 2);
    // the replace rewrite then merges only the non-overlapping first
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val got = Curation.bpeMerges(docs, merges = 2)
      .as[(Int, String, String, Long, String, Long)].collect().toSeq
    assert(got === Seq(
      (1, "a", "a", 2L, "aa", 2L),    // ' a a a ' → ' aa a ' (2 tokens)
      (2, "aa", "a", 1L, "aaa", 1L))) // the leftover pair merges next
  }

  // ---- bpeEncode ----

  test("bpeEncode applies trained merges per doc without crossing word gaps") {
    import spark.implicits._
    // training (same corpus as the bpeMerges spec + a rule-free doc):
    // rank 1 (a,a)→aa, rank 2 (a,b)→ab. Doc 1 ' a a  a b ' → ' aa  ab '
    // (2 symbols over 4 base chars); doc 3's whitespace run collapses
    // to ONE word gap and no rule touches 'b'/'c'.
    val docs = Seq((1L, "aa ab"), (2L, "aa aa"), (3L, " b  c "))
      .toDF("doc_id", "text")
    val got = Curation.bpeEncode(docs, merges = 2).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 2L, 4L, 2L, 500000L),
      (2L, 2L, 4L, 2L, 500000L),
      (3L, 2L, 2L, 2L, 1000000L)))
  }

  // ---- budgetSelect ----

  test("budgetSelect equals the greedy quality-ordered prefix under the budget") {
    import spark.implicits._
    val docs = (1L to 20L).map { i =>
      // four repeating text shapes → four quality classes with ties,
      // different lengths → unequal token masses
      (i, Seq("the cat sat, and the dog ran.",
        "aaa bbb ccc ddd eee fff ggg hhh iii jjj",
        "a and the, a and the, a and the!",
        "x y")(i.toInt % 4) * (1 + (i % 3)).toInt)
    }.toDF("doc_id", "text")
    val got = Curation.budgetSelect(docs, budgetPerMille = 500)
      .as[(Long, Double, Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    val budget = got.map(_._3).sum * 500 / 1000
    // brute greedy prefix over (quality desc, doc_id asc) — selection
    // logic only; the scorer itself is pinned by the q30/q113 oracles
    var cum = 0L
    val brute = got.sortBy(r => (-r._2, r._1)).map { r =>
      cum += r._3
      (r._1, cum, cum <= budget)
    }.sortBy(_._1)
    assert(got.map(r => (r._1, r._4, r._5)) === brute)
    assert(got.exists(_._5) && got.exists(!_._5)) // budget actually bites
  }

  test("budgetSelect: degenerate all-equal-quality corpus (one class) stays two-level") {
    import spark.implicits._
    // 5000 identical docs collapse into ONE quality class — the case
    // that funnels a naive per-class window through a single reducer.
    // With bucketWidth 64 the within-class state splits into ~79
    // id-range buckets (level 2 ≤ 64 rows each; level 1 windows the 79
    // bucket TOTALS) and the result must still be the exact greedy
    // prefix in doc-id order.
    val n = 5000L
    val docs = (1L to n).map((_, "the same document text, every time."))
      .toDF("doc_id", "text")
    val got = Curation.budgetSelect(docs, budgetPerMille = 250)
      .as[(Long, Double, Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    assert(got.size === n)
    assert(got.map(_._2).distinct.size === 1, "one quality class by construction")
    val per = got.head._3
    val budget = per * n * 250 / 1000
    got.foreach { case (id, _, tok, cum, sel) =>
      assert(tok === per)
      assert(cum === per * id, s"doc $id: cum must be the id-ordered prefix sum")
      assert(sel === (cum <= budget))
    }
    // the two-level plan: no window partition may exceed
    // max(bucketWidth, #buckets) rows — i.e. nothing reintroduced a
    // corpus-sized single partition
    assert(got.count(_._5) === (budget / per))
  }

  // ---- leakageSafeSplit ----

  test("leakageSafeSplit roots docs at their near-dup component") {
    import spark.implicits._
    // pairs chain 1~2~3 into one component rooted at min id 1; docs 4
    // and 5 are singletons rooted at themselves. Buckets are
    // md5-48(root) mod 1000: '1'→29, '4'→561 (train), '5'→847 (valid).
    val docs = (1L to 5L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = Curation.leakageSafeSplit(docs, pairs).orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, 29L, "train"), (2L, 1L, 29L, "train"),
      (3L, 1L, 29L, "train"), (4L, 4L, 561L, "train"),
      (5L, 5L, 847L, "valid")))
    // the leakage guard itself: every pair lands in ONE split
    val bySplit = got.groupBy(_._2).map { case (_, rs) => rs.map(_._4).toSet }
    assert(bySplit.forall(_.size == 1))
  }

  test("leakageSafeSplit rejects inverted thresholds") {
    import spark.implicits._
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    intercept[IllegalArgumentException] {
      Curation.leakageSafeSplit(docs, pairs,
        trainPerMille = 900, validPerMille = 800).collect()
    }
  }
}
