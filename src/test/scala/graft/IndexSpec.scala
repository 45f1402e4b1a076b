package graft

import graft.datatools.InvertedIndex
import org.scalacheck.Gen

class IndexSpec extends SparkSpec {
  import spark.implicits._

  test("postings = top-k by (tf desc, doc asc) with exact df (vs brute force)") {
    val words = Seq("the", "a", "crawl", "spark", "index")
    val gen = for {
      nd <- Gen.choose(0, 30)
      docs <- Gen.listOfN(nd, Gen.listOf(Gen.oneOf(words)).map(_.mkString(" ")))
      k <- Gen.oneOf(1, 3, 8)
      minDf <- Gen.oneOf(1L, 2L, 4L)
      parts <- Gen.oneOf(1, 4)
    } yield (docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }, k, minDf, parts)
    sample(gen, 15, 19L) { case (docs, k, minDf, parts) =>
      val tf = docs.filter(_._2.trim.nonEmpty)
        .flatMap { case (id, t) => t.trim.split("\\s+").map(tok => (tok, id)) }
        .groupBy(identity).map { case ((tok, id), xs) => (tok, id, xs.size.toLong) }
      val expect = tf.groupBy(_._1).flatMap { case (tok, ps) =>
        val df = ps.size.toLong
        if (df < minDf) Nil
        else ps.toSeq.sortBy(p => (-p._3, p._2)).take(k).zipWithIndex
          .map { case ((_, id, c), i) => (tok, df, (i + 1).toLong, id, c) }
      }.toSet
      val got = InvertedIndex.postings(
          docs.toDF("doc_id", "text").repartition(parts), k, minDf)
        .as[(String, Long, Long, Long, Long)].collect().toSet
      assert(got === expect, s"k=$k minDf=$minDf")
    }
  }

  test("search = tf × linearized-idf top-k vs brute force") {
    val words = Seq("the", "a", "crawl", "spark", "index", "zzz")
    val gen = for {
      nd <- Gen.choose(0, 30)
      docs <- Gen.listOfN(nd, Gen.listOf(Gen.oneOf(words)).map(_.mkString(" ")))
      k <- Gen.oneOf(3, 10)
      q <- Gen.someOf("the", "crawl", "index", "missing").map(_.toSeq)
        .suchThat(_.nonEmpty)
    } yield (docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }, k, q)
    sample(gen, 15, 53L) { case (docs, k, q) =>
      val nonEmpty = docs.filter(_._2.trim.nonEmpty)
      val n = nonEmpty.size.toLong
      val tf = nonEmpty
        .flatMap { case (id, t) => t.trim.split("\\s+").filter(q.contains).map(tok => (tok, id)) }
        .groupBy(identity).map { case ((tok, id), xs) => (tok, id, xs.size.toLong) }
      val dfm = tf.groupBy(_._1).map { case (tok, ps) => tok -> ps.size.toLong }
      val expect = tf.groupBy(_._2).map { case (id, ps) =>
        (id, ps.map(p => p._3 * ((n * 1000L) / dfm(p._1))).sum, ps.size.toLong)
      }.toSeq.sortBy(r => (-r._2, r._1)).take(k)
      val got = InvertedIndex.search(docs.toDF("doc_id", "text"), q, k)
        .as[(Long, Long, Long)].collect().toSeq
      assert(got === expect, s"k=$k q=$q")
    }
  }

  test("postings buffer stays bounded: a corpus-wide stopword still yields k rows") {
    val docs = (0L until 200L).map(i => (i, "stop stop other" + i))
    val got = InvertedIndex.postings(docs.toDF("doc_id", "text"), k = 5, minDf = 1L)
      .filter($"token" === "stop").collect()
    assert(got.length === 5)
    assert(got.map(_.getLong(1)).toSet === Set(200L)) // df = every doc
    // tf=2 everywhere, ties → lowest doc ids
    assert(got.map(_.getLong(3)).sorted.toSeq === (0L until 5L))
  }

  // ---- hybridRrf ----

  test("hybridRrf fuses lexical and dense ranks with 0-sentinel absences") {
    // doc 1 wins both modalities; doc 3 is dense-only (no 'x' token);
    // doc 2 is lexical-only (orthogonal vector). Query vector rides
    // vec_id 99, outside the corpus-id range, so nothing is excluded.
    val docs = Seq((1L, "x x x"), (2L, "x"), (3L, "y y")).toDF("doc_id", "text")
    val emb = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)), (3L, Seq(0.9, 0.1)),
      (99L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val out = InvertedIndex.hybridRrf(docs, emb, Seq(99L -> Seq("x")), k = 5)
      .collect().map(r => r.getLong(1) ->
        (r.getInt(2), r.getInt(3), r.getLong(4), r.getInt(5))).toMap
    // dense ranks against (1,0): d1 cos 1.0 → 1, d3 ≈ .994 → 2, d2 0 → 3
    val (b1, c1, rrf1, _) = out(1L)
    assert(c1 === 1 && b1 >= 1)
    assert(out(3L)._1 === 0, "doc 3 has no lexical hit → sentinel 0")
    assert(out(2L)._2 === 3)
    // rrf is exactly the integer fold of the emitted ranks
    out.foreach { case (_, (b, c, rrf, _)) =>
      val expect = (if (b > 0) 1000000L / (60 + b) else 0L) +
        (if (c > 0) 1000000L / (60 + c) else 0L)
      assert(rrf === expect)
    }
    // final rank order follows (rrf desc, doc asc)
    val byRank = out.toSeq.sortBy(_._2._4).map { case (d, (_, _, rrf, _)) => (d, rrf) }
    assert(byRank === out.toSeq.sortBy { case (d, (_, _, rrf, _)) => (-rrf, d) }
      .map { case (d, (_, _, rrf, _)) => (d, rrf) })
    assert(rrf1 === byRank.head._2 && byRank.head._1 === 1L)
  }

  test("hybridRrf shares one tf frame across queries (multi-query parity)") {
    // two queries over disjoint terms must each reproduce the
    // single-query bm25Search ranking for their own term set
    val docs = Seq((1L, "x x y"), (2L, "x z"), (3L, "z z z"), (4L, "y"))
      .toDF("doc_id", "text")
    val emb = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)),
      (3L, Seq(0.5, 0.5)), (4L, Seq(0.1, 0.9)),
      (7L, Seq(1.0, 0.0)), (8L, Seq(0.0, 1.0))).toDF("vec_id", "embedding")
    val out = InvertedIndex.hybridRrf(docs, emb,
        Seq(7L -> Seq("x"), 8L -> Seq("z")), k = 10)
      .select("query_id", "doc_id", "bm25_rank")
      .as[(Long, Long, Int)].collect()
    def lexRanks(qid: Long, terms: Seq[String]): Seq[(Long, Int)] =
      InvertedIndex.bm25Search(docs, terms, k = 10)
        .select("doc_id").as[Long].collect().toSeq.zipWithIndex
        .map { case (d, i) => (d, i + 1) }
    for ((qid, terms) <- Seq(7L -> Seq("x"), 8L -> Seq("z"))) {
      val got = out.filter(r => r._1 == qid && r._3 > 0)
        .map(r => (r._2, r._3)).sortBy(_._2).toSeq
      assert(got === lexRanks(qid, terms), s"query $qid")
    }
  }
}
