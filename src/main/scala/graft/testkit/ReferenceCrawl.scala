package graft.testkit

import graft.functions.{IpFunctions, UrlFunctions}
import graft.model._
import graft.pipeline.ConvertPipeline
import graft.operators.SpanOps
import graft.sources.SyntheticWeb

import scala.collection.mutable

/** Straight-line, single-threaded crawl model — the oracle the Spark
  * engine is verified against (the role verapdf/pdftotext play for the
  * reference's integration tests, SURVEY.md §5). No Spark: plain Scala
  * collections, same pure scalar functions, same politeness semantics.
  * The engine must reproduce this model's final URL-seen set and
  * canonical frontier order at ANY parallelism (local[8] == local[32] ==
  * this model).
  */
object ReferenceCrawl {

  final case class RoundTrace(
      round: Int,
      admittedOrdered: Seq[String], // canonical order: (host_hash, -priority, seq, url)
      deniedCount: Int,
      fetchedDocs: Map[String, Doc])

  final case class Result(
      seen: Map[String, Int], // url_canon -> round_first_seen
      rounds: Seq[RoundTrace])

  /** Pure-scala twin of RobotsFilter.decide for one URL. */
  def robotsVerdict(urlCanon: String, rules: Seq[RobotsRule],
                    hostIps: Map[String, Seq[String]]): String = {
    val allows = rules.filter(_.rule == "allow").map(_.host_pattern)
    val denies = rules.filter(_.rule == "deny").map(_.host_pattern)
    val denyPrivate = rules.exists(_.deny_private_ips)
    val denyPublic = rules.exists(_.deny_public_ips)
    val norm = UrlFunctions.normalizeUrl(urlCanon)
    val scheme = UrlFunctions.schemeOf(norm)
    val host = UrlFunctions.hostOf(norm)
    val allowMatched = allows.exists(p => graft.operators.RouteOps.compiledPattern(p).matcher(norm).find())
    if (allows.nonEmpty && !allowMatched) return "denied: no allow-list match"
    if (denies.exists(p => graft.operators.RouteOps.compiledPattern(p).matcher(norm).find()))
      return "denied: matches denied list"
    if (allowMatched) return "ok"
    // http-like schemes (http, https, ws, wss — outbound.go:224-231) get
    // the resolution + IP-class checks; everything else passes
    if (scheme != "http" && scheme != "https" && scheme != "ws" && scheme != "wss") return "ok"
    if (host.isEmpty) return "denied: no host"
    if (denyPrivate || denyPublic) {
      val resolved = hostIps.getOrElse(host,
        if (IpFunctions.parseIp(host).isDefined) Seq(host) else Seq.empty)
      if (resolved.isEmpty) {
        if (denyPrivate) return "denied: non-public address"
        if (denyPublic) return "denied: public address"
      }
      if (denyPrivate && resolved.exists(ip => !IpFunctions.isPublicIp(ip)))
        return "denied: non-public address"
      if (denyPublic && resolved.exists(ip => IpFunctions.isPublicIp(ip)))
        return "denied: public address"
    }
    "ok"
  }

  def run(
      seeds: Seq[SeedUrl],
      robots: Seq[RobotsRule],
      hostIps: Map[String, Seq[String]],
      universe: SyntheticWeb.Universe,
      cfg: CrawlConfig,
      convertOptions: ConvertPipeline.Options = ConvertPipeline.Options()
  ): Result = {
    val seen = mutable.LinkedHashMap.empty[String, Int]
    var pending: Seq[(String, Double, Long)] = seeds.map(s => (s.url, s.priority, s.seq))
    val rounds = mutable.ArrayBuffer.empty[RoundTrace]
    var round = 0
    var continue = true

    while (continue && round < cfg.maxRounds) {
      // canonicalize + robots
      val canon = pending.map { case (u, p, s) => (UrlFunctions.canonicalizeUrl(u), p, s) }
      val (ok, denied) = canon.partition { case (u, _, _) =>
        robotsVerdict(u, robots, hostIps) == "ok"
      }
      // in-batch dedup: max priority, min seq per canon
      val dedup = ok.groupBy(_._1).map { case (u, rows) =>
        (u, rows.map(_._2).max, rows.map(_._3).min)
      }.toSeq
      // seen filter
      val fresh = dedup.filterNot { case (u, _, _) => seen.contains(u) }
      // politeness: quota per (host, saltIdx)
      val salts = math.max(1, cfg.saltsPerHost)
      val entries = fresh.map { case (u, p, s) =>
        val h = UrlFunctions.hostOf(u)
        val uh = UrlFunctions.urlHash(u)
        FrontierEntry(u, u, uh, h, UrlFunctions.hostSalt(h, uh, salts), p, s, round)
      }
      val admitted = entries.groupBy(e => (e.host, Math.floorMod(e.url_hash, salts.toLong).toInt))
        .toSeq.flatMap { case ((_, saltIdx), group) =>
          val quota = cfg.hostBudgetPerRound / salts +
            (if (saltIdx < cfg.hostBudgetPerRound % salts) 1 else 0)
          group.sortBy(e => (-e.priority, e.seq, e.url_canon)).take(quota)
        }
      val admittedSet = admitted.map(_.url_canon).toSet
      val deferred = entries.filterNot(e => admittedSet.contains(e.url_canon))

      // canonical global order (what the engine's sorted snapshot yields
      // when read back sorted by the same key)
      val ordered = admitted.sortBy(e => (e.host_hash, -e.priority, e.seq, e.url_canon))

      // fetch + convert
      val docs = mutable.LinkedHashMap.empty[String, Doc]
      val outlinks = mutable.ArrayBuffer.empty[(String, Double, Long)]
      ordered.foreach { e =>
        val f = universe.fetch(e)
        // per-row deadline budget mirror (api/api.go:511 soft+5s): a
        // timed-out fetch yields no doc and no outlinks, but is seen
        if (f.error.isEmpty && f.duration_ms <= cfg.softTimeoutMs + 5000L) {
          // 3xx: no content to convert; the Location target is the
          // response's one outlink and re-enters through the full
          // admission stack next round (the engine's redirect branch)
          if (f.status == 200) {
            val conv = ConvertPipeline(f.doc, convertOptions)
            if (!conv.isError) {
              val out = if (conv.docs.length == 1) conv.docs.head
                else SpanOps.merge(conv.docs, f.url_canon)
              docs(out.doc_id) = out
            }
          }
          f.outlinks.zipWithIndex.foreach { case (u, i) =>
            outlinks += ((u, 1.0 / (round + 2),
              UrlFunctions.murmur3(f.url_canon + "#" + i).toLong & Long.MaxValue))
          }
        } else {
          // failed fetches still produced outlinks = Nil in the engine
        }
        seen(e.url_canon) = round
      }

      rounds += RoundTrace(round, ordered.map(_.url_canon), denied.size, docs.toMap)
      pending = deferred.map(e => (e.url_canon, e.priority, e.seq)) ++ outlinks.toSeq
      continue = admitted.nonEmpty
      round += 1
    }
    Result(seen.toMap, rounds.toSeq)
  }
}
