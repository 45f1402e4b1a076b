package graft.sources

import graft.frontier.CuckooFilter.mix
import graft.functions.UrlFunctions
import graft.model._

/** Deterministic synthetic web — the sandbox stand-in for the network.
  *
  * The reference fetches real URLs (Chromium navigate,
  * `chromium/tasks.go:396-441`; `downloadFrom` with retries,
  * `api/context.go:208-431`). Here every fetch is a pure function of the
  * canonical URL (seeded splitmix64 over its murmur3 hash): same URL →
  * same status, same document spans, same outlinks — on any executor, at
  * any parallelism. No wall-clock, no randomness (SURVEY.md §7.4
  * determinism risk).
  *
  * The generated universe is a closed graph of `numHosts` hosts ×
  * `pagesPerHost` paths, with a Zipf-ish host popularity skew so the
  * hot-host politeness path is exercised at scale.
  */
object SyntheticWeb {

  final case class Universe(
      numHosts: Int = 1000,
      pagesPerHost: Int = 10000,
      seed: Long = 42L,
      outlinksPerDoc: Int = 4,
      spansPerDoc: Int = 6,
      // request context applied per fetch (cookies by domain/path,
      // extra headers by scope regex — `chromium/events.go:123-180`)
      cookies: Seq[graft.operators.RouteOps.Cookie] = Nil,
      scopedHeaders: Seq[graft.operators.RouteOps.ScopedHeader] = Nil
  ) extends Serializable {

    def hostName(h: Int): String = s"host$h.example.test"
    def pageUrl(h: Int, p: Int): String = s"https://${hostName(h)}/page/$p"

    /** Skewed host pick: low indices are hot (approx Zipf via bit trick). */
    private def pickHost(r: Long): Int = {
      val u = (r >>> 11).toDouble / (1L << 53).toDouble // [0,1)
      val x = math.pow(u, 3.0) // cube → mass near 0
      math.min(numHosts - 1, (x * numHosts).toInt)
    }

    def seedUrl(i: Long): SeedUrl = {
      val r = mix(seed ^ (i * 0x9e3779b9L))
      val h = pickHost(r)
      val p = Math.floorMod(mix(r), pagesPerHost.toLong).toInt
      SeedUrl(pageUrl(h, p), priority = 1.0 + Math.floorMod(r, 100L) / 100.0, seq = i)
    }

    def seedUrls(n: Int): Seq[SeedUrl] = (0L until n.toLong).map(seedUrl)

    /** Distributed twin of [[seedUrls]] — same values, generated on the
      * executors (a 10^8-seed list must never be built on the driver).
      */
    def seedUrlsDS(spark: org.apache.spark.sql.SparkSession, n: Long,
                   partitions: Int = 64): org.apache.spark.sql.Dataset[SeedUrl] = {
      import spark.implicits._
      val self = this
      spark.range(0L, n, 1L, partitions).map(i => self.seedUrl(i))
    }

    /** HTTP status: deterministic sprinkle of failures (~3% 404, ~1% 500,
      * ~0.5% 503) plus ~2% redirects (301/302) keyed by url hash —
      * enough to exercise F6/F7 routing and the redirect-follow path.
      */
    def statusOf(urlHash: Long): Int = {
      val r = Math.floorMod(mix(urlHash ^ seed), 1000L)
      if (r < 30) 404 else if (r < 40) 500 else if (r < 45) 503
      else if (r < 65) { if (r % 2 == 0) 301 else 302 }
      else 200
    }

    /** Location target of a redirecting URL: a deterministic hop to
      * another page of the closed graph (chains arise naturally when
      * the target itself redirects).
      */
    def redirectTargetOf(urlCanon: String): String = {
      val r = mix(UrlFunctions.urlHash(urlCanon) ^ seed ^ 0x3e7dL)
      pageUrl(pickHost(r), Math.floorMod(mix(r), pagesPerHost.toLong).toInt)
    }

    /** Synthesize the document behind a canonical URL: interleaved
      * text/html/markdown/media spans (the input_hint shape). Span count,
      * kinds and payloads derive from the hash stream.
      */
    def docFor(urlCanon: String): Doc = {
      val h0 = UrlFunctions.urlHash(urlCanon) ^ seed
      val n = 1 + Math.floorMod(mix(h0), spansPerDoc.toLong).toInt
      val spans = (0 until n).map { i =>
        val r = mix(h0 + i + 1)
        Math.floorMod(r, 10L) match {
          case 0 | 1 =>
            DocSpan("markdown", s"# Section $i\n\nBody ${java.lang.Long.toHexString(r)} of $urlCanon", "", i)
          case 2 =>
            DocSpan("media", "", s"media://${java.lang.Long.toHexString(mix(r))}", i)
          case 3 | 4 | 5 =>
            DocSpan("html", s"<p>Para $i: ${java.lang.Long.toHexString(r)}</p>", "", i)
          case _ =>
            DocSpan("text", s"plain $i ${java.lang.Long.toHexString(r)}", "", i)
        }
      }
      Doc(urlCanon, spans)
    }

    /** Outlinks: closed-graph edges derived from the hash stream; some
      * links intentionally land on already-popular pages (dup pressure
      * for the seen set) and some carry canonicalization noise (upper
      * case host, default port, trailing slash) to exercise `seen-dup`.
      */
    def outlinksOf(urlCanon: String): Seq[String] = {
      val h0 = mix(UrlFunctions.urlHash(urlCanon) ^ seed ^ 0xabcdefL)
      (0 until outlinksPerDoc).map { i =>
        val r = mix(h0 + i)
        val h = pickHost(r)
        val p = Math.floorMod(mix(r ^ 0x5555L), pagesPerHost.toLong).toInt
        val base = pageUrl(h, p)
        Math.floorMod(r, 17L) match {
          case 0 => base.replace("https://", "https://").replace(hostName(h), hostName(h).toUpperCase) // case noise
          case 1 => base.replace("://" + hostName(h), "://" + hostName(h) + ":443")                    // default port
          case 2 => base + "/"                                                                          // trailing slash
          case _ => base
        }
      }
    }

    def bytesOf(urlHash: Long): Long = 2048 + Math.floorMod(mix(urlHash), 63L * 1024)

    /** Deterministic simulated fetch duration (ms): mostly fast, a long
      * tail of slow pages (~1% over 10 s, ~0.2% over 60 s) — the knob
      * the per-task deadline budget (`api/api.go:511`) is enforced
      * against.
      */
    def durationMs(urlHash: Long): Long = {
      val r = Math.floorMod(mix(urlHash ^ seed ^ 0x7177L), 1000L)
      if (r < 2) 60000L + Math.floorMod(mix(urlHash), 60000L)
      else if (r < 10) 10000L + Math.floorMod(mix(urlHash), 20000L)
      else 10L + Math.floorMod(mix(urlHash), 2000L)
    }

    /** Full synthetic fetch — ONE round trip, never a followed chain.
      * A 3xx response carries no content; its Location target is
      * emitted as the response's single outlink so the crawler
      * re-enqueues it through the FULL admission stack — canonicalize →
      * robots/allow-deny/IP-class → seen layer → politeness. That is
      * the reference's posture made frontier-shaped: Gotenberg's
      * outbound client re-validates EVERY redirect hop because the
      * round tripper runs per hop (`gotenberg/outbound.go:356-392`,
      * closing the redirect SSRF bypass); here each hop is literally
      * one more round trip through the filter stack. Redirect cycles
      * need no hop cap — the seen set extinguishes any chain that
      * revisits a URL, and a hop to a fresh URL is honest crawl work.
      */
    def fetch(e: FrontierEntry): FetchResult = {
      val status = statusOf(e.url_hash)
      if (status == 301 || status == 302) {
        val target = redirectTargetOf(e.url_canon)
        FetchResult(e.url_canon, e.url_hash, e.host, e.round, status, 0L,
          Doc(e.url_canon, Nil), Seq(target), error = "",
          duration_ms = durationMs(e.url_hash), redirects = 1, final_url = target)
      } else if (status != 200)
        FetchResult(e.url_canon, e.url_hash, e.host, e.round, status, 0L,
          Doc(e.url_canon, Nil), Nil, error = s"$status: fetch failed",
          duration_ms = durationMs(e.url_hash))
      else {
        val ck = graft.operators.RouteOps.cookiesFor(e.url_canon, cookies).size
        val hd = graft.operators.RouteOps.headersFor(e.url_canon, scopedHeaders).size
        FetchResult(e.url_canon, e.url_hash, e.host, e.round, 200, bytesOf(e.url_hash),
          docFor(e.url_canon), outlinksOf(e.url_canon), error = "",
          cookies_applied = ck, headers_applied = hd,
          duration_ms = durationMs(e.url_hash))
      }
    }
  }

  /** Default robots rules for the synthetic universe: deny a slice of
    * hosts by regex (every 97th), deny private IPs (the reference's
    * production posture).
    */
  def defaultRobots: Seq[RobotsRule] = Seq(
    RobotsRule("""^https://host\d*97\.example\.test/.*""", "deny",
      deny_private_ips = true, deny_public_ips = false),
    RobotsRule(""".*/page/1337$""", "deny", deny_private_ips = true, deny_public_ips = false)
  )

  /** Synthetic DNS: every 131st host resolves to a private address (the
    * IP-class deny path), everything else to a deterministic public IP.
    */
  def hostIps(h: Int): HostIps = {
    val ip =
      if (h % 131 == 130) s"10.0.${h % 256}.1"
      else s"93.${(h / 256) % 256}.${h % 256}.10"
    HostIps(s"host$h.example.test", Seq(ip))
  }

  def hostMap(numHosts: Int): Seq[HostIps] = (0 until numHosts).map(hostIps)

  /** Distributed twin of [[hostMap]] — same rows, generated on the
    * executors. A big host map passed as a local Seq becomes a
    * LocalRelation whose rows are serialized INTO every task closure of
    * the stage that scans it (the "task of very large size" warning);
    * generating from `spark.range` keeps task binaries constant-size.
    */
  def hostMapDS(spark: org.apache.spark.sql.SparkSession, numHosts: Int,
                partitions: Int = 32): org.apache.spark.sql.Dataset[HostIps] = {
    import spark.implicits._
    spark.range(0L, numHosts.toLong, 1L, partitions).map(h => hostIps(h.toInt))
  }
}
