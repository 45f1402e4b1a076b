package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A1 per-conversion network aggregate
  * (`pkg/modules/chromium/network_aggregate.go:17-121`) as a typed
  * single-pass `Aggregator[IN, BUF, OUT]` — one traversal computes
  * request count, byte sum, failure count, distinct origins capped at
  * 64 (the reference's `maxTrackedOrigins`,
  * `network_aggregate.go:12`), and the heaviest resource (arg-max by
  * bytes, ties to the lexicographically-first URL so merges are
  * order-independent).
  *
  * This is the §2.9 aggregate-tier artifact: where the relational form
  * (q14) runs five built-in aggregates plus a window, the Aggregator
  * folds everything in one partial-merge-final pass — the shape to use
  * when the metrics set grows past what separate aggs amortize.
  */
object NetAggregate {

  final case class ResourceEvent(origin: String, url: String, bytes: Long, failed: Boolean)

  final case class NetBuf(
      var requests: Long,
      var bytes: Long,
      var failed: Long,
      var origins: Set[String],        // capped at MaxTrackedOrigins
      var originsOverflow: Boolean,    // true once the cap was hit
      var heaviestUrl: String,
      var heaviestBytes: Long)

  final case class NetStats(
      n_requests: Long, bytes_total: Long, n_failed: Long,
      n_origins: Long, origins_capped: Boolean,
      heaviest_url: String, heaviest_bytes: Long)

  val MaxTrackedOrigins = 64 // network_aggregate.go:12

  object agg extends Aggregator[ResourceEvent, NetBuf, NetStats] {

    override def zero: NetBuf = NetBuf(0L, 0L, 0L, Set.empty, false, "", -1L)

    private def trackOrigin(b: NetBuf, origin: String): Unit =
      if (!b.origins.contains(origin)) {
        if (b.origins.size < MaxTrackedOrigins) b.origins += origin
        else b.originsOverflow = true
      }

    private def trackHeaviest(b: NetBuf, url: String, bytes: Long): Unit =
      if (bytes > b.heaviestBytes ||
        (bytes == b.heaviestBytes && b.heaviestBytes >= 0 && url < b.heaviestUrl)) {
        b.heaviestUrl = url
        b.heaviestBytes = bytes
      }

    override def reduce(b: NetBuf, e: ResourceEvent): NetBuf = {
      b.requests += 1
      b.bytes += e.bytes
      if (e.failed) b.failed += 1
      trackOrigin(b, e.origin)
      trackHeaviest(b, e.url, e.bytes)
      b
    }

    override def merge(a: NetBuf, b: NetBuf): NetBuf = {
      a.requests += b.requests
      a.bytes += b.bytes
      a.failed += b.failed
      b.origins.foreach(trackOrigin(a, _))
      a.originsOverflow ||= b.originsOverflow
      if (b.heaviestBytes >= 0) trackHeaviest(a, b.heaviestUrl, b.heaviestBytes)
      a
    }

    override def finish(b: NetBuf): NetStats =
      NetStats(b.requests, b.bytes, b.failed, b.origins.size.toLong,
        b.originsOverflow, b.heaviestUrl, math.max(b.heaviestBytes, 0L))

    override def bufferEncoder: Encoder[NetBuf] = Encoders.product[NetBuf]
    override def outputEncoder: Encoder[NetStats] = Encoders.product[NetStats]
  }
}
