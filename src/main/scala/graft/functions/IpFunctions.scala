package graft.functions

/** IP-class predicate — exact port of the reference's public/non-public
  * classification (`pkg/gotenberg/outbound.go:69-114` `IsPublicIP` plus
  * the `nonPublicIPv6Prefixes` table at `outbound.go:40-80`).
  *
  * Pure scalar function: parse an address literal (v4 dotted quad or v6,
  * incl. v4-mapped / v4-compatible / `[bracketed]`), unmap v4-mapped v6,
  * then reject loopback / RFC1918-private / link-local (uni+multi) /
  * multicast / unspecified / interface-local multicast / unique-local,
  * plus the 8 deprecated-or-translation v6 prefixes (6to4, Teredo, NAT64
  * well-known + local-use, site-local, v4-compatible, documentation,
  * discard).
  *
  * No DNS is ever performed — resolution comes from the synthetic
  * `host_map` table (FIXTURES.md §1), mirroring the reference's
  * resolve-once pinning (`outbound.go:121-166`).
  */
object IpFunctions {

  /** Parse to 4 or 16 bytes; None when not an address literal. */
  def parseIp(s0: String): Option[Array[Byte]] = {
    val s = s0.trim.stripPrefix("[").stripSuffix("]")
    if (s.isEmpty) None
    else if (s.contains(':')) parseIpv6(s)
    else parseIpv4(s)
  }

  private def parseIpv4(s: String): Option[Array[Byte]] = {
    val parts = s.split("\\.", -1)
    if (parts.length != 4) return None
    val out = new Array[Byte](4)
    var i = 0
    while (i < 4) {
      val p = parts(i)
      if (p.isEmpty || p.length > 3 || !p.forall(_.isDigit)) return None
      val v = p.toInt
      if (v > 255) return None
      out(i) = v.toByte
      i += 1
    }
    Some(out)
  }

  private def parseIpv6(s: String): Option[Array[Byte]] = {
    // optional trailing dotted-quad
    val (body, v4tail) = s.lastIndexOf(':') match {
      case i if i >= 0 && s.substring(i + 1).contains('.') =>
        parseIpv4(s.substring(i + 1)) match {
          case Some(b) => (s.substring(0, i + 1) + "0:0", Some(b)) // placeholder 2 groups
          case None => return None
        }
      case _ => (s, None)
    }
    val halves = body.split("::", -1)
    if (halves.length > 2) return None
    def groups(part: String): Option[Array[Int]] =
      if (part.isEmpty) Some(Array.empty[Int])
      else {
        val gs = part.split(":", -1)
        val out = new Array[Int](gs.length)
        var i = 0
        while (i < gs.length) {
          val g = gs(i)
          if (g.isEmpty || g.length > 4 || !g.forall(c => Character.digit(c, 16) >= 0)) return None
          out(i) = Integer.parseInt(g, 16)
          i += 1
        }
        Some(out)
      }
    val full: Array[Int] = if (halves.length == 2) {
      (groups(halves(0)), groups(halves(1))) match {
        case (Some(h), Some(t)) if h.length + t.length <= 8 =>
          h ++ Array.fill(8 - h.length - t.length)(0) ++ t
        case _ => return None
      }
    } else groups(halves(0)) match {
      case Some(g) if g.length == 8 => g
      case _ => return None
    }
    val bytes = new Array[Byte](16)
    var i = 0
    while (i < 8) {
      bytes(2 * i) = ((full(i) >> 8) & 0xff).toByte
      bytes(2 * i + 1) = (full(i) & 0xff).toByte
      i += 1
    }
    v4tail.foreach { v4 => System.arraycopy(v4, 0, bytes, 12, 4) }
    Some(bytes)
  }

  private def ub(b: Byte): Int = b & 0xff

  /** True when the first `bits` of addr match the first `bits` of prefix. */
  private def inPrefix(addr: Array[Byte], prefix: Array[Byte], bits: Int): Boolean = {
    var remaining = bits
    var i = 0
    while (remaining >= 8) {
      if (addr(i) != prefix(i)) return false
      i += 1; remaining -= 8
    }
    if (remaining == 0) true
    else {
      val mask = (0xff << (8 - remaining)) & 0xff
      (ub(addr(i)) & mask) == (ub(prefix(i)) & mask)
    }
  }

  private def p6(s: String): Array[Byte] = parseIpv6(s).get

  // nonPublicIPv6Prefixes — outbound.go:69-80
  private val nonPublicV6: Seq[(Array[Byte], Int)] = Seq(
    (p6("2002::"), 16),       // 6to4 (RFC 3056)
    (p6("2001::"), 32),       // Teredo (RFC 4380)
    (p6("64:ff9b::"), 96),    // NAT64 well-known (RFC 6052)
    (p6("64:ff9b:1::"), 48),  // NAT64 local-use (RFC 8215)
    (p6("fec0::"), 10),       // deprecated site-local (RFC 3879)
    (p6("::"), 96),           // IPv4-compatible IPv6 (deprecated)
    (p6("2001:db8::"), 32),   // documentation (RFC 3849)
    (p6("100::"), 64)         // discard (RFC 6666)
  )

  private def isV4MappedV6(b: Array[Byte]): Boolean =
    b.length == 16 && (0 until 10).forall(b(_) == 0) && ub(b(10)) == 0xff && ub(b(11)) == 0xff

  /** netip.Addr.Unmap analog. */
  private def unmap(b: Array[Byte]): Array[Byte] =
    if (isV4MappedV6(b)) b.slice(12, 16) else b

  def isPublicIp(raw: String): Boolean = parseIp(raw) match {
    case None => false // invalid addr → not public (addr.IsValid() gate)
    case Some(b0) =>
      val b = unmap(b0)
      if (b.length == 4) {
        val a = ub(b(0)); val c = ub(b(1))
        val loopback = a == 127
        val priv = a == 10 || (a == 172 && c >= 16 && c <= 31) || (a == 192 && c == 168)
        val linkLocal = a == 169 && c == 254
        val multicast = a >= 224 && a <= 239
        val unspecified = b.forall(_ == 0)
        !(loopback || priv || linkLocal || multicast || unspecified)
      } else {
        val loopback = (0 until 15).forall(b(_) == 0) && ub(b(15)) == 1
        val unspecified = b.forall(_ == 0)
        val uniqueLocal = (ub(b(0)) & 0xfe) == 0xfc                  // fc00::/7 (IsPrivate)
        val linkLocalUni = ub(b(0)) == 0xfe && (ub(b(1)) & 0xc0) == 0x80 // fe80::/10
        val multicast = ub(b(0)) == 0xff                              // ff00::/8
        val ifaceLocalMulti = ub(b(0)) == 0xff && (ub(b(1)) & 0x0f) == 0x01
        val linkLocalMulti = ub(b(0)) == 0xff && (ub(b(1)) & 0x0f) == 0x02
        if (loopback || unspecified || uniqueLocal || linkLocalUni ||
            multicast || ifaceLocalMulti || linkLocalMulti) false
        else !nonPublicV6.exists { case (p, bits) => inPrefix(b, p, bits) }
      }
  }
}
