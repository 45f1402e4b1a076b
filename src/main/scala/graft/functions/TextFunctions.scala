package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Text/scalar ports: filename sanitize, unit conversion, sameSite
  * normalization, byte-size parse, markdown→HTML (+ sanitizer).
  */
object TextFunctions {

  /** Port of `sanitizeFilename` (`pkg/modules/api/context.go:692-703`):
    * keep only the segment after the last '/' or '\', strip control
    * chars (<0x20 and 0x7f), NFC-normalize. Affects identity / span
    * equality, so parity matters.
    */
  def sanitizeFilename(name0: String): String = {
    var name = name0
    val i = math.max(name.lastIndexOf('/'), name.lastIndexOf('\\'))
    if (i >= 0) name = name.substring(i + 1)
    val sb = new StringBuilder(name.length)
    name.foreach { c => if (c >= 0x20 && c != 0x7f) sb.append(c) }
    Normalizer.normalize(sb.toString, Normalizer.Form.NFC)
  }

  /** Port of `FormData.inches` (`pkg/modules/api/formdata.go:199-250`).
    * Unit divisors are exact: pt/72, px/96, in/1, mm/25.4, cm/2.54, pc/6.
    * Empty → None (reference sets -MaxFloat sentinel); unparsable → None.
    */
  def toInches(value0: String): Option[Double] = {
    val value = value0
    if (value.isEmpty) return None
    val units = Seq("pt" -> 72.0, "px" -> 96.0, "in" -> 1.0,
      "mm" -> 25.4, "cm" -> 2.54, "pc" -> 6.0)
    units.collectFirst {
      case (u, div) if value.endsWith(u) => (value.dropRight(u.length), div)
    } match {
      case Some((num, div)) => num.toDoubleOption.map(_ * (1.0 / div))
      case None => value.toDoubleOption
    }
  }

  /** Go `time.ParseDuration` twin (std `time/format.go`; the binding
    * used by the `waitDelay` form field, `chromium/routes.go:113`):
    * an optional sign, then one or more decimal[.frac]unit terms with
    * unit ∈ ns, us, µs, μs, ms, s, m, h (e.g. "1.5s", "1m30s",
    * "300ms"). Returns whole milliseconds; None for anything Go would
    * reject ("", bare numbers, unknown units).
    */
  def parseGoDuration(s0: String): Option[Long] = {
    if (s0 == null) return None
    var s = s0
    var sign = 1L
    if (s.startsWith("+")) s = s.substring(1)
    else if (s.startsWith("-")) { sign = -1L; s = s.substring(1) }
    if (s == "0") return Some(0L)
    if (s.isEmpty) return None
    // longest units first so "ms" wins over "m" + stray "s"
    val units = Seq("ns" -> 1.0, "us" -> 1e3, "µs" -> 1e3, "μs" -> 1e3,
      "ms" -> 1e6, "s" -> 1e9, "m" -> 6e10, "h" -> 3.6e12)
    var nanos = 0.0
    var i = 0
    while (i < s.length) {
      val start = i
      while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
      if (i == start) return None // term must start with a number
      val num = s.substring(start, i).toDoubleOption.getOrElse(return None)
      val rest = s.substring(i)
      val unit = units.filter { case (u, _) => rest.startsWith(u) }
        .sortBy(-_._1.length).headOption.getOrElse(return None)
      nanos += num * unit._2
      i += unit._1.length
    }
    Some(sign * (nanos / 1e6).toLong)
  }

  def goDurationMsCol(c: Column): Column = {
    val f = udf((s: String) => parseGoDuration(s))
    f(c)
  }

  /** sameSite canonicalization (`chromium/routes.go:27-30,117-158`):
    * case-insensitive lax|strict|none → Lax|Strict|None; anything else
    * unchanged.
    */
  def normalizeSameSite(v: String): String = v.toLowerCase match {
    case "lax" => "Lax"
    case "strict" => "Strict"
    case "none" => "None"
    case _ => v
  }

  /** Byte-size parse ("5MB" — humanize-style, `api/api.go:197,240`).
    * Supports B/KB/MB/GB/TB decimal and KiB/MiB/GiB binary, bare = bytes.
    */
  def parseByteSize(s0: String): Option[Long] = {
    val s = s0.trim
    val re = """^([0-9]*\.?[0-9]+)\s*([A-Za-z]*)$""".r
    s match {
      case re(num, unit) =>
        val mult: Option[Double] = unit.toUpperCase match {
          case "" | "B" => Some(1d)
          case "KB" => Some(1e3); case "MB" => Some(1e6)
          case "GB" => Some(1e9); case "TB" => Some(1e12)
          case "KIB" => Some(1024d); case "MIB" => Some(1024d * 1024)
          case "GIB" => Some(math.pow(1024, 3)); case "TIB" => Some(math.pow(1024, 4))
          case _ => None
        }
        mult.map(m => (num.toDouble * m).toLong)
      case _ => None
    }
  }

  // ---------------------------------------------------------------------
  // Markdown → HTML (F9, `chromium/routes.go:709-782` `toHTML`): the
  // reference pipes each .md file through gomarkdown and sanitizes with
  // bluemonday UGC. Ours is a deterministic commonmark subset with an
  // allowlist sanitizer — the engine's documented markdown spec; golden
  // fixtures pin it (SURVEY.md §7.4 markdown-parity risk).
  // ---------------------------------------------------------------------

  private val allowedTags = Set(
    "p", "br", "h1", "h2", "h3", "h4", "h5", "h6", "em", "strong", "code",
    "pre", "blockquote", "ul", "ol", "li", "a", "img", "hr", "table",
    "thead", "tbody", "tr", "th", "td")

  // These run once per span of every fetched markdown doc — hoisted so
  // the pattern compiles once per JVM, not once per call (per-row
  // Pattern.compile profiled as a top frame in the crawl convert stage).
  private val DangerBlockRe =
    java.util.regex.Pattern.compile("(?is)<(script|style|iframe|object|embed|form)[^>]*>.*?</\\1>")
  private val DangerTagRe =
    java.util.regex.Pattern.compile("(?is)<(script|style|iframe|object|embed|form)[^>]*/?>")
  private val OnHandlerRe =
    java.util.regex.Pattern.compile("(?i)\\son[a-z]+\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\\s>]+)")
  private val JsUrlRe =
    java.util.regex.Pattern.compile("(?i)(href|src)\\s*=\\s*([\"']?)\\s*javascript:[^\"'>\\s]*\\2")
  private val AnyTagRe = "(?i)</?([a-z][a-z0-9]*)(\\s[^>]*)?/?>".r
  private val MdImgRe = java.util.regex.Pattern.compile("""!\[([^\]]*)\]\(([^)\s]+)\)""")
  private val MdLinkRe = java.util.regex.Pattern.compile("""\[([^\]]+)\]\(([^)\s]+)\)""")
  private val MdStrongRe = java.util.regex.Pattern.compile("""\*\*([^*]+)\*\*""")
  private val MdEmRe = java.util.regex.Pattern.compile("""(?<!\*)\*([^*]+)\*(?!\*)""")
  private val MdCodeRe = java.util.regex.Pattern.compile("""`([^`]+)`""")

  /** Strip disallowed tags (script/style/iframe/… and event handlers). */
  def sanitizeHtml(html: String): String = {
    if (html.indexOf('<') < 0) return html
    // drop script/style blocks wholesale
    var out = DangerBlockRe.matcher(html).replaceAll("")
    out = DangerTagRe.matcher(out).replaceAll("")
    // drop on*= handlers and javascript: urls inside remaining tags
    out = OnHandlerRe.matcher(out).replaceAll("")
    out = JsUrlRe.matcher(out).replaceAll("$1=$2$2")
    // remove any tag not in the allowlist (keep inner text)
    AnyTagRe.replaceAllIn(out, m =>
      if (allowedTags.contains(m.group(1).toLowerCase))
        java.util.regex.Matcher.quoteReplacement(m.matched)
      else "")
  }

  private def inline(s0: String): String = {
    var s = escapeHtml(s0)
    // indexOf guards: a pattern whose marker char is absent can't match,
    // and most markdown lines carry no inline markup at all
    if (s.indexOf('!') >= 0) s = MdImgRe.matcher(s).replaceAll("""<img src="$2" alt="$1" />""")
    if (s.indexOf('[') >= 0) s = MdLinkRe.matcher(s).replaceAll("""<a href="$2">$1</a>""")
    if (s.indexOf('*') >= 0) {
      s = MdStrongRe.matcher(s).replaceAll("<strong>$1</strong>")
      s = MdEmRe.matcher(s).replaceAll("<em>$1</em>")
    }
    if (s.indexOf('`') >= 0) s = MdCodeRe.matcher(s).replaceAll("<code>$1</code>")
    s
  }

  def escapeHtml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** Deterministic commonmark-subset renderer: ATX headings, fenced code,
    * unordered/ordered lists, blockquotes, hr, paragraphs, inline
    * em/strong/code/link/img. Output is sanitized.
    */
  private val MdHeadingRe = java.util.regex.Pattern.compile("^#{1,6}\\s.*")
  private val MdHrRe = java.util.regex.Pattern.compile("^(-{3,}|\\*{3,}|_{3,})$")
  private val MdOlRe = java.util.regex.Pattern.compile("^\\d+\\.\\s.*")

  def markdownToHtml(md: String): String = {
    val lines = md.split("\n", -1)
    val out = new StringBuilder
    var i = 0
    var para = List.empty[String]
    def flushPara(): Unit = if (para.nonEmpty) {
      out.append("<p>").append(para.reverse.map(inline).mkString("<br />")).append("</p>\n")
      para = Nil
    }
    while (i < lines.length) {
      val line = lines(i)
      val t = line.trim
      if (t.startsWith("```")) {
        flushPara()
        val buf = new StringBuilder
        i += 1
        while (i < lines.length && !lines(i).trim.startsWith("```")) {
          buf.append(escapeHtml(lines(i))).append("\n"); i += 1
        }
        out.append("<pre><code>").append(buf).append("</code></pre>\n")
      } else if (MdHeadingRe.matcher(t).matches()) {
        flushPara()
        val level = t.takeWhile(_ == '#').length
        out.append(s"<h$level>").append(inline(t.drop(level).trim)).append(s"</h$level>\n")
      } else if (MdHrRe.matcher(t).matches()) {
        flushPara(); out.append("<hr />\n")
      } else if (t.startsWith("- ") || t.startsWith("* ")) {
        flushPara()
        out.append("<ul>\n")
        while (i < lines.length && {
          val u = lines(i).trim; u.startsWith("- ") || u.startsWith("* ")
        }) { out.append("<li>").append(inline(lines(i).trim.drop(2))).append("</li>\n"); i += 1 }
        i -= 1
        out.append("</ul>\n")
      } else if (MdOlRe.matcher(t).matches()) {
        flushPara()
        out.append("<ol>\n")
        while (i < lines.length && MdOlRe.matcher(lines(i).trim).matches()) {
          val u = lines(i).trim
          out.append("<li>").append(inline(u.substring(u.indexOf('.') + 1).trim)).append("</li>\n")
          i += 1
        }
        i -= 1
        out.append("</ol>\n")
      } else if (t.startsWith("> ")) {
        flushPara()
        out.append("<blockquote>").append(inline(t.drop(2))).append("</blockquote>\n")
      } else if (t.isEmpty) {
        flushPara()
      } else {
        para = t :: para
      }
      i += 1
    }
    flushPara()
    sanitizeHtml(out.toString)
  }
}
