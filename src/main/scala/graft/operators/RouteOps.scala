package graft.operators

import graft.functions.{AlphaSort, TextFunctions, UrlFunctions}
import graft.model._

/** Route-level operators that complete the SURVEY.md §2 inventory:
  * remote-fetch retry (S2), extension scan + binding (S4/S5), body
  * limit (A5), sub-resource filtering (F5), scoped headers (F11),
  * file:// prefix allow (events.go:277-287), output naming (S7).
  * All pure — used inside per-row map stages.
  */
object RouteOps {

  // -----------------------------------------------------------------
  // S2: downloadFrom retry (`api/context.go:208-431`): up to
  // maxRetries (default 4, `api/api.go:206`) attempts; retryable
  // statuses are 5xx; 4xx fails immediately. attemptOutcome is the
  // caller-supplied (deterministic, in tests hash-derived) per-attempt
  // result.
  // -----------------------------------------------------------------
  final case class FetchAttempts(status: Int, attempts: Int, error: String)

  def fetchWithRetry(maxRetries: Int)(attemptOutcome: Int => Int): FetchAttempts = {
    var attempt = 1
    var status = attemptOutcome(attempt)
    while (attempt < maxRetries && status >= 500) {
      attempt += 1
      status = attemptOutcome(attempt)
    }
    if (status == 200) FetchAttempts(status, attempt, "")
    else FetchAttempts(status, attempt, s"download failed with status $status after $attempt attempt(s)")
  }

  /** LibreOffice core-dump retry (`libreoffice/api/api.go:661-760`,
    * cap 10 at `:677`): retry only the ErrCoreDumped class.
    */
  def convertWithCoreDumpRetry[A](maxRetries: Int = 10)(op: Int => Either[String, A]): Either[String, A] = {
    var attempt = 1
    var res = op(attempt)
    while (attempt < maxRetries && res.left.exists(_ == "core dumped")) {
      attempt += 1
      res = op(attempt)
    }
    res
  }

  // -----------------------------------------------------------------
  // T3 compatibility surface: the 130 office extensions LibreOffice
  // accepts (`libreoffice/api/api.go:783-916`) — the route's input
  // gate; a user switching from the reference keeps the same set.
  // -----------------------------------------------------------------
  val OfficeExtensions: Set[String] = Set(
    ".123", ".602", ".abw", ".bib", ".bmp", ".cdr", ".cgm", ".cmx", ".csv",
    ".cwk", ".dbf", ".dif", ".doc", ".docm", ".docx", ".dot", ".dotm",
    ".dotx", ".dxf", ".emf", ".eps", ".epub", ".fodg", ".fodp", ".fods",
    ".fodt", ".fopd", ".gif", ".htm", ".html", ".hwp", ".jpeg", ".jpg",
    ".key", ".ltx", ".lwp", ".mcw", ".met", ".mml", ".mw", ".numbers",
    ".odd", ".odg", ".odm", ".odp", ".ods", ".odt", ".otg", ".oth", ".otp",
    ".ots", ".ott", ".pages", ".pbm", ".pcd", ".pct", ".pcx", ".pdb",
    ".pdf", ".pgm", ".png", ".pot", ".potm", ".potx", ".ppm", ".pps",
    ".ppt", ".pptm", ".pptx", ".psd", ".psw", ".pub", ".pwp", ".pxl",
    ".ras", ".rtf", ".sda", ".sdc", ".sdd", ".sdp", ".sdw", ".sgl", ".slk",
    ".smf", ".stc", ".std", ".sti", ".stw", ".svg", ".svm", ".swf", ".sxc",
    ".sxd", ".sxg", ".sxi", ".sxm", ".sxw", ".tga", ".tif", ".tiff",
    ".txt", ".uof", ".uop", ".uos", ".uot", ".vdx", ".vor", ".vsd",
    ".vsdm", ".vsdx", ".wb2", ".wk1", ".wks", ".wmf", ".wpd", ".wpg",
    ".wps", ".xbm", ".xhtml", ".xls", ".xlsb", ".xlsm", ".xlsx", ".xlt",
    ".xltm", ".xltx", ".xlw", ".xml", ".xpm", ".zabw")

  def isOfficeDocument(name: String): Boolean = OfficeExtensions.contains(extOf(name))

  // -----------------------------------------------------------------
  // S4/S5: file scan by extension (`api/formdata.go:375-450,499-556`):
  // case-insensitive extension match, excluding reserved buckets,
  // ordered by AlphanumericSort (O1). Spans carry the "filename" in
  // media_ref for file-like kinds.
  // -----------------------------------------------------------------
  def extOf(name: String): String = {
    val base = AlphaSort.baseName(name)
    val i = base.lastIndexOf('.')
    if (i < 0) "" else base.substring(i).toLowerCase
  }

  def selectByExtensions(names: Seq[String], exts: Seq[String],
                         exclude: Set[String] = Set.empty): Seq[String] =
    AlphaSort.sorted(names.filterNot(exclude)
      .filter(n => exts.contains(extOf(n))))

  def bindSingle(names: Seq[String], wanted: String): Option[String] =
    names.find { n =>
      val (bw, bn) = (AlphaSort.baseName(wanted), AlphaSort.baseName(n))
      val stripExt = (s: String) => { val i = s.lastIndexOf('.'); if (i < 0) s else s.take(i) }
      stripExt(bn) == stripExt(bw) && extOf(n) == extOf(wanted)
    }

  // -----------------------------------------------------------------
  // A5: body-size running sum guard (`api/context.go:61-81,107-119`):
  // cumulative payload bytes must stay ≤ limit; exceeding rows become
  // error rows (the 413 path).
  // -----------------------------------------------------------------
  def checkBodyLimit(doc: Doc, limitBytes: Long): Either[String, Doc] = {
    if (limitBytes <= 0) return Right(doc) // 0 = unlimited (api.go:240)
    val total = doc.spans.map(s =>
      s.text.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong).sum
    if (total > limitBytes) Left(s"body size $total exceeds limit $limitBytes")
    else Right(doc)
  }

  // -----------------------------------------------------------------
  // F5: sub-resource request filter (`chromium/events.go:58-189`):
  // every resource URL re-checked against allow/deny + IP class;
  // file:// resources pass only under an explicit prefix
  // (`events.go:277-287` — empty prefix list default-denies);
  // failures aggregate per document (A2 error join).
  // -----------------------------------------------------------------
  final case class ResourceVerdicts(allowed: Seq[String], errors: Seq[String])

  def filterSubResources(
      resourceUrls: Seq[String],
      rules: Seq[RobotsRule],
      hostIps: Map[String, Seq[String]],
      allowedFilePrefixes: Seq[String] = Nil
  ): ResourceVerdicts = {
    val (errs, ok) = resourceUrls.map { u =>
      if (u.startsWith("file://")) {
        if (isAllowedFileSubResource(u, allowedFilePrefixes)) Right(u)
        else Left(s"'$u': file access is not allowed")
      } else graft.testkit.ReferenceCrawl.robotsVerdict(
        UrlFunctions.normalizeUrl(u), rules, hostIps) match {
        case "ok" => Right(u)
        case reason => Left(s"'$u': $reason")
      }
    }.partitionMap(identity)
    ResourceVerdicts(ok, errs)
  }

  /** `isAllowedFileSubResource` port (`events.go:277-287`). */
  def isAllowedFileSubResource(rawUrl: String, prefixes: Seq[String]): Boolean =
    prefixes.nonEmpty && prefixes.exists(p => rawUrl.startsWith("file://" + p))

  // -----------------------------------------------------------------
  // F11: scoped extra headers (`chromium/routes.go:160-218`,
  // `events.go:123-180`): a header applies to a request URL iff its
  // scope regex (when present) matches.
  // -----------------------------------------------------------------
  final case class ScopedHeader(name: String, value: String, scope: Option[String])

  // scope regexes are a handful of operator-configured strings, but
  // headersFor runs once per fetched URL — cache the compiled Pattern
  // (immutable, thread-safe) instead of recompiling per request
  private val scopePatterns =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()
  private[graft] def compiledPattern(p: String): java.util.regex.Pattern =
    scopePatterns.computeIfAbsent(p, java.util.regex.Pattern.compile(_))

  def headersFor(url: String, headers: Seq[ScopedHeader]): Map[String, String] =
    headers.filter(h => h.scope.forall(p =>
      compiledPattern(p).matcher(url).find()))
      .map(h => h.name -> h.value).toMap

  // -----------------------------------------------------------------
  // S7 / zip naming (`libreoffice/routes.go:436-456,531-544`,
  // `pdfengines/routes.go:299-315`): `{original}` → `{original}.pdf`;
  // split parts `{base}_{i}.pdf`; multi-output keyed by sanitized
  // original name.
  // -----------------------------------------------------------------
  def pdfOutputName(original: String): String = {
    val s = TextFunctions.sanitizeFilename(original)
    val i = s.lastIndexOf('.')
    (if (i < 0) s else s.take(i)) + ".pdf"
  }

  def splitPartName(original: String, idx: Int): String = {
    val s = pdfOutputName(original)
    s.stripSuffix(".pdf") + s"_$idx.pdf"
  }

  /** Zip member ordering for multi-output responses: AlphanumericSort
    * of the sanitized names (`context.go:628-673` + O1).
    */
  def zipOrder(names: Seq[String]): Seq[String] =
    AlphaSort.sorted(names.map(TextFunctions.sanitizeFilename))

  // -----------------------------------------------------------------
  // F10 applied to cookie rows (`chromium/routes.go:117-158`).
  // -----------------------------------------------------------------
  final case class Cookie(name: String, value: String, domain: String,
      path: String = "/", secure: Boolean = false, httpOnly: Boolean = false,
      sameSite: String = "")

  def normalizeCookie(c: Cookie): Either[String, Cookie] = {
    if (c.name.isEmpty || c.value.isEmpty || c.domain.isEmpty)
      Left("cookie requires name, value and domain")
    else Right(c.copy(sameSite = TextFunctions.normalizeSameSite(c.sameSite)))
  }

  /** Cookies applicable to a request URL — the engine-side contract for
    * what Chromium does with `SetCookies` per request
    * (`chromium/chromium.go:382-410`, applied during `events.go`
    * request interception): domain suffix match (leading dot ignored),
    * path prefix match, secure-only over https.
    */
  def cookiesFor(url: String, cookies: Seq[Cookie]): Seq[Cookie] =
    graft.functions.UrlFunctions.parseUrl(url) match {
      case None => Nil
      case Some(u) =>
        val path = if (u.path.isEmpty) "/" else u.path
        cookies.filter { c =>
          val d = c.domain.stripPrefix(".")
          (u.host == d || u.host.endsWith("." + d)) &&
            path.startsWith(if (c.path.isEmpty) "/" else c.path) &&
            (!c.secure || u.scheme == "https")
        }
    }
}
