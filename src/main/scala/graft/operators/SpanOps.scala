package graft.operators

import graft.functions.{AlphaSort, TextFunctions}
import graft.model._

/** Span algebra — the per-document transform operators of SURVEY.md §2.3
  * (T1–T17), re-expressed over the `(kind, text, media_ref, offset)` span
  * model instead of PDF bytes.
  *
  * Encoding contract (the engine's documented stand-in for binary PDF
  * structure; the straight-line Scala model in tests is the oracle):
  *
  *   - `kind="page"`   — one rendered page; `text` is the page content;
  *     `media_ref` carries the page's attribute string
  *     `attr:k=v;k=v;…` (rotation, encryption, pdf format, flatten,
  *     watermark/stamp overlays) in deterministic key order;
  *   - `kind="meta"`   — document metadata; `text` = `k=v` pairs sorted;
  *   - `kind="bookmark"` — `text` = `title@page`, one span per node
  *     (depth-first), `media_ref` = depth;
  *   - `kind="embed"`  — embedded file; `media_ref` = original name;
  *   - `kind="media"`  — opaque media payload reference.
  *
  * Every operator has the reference's zero-value no-op guard (§4
  * SURVEY.md: split `pdfengines/routes.go:280-283`, convert `:351-354`,
  * rotate `:206-209`, encrypt `:701-704`, …), applied at plan/build time.
  */
object SpanOps {

  val PageKind = "page"
  val MetaKind = "meta"
  val BookmarkKind = "bookmark"
  val EmbedKind = "embed"

  /** Parse the attr channel of a page span. */
  def attrsOf(span: DocSpan): Map[String, String] =
    if (!span.media_ref.startsWith("attr:")) Map.empty
    else span.media_ref.drop(5).split(";").filter(_.nonEmpty)
      .map { kv => val i = kv.indexOf('='); kv.take(i) -> kv.drop(i + 1) }.toMap

  def withAttrs(span: DocSpan, attrs: Map[String, String]): DocSpan = {
    val enc =
      if (attrs.isEmpty) ""
      else "attr:" + attrs.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(";")
    span.copy(media_ref = enc)
  }

  private def mapPages(doc: Doc)(f: DocSpan => DocSpan): Doc =
    doc.copy(spans = doc.spans.map(s => if (s.kind == PageKind) f(s) else s))

  private def reoffset(spans: Seq[DocSpan]): Seq[DocSpan] =
    spans.zipWithIndex.map { case (s, i) => s.copy(offset = i) }

  // -----------------------------------------------------------------
  // T1 render (print-to-PDF, `chromium/tasks.go:39-181`): text-ish spans
  // become page spans (deterministic pagination: one source span = one
  // page, the shape of the pages-N fixtures); markdown goes through the
  // F9 projection first (`chromium/routes.go:709-782`); media spans pass
  // through. singlePage=true collapses to one page and recomputes paper
  // height (F13, `tasks.go:443-472`).
  // -----------------------------------------------------------------
  def render(doc: Doc, singlePage: Boolean = false,
             headerText: String = "", footerText: String = ""): Doc = {
    val pages = doc.spans.flatMap { s =>
      s.kind match {
        case "html" => Some(htmlToText(s.text))
        case "markdown" => Some(htmlToText(TextFunctions.markdownToHtml(s.text)))
        case "text" => Some(s.text)
        case _ => None
      }
    }
    val media = doc.spans.filter(_.kind == "media")
    val pageTexts = if (singlePage && pages.nonEmpty) Seq(pages.mkString("\n")) else pages
    val decorated = pageTexts.map { t =>
      val h = if (headerText.nonEmpty) headerText + "\n" else ""
      val f = if (footerText.nonEmpty) "\n" + footerText else ""
      h + t + f
    }
    doc.copy(spans = reoffset(
      decorated.map(t => DocSpan(PageKind, t, "", 0)) ++ media))
  }

  // -----------------------------------------------------------------
  // T2 screenshot (`chromium/tasks.go:183-243`): render the document to
  // ONE media span (png/jpeg/webp + quality + dimensions ride the attr
  // channel; the payload ref derives deterministically from content so
  // identical pages screenshot identically).
  // -----------------------------------------------------------------
  val ScreenshotFormats = Set("png", "jpeg", "webp")

  def screenshot(doc: Doc, format: String = "png", quality: Int = 100,
                 width: Int = 800, height: Int = 600): Either[String, Doc] = {
    if (!ScreenshotFormats.contains(format))
      return Left(s"screenshot format '$format' is not supported")
    if (quality < 0 || quality > 100)
      return Left(s"screenshot quality must be within [0, 100] (got $quality)")
    val rendered = render(doc)
    val content = rendered.spans.filter(_.kind == PageKind).map(_.text).mkString("\n")
    val ref = s"shot://${Integer.toHexString(graft.functions.UrlFunctions.murmur3(content))}.$format"
    val span = withAttrs(DocSpan("media", "", "", 0).copy(media_ref = ""),
      Map("fmt" -> format, "q" -> quality.toString, "w" -> width.toString, "h" -> height.toString))
    // attr channel occupies media_ref for pages; for a screenshot the
    // payload ref IS the identity, so attrs append after a '#'
    Right(doc.copy(spans = Seq(DocSpan("media", "", ref + "#" + span.media_ref.stripPrefix("attr:"), 0))))
  }

  // htmlToText runs once per html/markdown span of every fetched doc;
  // String.replaceAll would recompile each pattern per call (profiled as
  // a top frame in the convert stage), so the patterns are hoisted.
  private val ScriptStyleRe = java.util.regex.Pattern.compile("(?is)<(script|style)[^>]*>.*?</\\1>")
  private val AnyTagRe = java.util.regex.Pattern.compile("<[^>]+>")
  private val HorizWsRe = java.util.regex.Pattern.compile("[ \\t]+")

  /** Plain-text projection of HTML (tag strip + entity decode) — what the
    * reference's pdftotext oracle asserts against (`test/integration`).
    */
  def htmlToText(html: String): String = {
    val noTags =
      if (html.indexOf('<') < 0) html
      else AnyTagRe.matcher(ScriptStyleRe.matcher(html).replaceAll("")).replaceAll("")
    val decoded =
      if (noTags.indexOf('&') < 0) noTags
      else noTags.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
        .replace("&quot;", "\"").replace("&#39;", "'")
    HorizWsRe.matcher(decoded).replaceAll(" ").trim
  }

  // -----------------------------------------------------------------
  // T4 split (`pdfcpu/pdfcpu.go:164-230`; orchestration + renaming
  // `pdfengines/routes.go:279-332`): intervals → parts of N pages each;
  // pages → one part from a range (unify) or one part per page; naming
  // `{base}_{i}` preserved in span order (`routes.go:310`).
  // -----------------------------------------------------------------
  def split(doc: Doc, opts: SplitOptions): Seq[Doc] = {
    if (opts.mode.isEmpty) return Seq(doc) // no-op guard routes.go:280-283
    val pages = doc.spans.filter(_.kind == PageKind)
    val rest = doc.spans.filterNot(_.kind == PageKind)
    opts.mode match {
      case "intervals" =>
        val n = math.max(1, opts.span.toIntOption.getOrElse(1))
        pages.grouped(n).zipWithIndex.map { case (grp, i) =>
          Doc(s"${doc.doc_id}_$i", reoffset(grp ++ rest))
        }.toSeq
      case "pages" =>
        val selected = parsePageRange(opts.span, pages.length).map(pages(_))
        if (opts.unify) Seq(Doc(s"${doc.doc_id}_0", reoffset(selected ++ rest)))
        else selected.zipWithIndex.map { case (p, i) =>
          Doc(s"${doc.doc_id}_$i", reoffset(Seq(p) ++ rest))
        }
      case _ => Seq(doc)
    }
  }

  /** qpdf-style page range: "1-3,5,7-" (1-based, inclusive; "z" = last). */
  def parsePageRange(expr: String, numPages: Int): Seq[Int] = {
    if (expr.isEmpty) return 0 until numPages
    expr.split(",").toSeq.flatMap { part0 =>
      val part = part0.trim
      def bound(s: String, dflt: Int): Int =
        if (s.isEmpty) dflt else if (s == "z") numPages else s.toIntOption.getOrElse(dflt)
      if (part.contains("-")) {
        val Array(a, b) = part.split("-", -1).padTo(2, "")
        val lo = math.max(1, bound(a, 1)); val hi = math.min(numPages, bound(b, numPages))
        (lo to hi).map(_ - 1)
      } else {
        val p = bound(part, -1)
        if (p >= 1 && p <= numPages) Seq(p - 1) else Nil
      }
    }.distinct
  }

  // -----------------------------------------------------------------
  // T5 merge (`qpdf/qpdf.go:174-206`; order by AlphanumericSort per
  // `pdfengines/routes.go:913-1087` + `formdata.go:539-544`) with T12
  // bookmark shift (`routes.go:1011-1052`): each doc's bookmark pages
  // shift by the running page count of the docs before it.
  // -----------------------------------------------------------------
  def merge(docs: Seq[Doc], mergedId: String): Doc = {
    if (docs.length == 1) return docs.head.copy(doc_id = mergedId) // routes.go:263-265
    val ordered = docs.sortBy(_.doc_id)(AlphaSort.ordering)
    var pageOffset = 0
    val spans = ordered.flatMap { d =>
      val shifted = d.spans.map {
        case b if b.kind == BookmarkKind => shiftBookmark(b, pageOffset)
        case s => s
      }
      pageOffset += d.spans.count(_.kind == PageKind)
      shifted
    }
    Doc(mergedId, reoffset(spans))
  }

  def bookmarkSpan(title: String, page: Int, depth: Int = 0): DocSpan =
    DocSpan(BookmarkKind, s"$title@$page", depth.toString, 0)

  // -----------------------------------------------------------------
  // T11 read/write bookmarks (`pdfcpu/pdfcpu.go:303-480`): the nested
  // outline tree flattens to depth-first spans (depth rides media_ref)
  // and reconstructs exactly — the columnar form of the recursive
  // `Bookmark{title,page,children}` (`pdfengine.go:246-259`).
  // -----------------------------------------------------------------
  def bookmarksToSpans(tree: Seq[Bookmark], depth: Int = 0): Seq[DocSpan] =
    tree.flatMap(b => bookmarkSpan(b.title, b.page, depth) +:
      bookmarksToSpans(b.children, depth + 1))

  def spansToBookmarks(spans: Seq[DocSpan]): Seq[Bookmark] = {
    val flat = spans.filter(_.kind == BookmarkKind).map { s =>
      val i = s.text.lastIndexOf('@')
      (s.text.take(i), s.text.drop(i + 1).toIntOption.getOrElse(0),
        s.media_ref.toIntOption.getOrElse(0))
    }
    def build(from: Int, depth: Int): (Seq[Bookmark], Int) = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Bookmark]
      var i = from
      while (i < flat.length && flat(i)._3 >= depth) {
        if (flat(i)._3 == depth) {
          val (title, page, _) = flat(i)
          val (children, next) = build(i + 1, depth + 1)
          out += Bookmark(title, page, children)
          i = next
        } else i += 1 // malformed depth jump: skip
      }
      (out.toSeq, i)
    }
    build(0, 0)._1
  }

  /** Write bookmarks onto a doc (replacing existing outline). */
  def writeBookmarks(doc: Doc, tree: Seq[Bookmark]): Doc =
    doc.copy(spans = reoffset(
      doc.spans.filterNot(_.kind == BookmarkKind) ++ bookmarksToSpans(tree)))

  def readBookmarks(doc: Doc): Seq[Bookmark] = spansToBookmarks(doc.spans)

  def shiftBookmark(span: DocSpan, offset: Int): DocSpan = {
    val i = span.text.lastIndexOf('@')
    if (i < 0) span
    else span.text.drop(i + 1).toIntOption match {
      case Some(p) => span.copy(text = span.text.take(i + 1) + (p + offset))
      case None => span
    }
  }

  // -----------------------------------------------------------------
  // T6 flatten (`qpdf/qpdf.go:210-242`) — idempotent page attribute.
  // -----------------------------------------------------------------
  def flatten(doc: Doc): Doc =
    mapPages(doc)(s => withAttrs(s, attrsOf(s) + ("flat" -> "1")))

  // -----------------------------------------------------------------
  // T7 convert to PDF/A / PDF/UA (`libreoffice/pdfengine/pdfengine.go:
  // 64-83`): format tag; zero-valued → no-op (routes.go:351-354).
  // Supported: PDF/A-1b, 2b, 3b, UA-1 — anything else is the
  // ErrPdfFormatNotSupported path.
  // -----------------------------------------------------------------
  val SupportedPdfA = Set("PDF/A-1b", "PDF/A-2b", "PDF/A-3b")
  val SupportedPdfUa = Set("PDF/UA-1", "PDF/UA-2")

  def convert(doc: Doc, pdfa: String, pdfua: String): Either[String, Doc] = {
    if (pdfa.isEmpty && pdfua.isEmpty) return Right(doc) // no-op guard
    if (pdfa.nonEmpty && !SupportedPdfA.contains(pdfa))
      return Left(s"PDF format '$pdfa' is not supported")
    if (pdfua.nonEmpty && !SupportedPdfUa.contains(pdfua))
      return Left(s"PDF format '$pdfua' is not supported")
    Right(mapPages(doc) { s =>
      val a = attrsOf(s) ++
        (if (pdfa.nonEmpty) Map("fmt" -> pdfa) else Map.empty) ++
        (if (pdfua.nonEmpty) Map("ua" -> pdfua) else Map.empty)
      withAttrs(s, a)
    })
  }

  // -----------------------------------------------------------------
  // T8/T9 metadata (`exiftool/exiftool.go:301-402`). System tags the
  // reader strips (exiftool.go:53-65) and writer-rejected pseudo-tags.
  // -----------------------------------------------------------------
  val SystemTags: Set[String] = Set(
    "SourceFile", "ExifToolVersion", "FileName", "Directory", "FileSize",
    "FileModifyDate", "FileAccessDate", "FileInodeChangeDate",
    "FilePermissions", "FileType", "FileTypeExtension")
  val DangerousTags: Set[String] = Set(
    "SourceFile", "ExifToolVersion", "FileName", "Directory", "AllDates")

  def readMetadata(doc: Doc): Map[String, String] =
    doc.spans.find(_.kind == MetaKind).map { s =>
      s.text.split("\n").filter(_.nonEmpty)
        .map { kv => val i = kv.indexOf('='); kv.take(i) -> kv.drop(i + 1) }.toMap
        .filterNot { case (k, _) => SystemTags.contains(k) }
    }.getOrElse(Map.empty)

  def writeMetadata(doc: Doc, metadata: Map[String, String]): Either[String, Doc] = {
    if (metadata.isEmpty) return Right(doc) // no-op guard routes.go:372-374
    val bad = metadata.keys.find(k => k.exists(c => c < 0x20) || metadata(k).exists(c => c < 0x20 && c != '\t'))
    if (bad.isDefined) return Left(s"metadata key/value contains control characters: '${bad.get}'")
    val clean = metadata.filterNot { case (k, _) => DangerousTags.contains(k) }
    val existing = readMetadata(doc)
    val mergedText = (existing ++ clean).toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }.mkString("\n")
    val without = doc.spans.filterNot(_.kind == MetaKind)
    Right(doc.copy(spans = reoffset(without :+ DocSpan(MetaKind, mergedText, "", 0))))
  }

  // T10 page count (`exiftool/exiftool.go:403-455`)
  def pageCount(doc: Doc): Int = doc.spans.count(_.kind == PageKind)

  // -----------------------------------------------------------------
  // T13 encrypt (`qpdf/qpdf.go:359-407`): owner password defaults to the
  // user password; AES-256; permissions require a password
  // (`pdfengines/routes.go:688-697`); PDF/A ∧ encryption → error
  // (F14, routes.go:223-254).
  // -----------------------------------------------------------------
  def encrypt(doc: Doc, opts: EncryptOptions): Either[String, Doc] = {
    if (opts.userPassword.isEmpty && opts.ownerPassword.isEmpty) return Right(doc) // no-op
    val hasPdfA = doc.spans.exists(s => attrsOf(s).contains("fmt"))
    if (hasPdfA) return Left("PDF/A and encryption cannot be combined")
    val user = if (opts.userPassword.nonEmpty) opts.userPassword else opts.ownerPassword
    val owner = if (opts.ownerPassword.nonEmpty) opts.ownerPassword else user
    val perms = Seq(
      "print" -> opts.allowPrinting, "modify" -> opts.allowModifying,
      "copy" -> opts.allowCopying, "annotate" -> opts.allowAnnotating,
      "fill" -> opts.allowFillingForms, "access" -> opts.allowAccessibility
    ).collect { case (k, false) => k }.mkString(",")
    val fp = Integer.toHexString(graft.functions.UrlFunctions.murmur3(s"$user|$owner"))
    Right(mapPages(doc) { s =>
      withAttrs(s, attrsOf(s) + ("enc" -> s"aes256:$fp") ++
        (if (perms.nonEmpty) Map("deny" -> perms) else Map.empty))
    })
  }

  // -----------------------------------------------------------------
  // T15 watermark / stamp (`pdfcpu/pdfcpu.go:591-661`): behind vs above
  // content; pages range; source text/image/pdf.
  // -----------------------------------------------------------------
  def stampOrWatermark(doc: Doc, opts: StampOptions, above: Boolean): Doc = {
    if (opts.sourceKind.isEmpty) return doc // no-op guard routes.go:880-883
    val key = if (above) "stamp" else "wm"
    val pages = doc.spans.filter(_.kind == PageKind)
    val targets = parsePageRange(opts.pages, pages.length).toSet
    var pageIdx = -1
    doc.copy(spans = doc.spans.map { s =>
      if (s.kind != PageKind) s
      else {
        pageIdx += 1
        if (!targets.contains(pageIdx)) s
        else withAttrs(s, attrsOf(s) + (key -> s"${opts.sourceKind}:${opts.source}"))
      }
    })
  }

  // T16 rotate (`pdfcpu/pdfcpu.go:629-661`; pdftk all-pages only)
  def rotate(doc: Doc, angle: Int, pages: String = ""): Doc = {
    if (angle % 360 == 0) return doc // no-op guard routes.go:206-209
    val pageSpans = doc.spans.filter(_.kind == PageKind)
    val targets = parsePageRange(pages, pageSpans.length).toSet
    var pageIdx = -1
    doc.copy(spans = doc.spans.map { s =>
      if (s.kind != PageKind) s
      else {
        pageIdx += 1
        if (!targets.contains(pageIdx)) s
        else {
          val prev = attrsOf(s).get("rot").flatMap(_.toIntOption).getOrElse(0)
          withAttrs(s, attrsOf(s) + ("rot" -> (((prev + angle) % 360 + 360) % 360).toString))
        }
      }
    })
  }

  // -----------------------------------------------------------------
  // T14 embed files (`pdfengines/routes.go:716-750`; qpdf
  // `qpdf/qpdf.go:425-478`) + per-file metadata; names sanitized and kept
  // as identity (symlink dance → media_ref indirection).
  // -----------------------------------------------------------------
  def embedFiles(doc: Doc, names: Seq[String], metadata: Map[String, Map[String, String]] = Map.empty): Doc = {
    if (names.isEmpty) return doc
    val embeds = names.map(TextFunctions.sanitizeFilename).sorted.map { n =>
      val md = metadata.getOrElse(n, Map.empty)
      val txt = md.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("\n")
      DocSpan(EmbedKind, txt, n, 0)
    }
    doc.copy(spans = reoffset(doc.spans ++ embeds))
  }

  // -----------------------------------------------------------------
  // T17 Factur-X (`pdfengines/routes.go:470-668`; decision rule
  // `routes.go:568-593`): requires/forces PDF/A-3b, embeds the canonical
  // `factur-x.xml` (`pdfengine.go:239-241`) with AFRelationship
  // Alternative, stamps conformance XMP.
  // -----------------------------------------------------------------
  val FacturXFilename = "factur-x.xml"

  def applyFacturX(doc: Doc, xml: String, conformance: String): Either[String, Doc] = {
    if (xml.isEmpty) return Right(doc) // no-op guard routes.go:599-601
    val curFmt = doc.spans.flatMap(s => attrsOf(s).get("fmt")).headOption
    if (curFmt.exists(f => f != "PDF/A-3b"))
      return Left(s"Factur-X requires PDF/A-3b, document is '${curFmt.get}'")
    val asA3 = convert(doc, "PDF/A-3b", "").toOption.get
    val embed = DocSpan(EmbedKind, s"AFRelationship=Alternative\nconformance=$conformance",
      FacturXFilename, 0)
    val stamped = mapPages(asA3)(s => withAttrs(s, attrsOf(s) + ("fx" -> conformance)))
    Right(stamped.copy(spans = reoffset(stamped.spans :+ embed)))
  }
}
