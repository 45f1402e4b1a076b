package graft

import graft.model._
import graft.operators.{Engines, SpanOps}
import graft.pipeline.ConvertPipeline
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the span algebra — ports of the reference's
  * integration fixtures (FIXTURES.md §3, `test/integration/features/`).
  */
class SpanOpsSpec extends AnyFunSuite {

  private def doc(id: String, spans: (String, String)*): Doc =
    Doc(id, spans.zipWithIndex.map { case ((k, t), i) => DocSpan(k, t, "", i) })

  private def pages(n: Int, id: String = "d"): Doc =
    Doc(id, (0 until n).map(i => DocSpan("page", s"Page ${i + 1}", "", i)))

  // ---- T1 render: page-1 / pages-12 / singlePage fixtures ----

  test("render: one html span → one page span with extracted text (page-1 fixture)") {
    val d = SpanOps.render(doc("d", "html" -> "<h1>Page 1</h1>"))
    assert(d.spans.map(s => (s.kind, s.text)) === Seq(("page", "Page 1")))
  }

  test("render: 12 html spans → 12 pages; singlePage → 1 (pages-12 fixture)") {
    val twelve = doc("d", (1 to 12).map(i => "html" -> s"<p>Page $i</p>"): _*)
    assert(SpanOps.render(twelve).spans.count(_.kind == "page") === 12)
    val single = SpanOps.render(twelve, singlePage = true)
    assert(single.spans.count(_.kind == "page") === 1)
    assert(single.spans.head.text.contains("Page 1") && single.spans.head.text.contains("Page 12"))
  }

  test("render: markdown goes through F9, media passes through, offsets dense") {
    val d = Doc("d", Seq(
      DocSpan("markdown", "# Hello\n\nworld **x**", "", 0),
      DocSpan("media", "", "media://abc", 1),
      DocSpan("text", "tail", "", 2)))
    val r = SpanOps.render(d)
    assert(r.spans.map(_.kind) === Seq("page", "page", "media"))
    assert(r.spans.head.text.contains("Hello"))
    assert(r.spans.map(_.offset) === Seq(0, 1, 2))
    assert(r.spans(2).media_ref === "media://abc")
  }

  test("render: header/footer text decorates every page") {
    val r = SpanOps.render(doc("d", "html" -> "<p>a</p>", "html" -> "<p>b</p>"),
      headerText = "H", footerText = "F")
    assert(r.spans.forall(s => s.text.startsWith("H\n") && s.text.endsWith("\nF")))
  }

  // ---- T2 screenshot ----

  test("screenshot: one media span, deterministic ref, format/quality validated") {
    val d = doc("d", "html" -> "<p>One</p>", "html" -> "<p>Two</p>")
    val s1 = SpanOps.screenshot(d, "png", 90).toOption.get
    assert(s1.spans.length === 1 && s1.spans.head.kind === "media")
    assert(s1.spans.head.media_ref.startsWith("shot://"))
    assert(s1.spans.head.media_ref.contains("fmt=png") &&
      s1.spans.head.media_ref.contains("q=90"))
    // same content → same ref (deterministic identity)
    assert(SpanOps.screenshot(d, "png", 90).toOption.get === s1)
    assert(SpanOps.screenshot(d, "bmp").isLeft)
    assert(SpanOps.screenshot(d, "png", 101).isLeft)
  }

  // ---- T4 split (split-intervals fixture) ----

  test("split intervals span=1 on 3 pages → parts {base}_0..2 (routes.go:299-315)") {
    val parts = SpanOps.split(pages(3), SplitOptions("intervals", "1"))
    assert(parts.map(_.doc_id) === Seq("d_0", "d_1", "d_2"))
    assert(parts.flatMap(_.spans.map(_.text)) === Seq("Page 1", "Page 2", "Page 3"))
    assert(parts.forall(_.spans.head.offset === 0))
  }

  test("split pages mode with unify keeps one part; without → one per page") {
    val u = SpanOps.split(pages(5), SplitOptions("pages", "2-4", unify = true))
    assert(u.map(_.doc_id) === Seq("d_0"))
    assert(u.head.spans.map(_.text) === Seq("Page 2", "Page 3", "Page 4"))
    val n = SpanOps.split(pages(5), SplitOptions("pages", "2-4"))
    assert(n.map(_.doc_id) === Seq("d_0", "d_1", "d_2"))
  }

  test("split: zero-valued options are a no-op (routes.go:280-283)") {
    val d = pages(3)
    assert(SpanOps.split(d, SplitOptions()) === Seq(d))
  }

  test("page range parser: qpdf forms incl. z and open ranges") {
    assert(SpanOps.parsePageRange("", 4) === Seq(0, 1, 2, 3))
    assert(SpanOps.parsePageRange("1-2,4", 5) === Seq(0, 1, 3))
    assert(SpanOps.parsePageRange("3-", 5) === Seq(2, 3, 4))
    assert(SpanOps.parsePageRange("2-z", 4) === Seq(1, 2, 3))
    assert(SpanOps.parsePageRange("9", 4) === Seq())
  }

  // ---- T5 merge + O1 + T12 (merge-order fixture) ----

  test("merge orders parts alphanumerically and shifts bookmarks by running page count") {
    val a = Doc("1_a.pdf", Seq(
      DocSpan("page", "A1", "", 0), DocSpan("page", "A2", "", 1),
      SpanOps.bookmarkSpan("IntroA", 1).copy(offset = 2)))
    val b = Doc("10_b.pdf", Seq(
      DocSpan("page", "B1", "", 0),
      SpanOps.bookmarkSpan("IntroB", 1).copy(offset = 1)))
    val c = Doc("2_c.pdf", Seq(
      DocSpan("page", "C1", "", 0),
      SpanOps.bookmarkSpan("IntroC", 1).copy(offset = 1)))
    // alphanumeric order: 1_a, 2_c, 10_b (NOT lexicographic)
    val merged = SpanOps.merge(Seq(b, a, c), "out.pdf")
    val pagesTexts = merged.spans.filter(_.kind == "page").map(_.text)
    assert(pagesTexts === Seq("A1", "A2", "C1", "B1"))
    val bms = merged.spans.filter(_.kind == "bookmark").map(_.text)
    // A at offset 0, C at offset 2 (after A's 2 pages), B at offset 3
    assert(bms === Seq("IntroA@1", "IntroC@3", "IntroB@4"))
    assert(merged.spans.map(_.offset) === merged.spans.indices.toSeq)
  }

  test("merge of a single doc short-circuits (routes.go:263-265)") {
    val one = pages(2, "only.pdf")
    assert(SpanOps.merge(Seq(one), "m") === one.copy(doc_id = "m"))
  }

  // ---- T6/T7/T13/T16 attribute ops + guards ----

  test("flatten is idempotent") {
    val f1 = SpanOps.flatten(pages(2))
    assert(SpanOps.flatten(f1) === f1)
    assert(f1.spans.forall(s => SpanOps.attrsOf(s)("flat") === "1"))
  }

  test("convert validates formats; zero-valued → no-op") {
    assert(SpanOps.convert(pages(1), "", "") === Right(pages(1)))
    assert(SpanOps.convert(pages(1), "PDF/A-2b", "").toOption.get
      .spans.forall(s => SpanOps.attrsOf(s)("fmt") === "PDF/A-2b"))
    assert(SpanOps.convert(pages(1), "PDF/A-9x", "").isLeft)
  }

  test("encrypt: owner defaults to user; PDF/A blocks encryption (F14)") {
    val enc = SpanOps.encrypt(pages(1), EncryptOptions(userPassword = "u")).toOption.get
    assert(SpanOps.attrsOf(enc.spans.head)("enc").startsWith("aes256:"))
    val pdfa = SpanOps.convert(pages(1), "PDF/A-2b", "").toOption.get
    assert(SpanOps.encrypt(pdfa, EncryptOptions(userPassword = "u")).isLeft)
    // owner-only == user-derived fingerprint of (owner, owner)
    val ownerOnly = SpanOps.encrypt(pages(1), EncryptOptions(ownerPassword = "p")).toOption.get
    val both = SpanOps.encrypt(pages(1), EncryptOptions(userPassword = "p", ownerPassword = "p")).toOption.get
    assert(SpanOps.attrsOf(ownerOnly.spans.head)("enc") === SpanOps.attrsOf(both.spans.head)("enc"))
  }

  test("rotate composes mod 360 and honors page ranges; 0 → no-op") {
    val d = pages(3)
    assert(SpanOps.rotate(d, 0) === d)
    val r = SpanOps.rotate(SpanOps.rotate(d, 90, "1-2"), 90, "2-3")
    val rots = r.spans.map(s => SpanOps.attrsOf(s).getOrElse("rot", "0"))
    assert(rots === Seq("90", "180", "90"))
    assert(SpanOps.rotate(SpanOps.rotate(d, 180), 180).spans
      .forall(s => !SpanOps.attrsOf(s).contains("rot") || SpanOps.attrsOf(s)("rot") === "0"))
  }

  test("watermark behind vs stamp above; pages range respected") {
    val d = pages(3)
    val wm = SpanOps.stampOrWatermark(d, StampOptions("draft", "text", "1-2"), above = false)
    assert(SpanOps.attrsOf(wm.spans(0)).get("wm") === Some("text:draft"))
    assert(SpanOps.attrsOf(wm.spans(2)).get("wm") === None)
    val st = SpanOps.stampOrWatermark(d, StampOptions("ok", "image", ""), above = true)
    assert(st.spans.forall(s => SpanOps.attrsOf(s)("stamp") === "image:ok"))
    assert(SpanOps.stampOrWatermark(d, StampOptions(), above = true) === d)
  }

  // ---- T8/T9/T10 metadata + page count ----

  test("metadata write/read round-trip strips system tags, rejects control chars") {
    val d = pages(2)
    val w = SpanOps.writeMetadata(d, Map("Author" -> "Ada", "Title" -> "T")).toOption.get
    assert(SpanOps.readMetadata(w) === Map("Author" -> "Ada", "Title" -> "T"))
    // dangerous pseudo-tags dropped silently (exiftool.go argv builder)
    val w2 = SpanOps.writeMetadata(w, Map("FileName" -> "evil", "K" -> "v")).toOption.get
    assert(!SpanOps.readMetadata(w2).contains("FileName"))
    assert(SpanOps.writeMetadata(d, Map("AB" -> "x")).isLeft)
    assert(SpanOps.pageCount(w) === 2)
  }

  // ---- T14/T17 embed + factur-x ----

  test("embeds are sanitized, sorted, appended; factur-x forces PDF/A-3b + Alternative") {
    val d = SpanOps.embedFiles(pages(1), Seq("b.xml", "/tmp/a.txt"))
    assert(d.spans.filter(_.kind == "embed").map(_.media_ref) === Seq("a.txt", "b.xml"))
    val fx = SpanOps.applyFacturX(pages(1), "<xml/>", "EN 16931").toOption.get
    assert(fx.spans.exists(s => s.kind == "embed" && s.media_ref === SpanOps.FacturXFilename))
    assert(fx.spans.filter(_.kind == "page")
      .forall(s => SpanOps.attrsOf(s)("fmt") === "PDF/A-3b"))
    // PDF/A-1b doc cannot take factur-x
    val a1 = SpanOps.convert(pages(1), "PDF/A-1b", "").toOption.get
    assert(SpanOps.applyFacturX(a1, "<xml/>", "EN 16931").isLeft)
  }

  // ---- full chain (convertUrl stub order) ----

  test("pipeline runs the exact stub order with validations") {
    val input = doc("d", "html" -> "<p>One</p>", "html" -> "<p>Two</p>", "html" -> "<p>Three</p>")
    val opts = ConvertPipeline.Options(
      split = SplitOptions("intervals", "2"),
      rotateAngle = 90,
      pdfa = "PDF/A-2b",
      metadata = Map("Author" -> "A"))
    val out = ConvertPipeline(input, opts)
    assert(!out.isError)
    assert(out.docs.map(_.doc_id) === Seq("d_0", "d_1"))
    val p0 = out.docs.head.spans.filter(_.kind == "page")
    assert(p0.length === 2)
    assert(SpanOps.attrsOf(p0.head) === Map("fmt" -> "PDF/A-2b", "rot" -> "90"))
    assert(out.docs.forall(_.spans.exists(_.kind == "meta")))
  }

  test("pipeline validation: PDF/A + encrypt → error row; perms need password (F14)") {
    val input = doc("d", "html" -> "<p>x</p>")
    val bad = ConvertPipeline(input, ConvertPipeline.Options(
      pdfa = "PDF/A-2b", encrypt = EncryptOptions(userPassword = "u")))
    assert(bad.isError)
    val bad2 = ConvertPipeline(input, ConvertPipeline.Options(
      encrypt = EncryptOptions(allowPrinting = false)))
    assert(bad2.isError)
    val ok = ConvertPipeline(input, ConvertPipeline.Options(
      encrypt = EncryptOptions(userPassword = "u", allowPrinting = false)))
    assert(!ok.isError)
  }

  test("F13 rewrites: outline implies tagged; facturx pairing forces PDF/A-3b") {
    val o = ConvertPipeline.validateAndRewrite(ConvertPipeline.Options(
      page = PageOptions(generateDocumentOutline = true))).toOption.get
    assert(o.page.generateTaggedPdf)
    val fx = ConvertPipeline.validateAndRewrite(ConvertPipeline.Options(
      facturXXml = "<x/>")).toOption.get
    assert(fx.pdfa === "PDF/A-3b")
  }

  // ---- T18 engine fallback ----

  test("engine fallback: first capable engine wins; faults skip to next; all fail joins errors") {
    import Engines._
    val r1 = Engines.run[String](Merge, e => Right(e))
    assert(r1.engineUsed === Some("qpdf"))
    val r2 = Engines.run[String](Merge, e => Right(e), faults = _ == "qpdf")
    assert(r2.engineUsed === Some("pdfcpu"))
    val r3 = Engines.run[String](Merge, _ => Left("boom"), faults = _ => false)
    assert(r3.value.isLeft)
    assert(r3.value.left.toOption.get.split("; ").length === 3) // all three joined
    // capability matrix: exiftool cannot encrypt (ErrPdfEncryptionNotSupported)
    val r4 = Engines.run[String](Encrypt, e => Right(e), faults = Set("qpdf", "pdfcpu", "pdftk"))
    assert(r4.value.isLeft)
    // flatten only qpdf
    assert(Engines.run[String](Flatten, e => Right(e)).engineUsed === Some("qpdf"))
  }
}
