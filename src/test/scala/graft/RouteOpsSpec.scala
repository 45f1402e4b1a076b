package graft

import graft.model.{Doc, DocSpan, RobotsRule}
import graft.operators.RouteOps
import org.scalatest.funsuite.AnyFunSuite

class RouteOpsSpec extends AnyFunSuite {

  test("S2: downloadFrom retries 5xx up to cap, fails fast on 4xx") {
    // succeeds on 3rd attempt
    val r = RouteOps.fetchWithRetry(4)(attempt => if (attempt < 3) 503 else 200)
    assert(r === RouteOps.FetchAttempts(200, 3, ""))
    // 404 is terminal on attempt 1
    val r2 = RouteOps.fetchWithRetry(4)(_ => 404)
    assert(r2.attempts === 1 && r2.error.nonEmpty)
    // cap reached
    val r3 = RouteOps.fetchWithRetry(4)(_ => 503)
    assert(r3.attempts === 4 && r3.error.nonEmpty)
  }

  test("T3 retry: core-dump retried up to 10, other errors terminal") {
    var calls = 0
    val ok = RouteOps.convertWithCoreDumpRetry(10) { attempt =>
      calls += 1
      if (attempt < 5) Left("core dumped") else Right("pdf")
    }
    assert(ok === Right("pdf") && calls === 5)
    var calls2 = 0
    val bad = RouteOps.convertWithCoreDumpRetry(10) { _ => calls2 += 1; Left("password protected") }
    assert(bad.isLeft && calls2 === 1)
  }

  test("S4: extension scan is case-insensitive, excluded buckets skipped, O1-ordered") {
    val names = Seq("10_b.DOCX", "2_a.docx", "wm.png", "1_c.docx", "x.pdf")
    val out = RouteOps.selectByExtensions(names, Seq(".docx"), exclude = Set("2_a.docx"))
    assert(out === Seq("1_c.docx", "10_b.DOCX"))
    assert(RouteOps.extOf("A.PDF") === ".pdf")
    assert(RouteOps.extOf("noext") === "")
  }

  test("S5: single binding matches case-insensitive extension") {
    assert(RouteOps.bindSingle(Seq("a.PDF", "b.pdf"), "a.pdf") === Some("a.PDF"))
    assert(RouteOps.bindSingle(Seq("b.pdf"), "a.pdf") === None)
  }

  test("A5: body limit guard; 0 = unlimited") {
    val doc = Doc("d", Seq(DocSpan("text", "x" * 100, "", 0)))
    assert(RouteOps.checkBodyLimit(doc, 1000).isRight)
    assert(RouteOps.checkBodyLimit(doc, 50).isLeft)
    assert(RouteOps.checkBodyLimit(doc, 0).isRight)
  }

  test("F5: sub-resources re-checked; file:// default-denied without prefixes") {
    val rules = Seq(RobotsRule(""".*denied\.test.*""", "deny", deny_private_ips = true, deny_public_ips = false))
    val hostIps = Map("ok.test" -> Seq("93.1.2.3"), "private.test" -> Seq("10.0.0.1"))
    val v = RouteOps.filterSubResources(
      Seq("https://ok.test/a.css", "https://denied.test/x.js",
        "https://private.test/y.js", "file:///tmp/z.png"),
      rules, hostIps)
    assert(v.allowed === Seq("https://ok.test/a.css"))
    assert(v.errors.length === 3)
    // explicit prefix allows the file:// resource (events.go:277-287)
    val v2 = RouteOps.filterSubResources(Seq("file:///work/req1/z.png"), rules, hostIps,
      allowedFilePrefixes = Seq("/work/req1"))
    assert(v2.allowed.length === 1)
  }

  test("F11: scoped headers apply only when scope regex matches") {
    val hs = Seq(
      RouteOps.ScopedHeader("X-All", "1", None),
      RouteOps.ScopedHeader("X-Api", "2", Some("""https://api\..*""")),
      RouteOps.ScopedHeader("X-Other", "3", Some("""https://other\..*""")))
    assert(RouteOps.headersFor("https://api.test/x", hs) ===
      Map("X-All" -> "1", "X-Api" -> "2"))
    assert(RouteOps.headersFor("https://plain.test/x", hs) === Map("X-All" -> "1"))
  }

  test("S7: output naming and zip ordering") {
    assert(RouteOps.pdfOutputName("report.docx") === "report.pdf")
    assert(RouteOps.pdfOutputName("noext") === "noext.pdf")
    assert(RouteOps.splitPartName("report.docx", 2) === "report_2.pdf")
    assert(RouteOps.zipOrder(Seq("10_b.pdf", "/x/2_a.pdf")) === Seq("2_a.pdf", "10_b.pdf"))
  }

  test("T3: office extension gate matches the reference's 130-format set") {
    assert(RouteOps.OfficeExtensions.size === 130)
    assert(RouteOps.isOfficeDocument("report.DOCX"))
    assert(RouteOps.isOfficeDocument("sheet.csv"))
    assert(RouteOps.isOfficeDocument("slides.key"))
    assert(!RouteOps.isOfficeDocument("archive.zip"))
    assert(!RouteOps.isOfficeDocument("noext"))
  }

  test("F10: cookie normalization validates required fields") {
    val c = RouteOps.Cookie("n", "v", "d.test", sameSite = "LAX")
    assert(RouteOps.normalizeCookie(c).map(_.sameSite) === Right("Lax"))
    assert(RouteOps.normalizeCookie(RouteOps.Cookie("", "v", "d")).isLeft)
  }
}
