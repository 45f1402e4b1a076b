package graft

import graft.operators.ErrorPrecedence
import graft.operators.ErrorPrecedence._
import org.scalatest.funsuite.AnyFunSuite

/** The six-level precedence of browser.go:499-563 and the F7 classifier
  * (events.go:376-433) — SURVEY §7.4 "error-precedence semantics must
  * be encoded verbatim or failure rows diverge".
  */
class ErrorPrecedenceSpec extends AnyFunSuite {

  private val full = RunOutcome(
    invalidHttpStatusCode = Some("500: Internal Server Error"),
    invalidResourceHttpStatusCode = Some("https://x/y.js - 404: Not Found"),
    loadingFailed = Some("net::ERR_CONNECTION_RESET"),
    runError = Some("context canceled"),
    consoleExceptions = Some("TypeError: x is undefined"),
    resourceLoadingFailed = Some("resource Stylesheet: net::ERR_FILE_NOT_FOUND"))

  test("each level outranks everything below it, in browser.go order") {
    assert(resolve(full).get.endsWith(ErrInvalidHttpStatusCode))
    assert(resolve(full.copy(invalidHttpStatusCode = None)).get
      .endsWith(ErrInvalidResourceHttpStatusCode))
    assert(resolve(full.copy(invalidHttpStatusCode = None,
      invalidResourceHttpStatusCode = None)).get.endsWith(ErrLoadingFailed))
    val r4 = full.copy(invalidHttpStatusCode = None,
      invalidResourceHttpStatusCode = None, loadingFailed = None)
    assert(resolve(r4).get.startsWith("handle tasks:"))
    val r5 = r4.copy(runError = None)
    assert(resolve(r5).get.endsWith(ErrConsoleExceptions))
    val r6 = r5.copy(consoleExceptions = None)
    // resource loading failures only fail when opted in (events.go/1021)
    assert(resolve(r6) === None)
    assert(resolve(r6, failOnResourceLoadingFailed = true).get
      .endsWith(ErrResourceLoadingFailed))
    assert(resolve(RunOutcome()) === None)
  }

  test("the five known run-error messages map to sentinel errors") {
    assert(classifyRunError("x Printing failed (-32000) y") === ErrPrintingFailed)
    assert(classifyRunError("Show invalid printer settings error (-32000)") === ErrInvalidPrinterSettings)
    assert(classifyRunError("blah content area is empty (-32602)") === ErrInvalidPrinterSettings)
    assert(classifyRunError("Page range syntax error") === ErrPageRangesSyntaxError)
    assert(classifyRunError("Page range exceeds page count (-32000)") === ErrPageRangesExceedsPageCount)
    assert(classifyRunError("rpcc: message too large") === ErrRpccMessageTooLarge)
    assert(classifyRunError("weird") === "handle tasks: weird")
  }

  test("F7: only the 12 known net errors register; Document → main page") {
    assert(KnownNetErrors.size === 12)
    assert(classifyLoadingFailed("net::ERR_SOMETHING_ELSE", "Document") === Ignored)
    assert(classifyLoadingFailed("net::ERR_CONNECTION_RESET", "Document") ===
      MainPageFailure("net::ERR_CONNECTION_RESET"))
    assert(classifyLoadingFailed("net::ERR_FILE_NOT_FOUND", "Image") ===
      ResourceFailure("resource Image: net::ERR_FILE_NOT_FOUND"))
    // errors.Join accumulation
    val j = joinErrors(joinErrors(None, "a"), "b")
    assert(j === Some("a\nb"))
  }
}
