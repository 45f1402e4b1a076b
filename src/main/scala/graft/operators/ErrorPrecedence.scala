package graft.operators

/** Fetch/render error semantics — verbatim port of the reference's
  * two hard-to-get-right pieces (SURVEY.md §7.4 named risk):
  *
  *  1. the six-level precedence of `browser.go:499-563` — event-driven
  *     errors outrank the run error because they carry the root cause
  *     (a canceled context error is less informative):
  *     invalidHttpStatusCode > invalidResourceHttpStatusCode >
  *     loadingFailed > runErr (with 5 known-message mappings) >
  *     consoleExceptions > resourceLoadingFailed (opt-in);
  *  2. the F7 known-net-error classifier (`events.go:376-433`): only
  *     the 12 listed `net::ERR_*` texts register at all; resource type
  *     Document → main-page failure (cancels in-flight waits), any
  *     other type → joined resource failure.
  */
object ErrorPrecedence {

  /** Sentinel error categories (the reference's wrapped Err* values). */
  val ErrInvalidHttpStatusCode = "invalid HTTP status code"
  val ErrInvalidResourceHttpStatusCode = "invalid resource HTTP status code"
  val ErrLoadingFailed = "loading failed"
  val ErrPrintingFailed = "printing failed"
  val ErrInvalidPrinterSettings = "invalid printer settings"
  val ErrPageRangesSyntaxError = "page ranges syntax error"
  val ErrPageRangesExceedsPageCount = "page ranges exceed page count"
  val ErrRpccMessageTooLarge = "rpcc message too large"
  val ErrConsoleExceptions = "console exceptions"
  val ErrResourceLoadingFailed = "resource loading failed"

  final case class RunOutcome(
      invalidHttpStatusCode: Option[String] = None,
      invalidResourceHttpStatusCode: Option[String] = None,
      loadingFailed: Option[String] = None,
      runError: Option[String] = None,
      consoleExceptions: Option[String] = None,
      resourceLoadingFailed: Option[String] = None)

  /** `browser.go:499-563` resolution order. Returns None on success. */
  def resolve(o: RunOutcome, failOnResourceLoadingFailed: Boolean = false): Option[String] = {
    o.invalidHttpStatusCode.map(m => s"$m: $ErrInvalidHttpStatusCode")
      .orElse(o.invalidResourceHttpStatusCode.map(m => s"$m: $ErrInvalidResourceHttpStatusCode"))
      .orElse(o.loadingFailed.map(m => s"$m: $ErrLoadingFailed"))
      .orElse(o.runError.map(classifyRunError))
      .orElse(o.consoleExceptions.map(m => s"$m: $ErrConsoleExceptions"))
      .orElse(if (failOnResourceLoadingFailed)
        o.resourceLoadingFailed.map(m => s"$m: $ErrResourceLoadingFailed")
      else None)
  }

  /** The 5 known run-error message mappings (`browser.go:524-548`). */
  def classifyRunError(message: String): String =
    if (message.contains("Printing failed (-32000)")) ErrPrintingFailed
    else if (message.contains("Show invalid printer settings error (-32000)") ||
      message.contains("content area is empty (-32602)")) ErrInvalidPrinterSettings
    else if (message.contains("Page range syntax error")) ErrPageRangesSyntaxError
    else if (message.contains("Page range exceeds page count (-32000)")) ErrPageRangesExceedsPageCount
    else if (message.contains("rpcc: message too large")) ErrRpccMessageTooLarge
    else s"handle tasks: $message"

  /** F7: the only error texts that register (`events.go:383-396`). */
  val KnownNetErrors: Set[String] = Set(
    "net::ERR_CONNECTION_CLOSED", "net::ERR_CONNECTION_RESET",
    "net::ERR_CONNECTION_REFUSED", "net::ERR_CONNECTION_ABORTED",
    "net::ERR_CONNECTION_FAILED", "net::ERR_NAME_NOT_RESOLVED",
    "net::ERR_INTERNET_DISCONNECTED", "net::ERR_ADDRESS_UNREACHABLE",
    "net::ERR_BLOCKED_BY_CLIENT", "net::ERR_BLOCKED_BY_RESPONSE",
    "net::ERR_FILE_NOT_FOUND", "net::ERR_HTTP2_PROTOCOL_ERROR")

  sealed trait LoadingFailure
  case object Ignored extends LoadingFailure
  final case class MainPageFailure(errorText: String) extends LoadingFailure
  final case class ResourceFailure(joined: String) extends LoadingFailure

  /** Classify one EventLoadingFailed occurrence (`events.go:398-431`). */
  def classifyLoadingFailed(errorText: String, resourceType: String): LoadingFailure =
    if (!KnownNetErrors.contains(errorText)) Ignored
    else if (resourceType == "Document") MainPageFailure(errorText)
    else ResourceFailure(s"resource $resourceType: $errorText")

  /** errors.Join analog for accumulated resource failures. */
  def joinErrors(existing: Option[String], next: String): Option[String] =
    Some(existing.fold(next)(e => e + "\n" + next))
}
