package graft.operators

import graft.model._

/** T18 engine fallback (`pkg/modules/pdfengines/multi.go:85-157`): each
  * method tries the configured engines in order; the first success wins;
  * when every engine fails the errors are joined. The capability matrix
  * below mirrors SURVEY.md §2.3 (sources: `qpdf/qpdf.go:245-322`,
  * `pdfcpu/pdfcpu.go:233-302,481-492`, `pdftk/pdftk.go:116-529`,
  * `exiftool/exiftool.go:244-565`, `libreoffice/pdfengine/pdfengine.go:
  * 49-105`); default orders per method from
  * `pdfengines/pdfengines.go:56-70`.
  *
  * All engines compute the same span transform (the algebra in
  * [[SpanOps]]); what the fallback reproduces is the CONTROL FLOW —
  * which engine is charged, when fallback happens, how errors join —
  * observable through lineage and fault-injection tests.
  */
object Engines {

  sealed trait Method
  case object Split extends Method
  case object SplitUnify extends Method
  case object Merge extends Method
  case object Flatten extends Method
  case object Convert extends Method
  case object ReadMetadata extends Method
  case object WriteMetadata extends Method
  case object PageCount extends Method
  case object ReadBookmarks extends Method
  case object WriteBookmarks extends Method
  case object Encrypt extends Method
  case object EmbedFiles extends Method
  case object Watermark extends Method
  case object Stamp extends Method
  case object Rotate extends Method
  case object FacturXXmp extends Method

  /** Engine → supported methods. */
  val capabilities: Map[String, Set[Method]] = Map(
    "qpdf" -> Set(SplitUnify, Merge, Flatten, Encrypt, EmbedFiles, FacturXXmp),
    "pdfcpu" -> Set(Split, SplitUnify, Merge, ReadBookmarks, WriteBookmarks,
      EmbedFiles, Encrypt, Watermark, Stamp, Rotate),
    "pdftk" -> Set(SplitUnify, Merge, Encrypt, Watermark, Stamp, Rotate),
    "exiftool" -> Set(ReadMetadata, WriteMetadata, PageCount),
    "libreoffice-pdfengine" -> Set(Convert)
  )

  /** Default try order per method (`pdfengines/pdfengines.go:56-70`). */
  val defaultOrder: Map[Method, Seq[String]] = Map(
    Split -> Seq("pdfcpu", "qpdf", "pdftk"),
    SplitUnify -> Seq("qpdf", "pdfcpu", "pdftk"),
    Merge -> Seq("qpdf", "pdfcpu", "pdftk"),
    Flatten -> Seq("qpdf"),
    Convert -> Seq("libreoffice-pdfengine"),
    ReadMetadata -> Seq("exiftool"),
    WriteMetadata -> Seq("exiftool"),
    PageCount -> Seq("exiftool"),
    ReadBookmarks -> Seq("pdfcpu"),
    WriteBookmarks -> Seq("pdfcpu"),
    Encrypt -> Seq("qpdf", "pdfcpu", "pdftk"),
    EmbedFiles -> Seq("qpdf", "pdfcpu"),
    Watermark -> Seq("pdfcpu", "pdftk"),
    Stamp -> Seq("pdfcpu", "pdftk"),
    Rotate -> Seq("pdfcpu", "pdftk"),
    FacturXXmp -> Seq("qpdf")
  )

  /** Fault injector for tests: engine name → fails? */
  type FaultModel = String => Boolean
  val NoFaults: FaultModel = _ => false

  final case class EngineResult[A](value: Either[String, A], engineUsed: Option[String])

  /** Try-chain: first capable, non-faulted engine wins; all-failed →
    * joined error (multi.go:132-139).
    */
  def run[A](method: Method, op: String => Either[String, A],
             faults: FaultModel = NoFaults,
             order: Option[Seq[String]] = None): EngineResult[A] = {
    val engines = order.getOrElse(defaultOrder(method))
      .filter(e => capabilities.getOrElse(e, Set.empty).contains(method))
    if (engines.isEmpty)
      return EngineResult(Left(s"no engine supports $method"), None)
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    engines.foreach { e =>
      if (faults(e)) errors += s"$e: injected failure"
      else op(e) match {
        case Right(v) => return EngineResult(Right(v), Some(e))
        case Left(err) => errors += s"$e: $err"
      }
    }
    EngineResult(Left(errors.mkString("; ")), None)
  }
}
