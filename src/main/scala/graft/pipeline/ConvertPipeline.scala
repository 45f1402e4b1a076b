package graft.pipeline

import graft.model._
import graft.operators.SpanOps

/** The post-processing chain in the exact stub order of the reference's
  * convert routes (`pkg/modules/chromium/routes.go:861-928`, identical
  * chain in `libreoffice/routes.go` and `pdfengines/routes.go`):
  *
  *   render → split → watermark → stamp → rotate → convert(PDF/A/UA) →
  *   write-metadata → embed-files(+metadata) → factur-x → encrypt
  *
  * plus the F13/F14 cross-constraint validations up front
  * (`chromium/tasks.go:31-74`, `pdfengines/routes.go:223-254,534-561`).
  * Each step is a narrow per-row transform; split is the only fan-out.
  * Errors route rows to the error side-channel instead of failing the
  * job (the reference's 400-per-request becomes an error row).
  */
object ConvertPipeline {

  final case class Options(
      page: PageOptions = PageOptions(),
      split: SplitOptions = SplitOptions(),
      watermark: StampOptions = StampOptions(),
      stamp: StampOptions = StampOptions(),
      rotateAngle: Int = 0,
      rotatePages: String = "",
      pdfa: String = "",
      pdfua: String = "",
      metadata: Map[String, String] = Map.empty,
      embeds: Seq[String] = Nil,
      embedsMetadata: Map[String, Map[String, String]] = Map.empty,
      facturXXml: String = "",
      facturXConformance: String = "EN 16931",
      encrypt: EncryptOptions = EncryptOptions(),
      headerText: String = "",
      footerText: String = ""
  )

  /** F13 constant-folding rewrites (`chromium/tasks.go:31-37,443-472`):
    * generateDocumentOutline ⇒ generateTaggedPdf; singlePage ⇒
    * pageRanges="1". F14 validations (`pdfengines/routes.go:223-254,
    * 534-561,688-697`): PDF/A ∧ encrypt → error; Factur-X needs
    * PDF/A-3b; encrypt permissions need a password.
    */
  def validateAndRewrite(o: Options): Either[String, Options] = {
    val page = if (o.page.generateDocumentOutline && !o.page.generateTaggedPdf)
      o.page.copy(generateTaggedPdf = true) else o.page
    if (page.omitBackground && !page.printBackground)
      return Left("omitBackground requires printBackground")
    if (o.pdfa.nonEmpty &&
        (o.encrypt.userPassword.nonEmpty || o.encrypt.ownerPassword.nonEmpty))
      return Left("PDF/A and encryption cannot be combined")
    if (o.facturXXml.nonEmpty && o.pdfa.nonEmpty && o.pdfa != "PDF/A-3b")
      return Left(s"Factur-X requires PDF/A-3b, got '${o.pdfa}'")
    val e = o.encrypt
    val permsTouched = !(e.allowPrinting && e.allowModifying && e.allowCopying &&
      e.allowAnnotating && e.allowFillingForms && e.allowAccessibility)
    if (permsTouched && e.userPassword.isEmpty && e.ownerPassword.isEmpty)
      return Left("encryption permissions require a user or owner password")
    // Factur-X pairing forces PDF/A-3b when no explicit format requested
    // (FacturXPdfFormats decision, routes.go:568-593)
    val pdfa = if (o.facturXXml.nonEmpty && o.pdfa.isEmpty) "PDF/A-3b" else o.pdfa
    Right(o.copy(page = page, pdfa = pdfa))
  }

  final case class Converted(docs: Seq[Doc], error: String) {
    def isError: Boolean = error.nonEmpty
  }

  /** Run the full chain on one rendered-or-raw document. */
  def apply(input: Doc, opts0: Options): Converted =
    validateAndRewrite(opts0) match {
      case Left(err) => Converted(Nil, err)
      case Right(opts) =>
        val rendered =
          if (input.spans.exists(s => Set("html", "markdown", "text").contains(s.kind)))
            SpanOps.render(input, opts.page.singlePage, opts.headerText, opts.footerText)
          else input
        val parts = SpanOps.split(rendered, opts.split)
        val results = parts.map { part =>
          val wm = SpanOps.stampOrWatermark(part, opts.watermark, above = false)
          val st = SpanOps.stampOrWatermark(wm, opts.stamp, above = true)
          val rot = SpanOps.rotate(st, opts.rotateAngle, opts.rotatePages)
          for {
            conv <- SpanOps.convert(rot, opts.pdfa, opts.pdfua)
            md <- SpanOps.writeMetadata(conv, opts.metadata)
            emb = SpanOps.embedFiles(md, opts.embeds, opts.embedsMetadata)
            fx <- SpanOps.applyFacturX(emb, opts.facturXXml, opts.facturXConformance)
            enc <- SpanOps.encrypt(fx, opts.encrypt)
          } yield enc
        }
        results.collectFirst { case Left(err) => err } match {
          case Some(err) => Converted(Nil, err)
          case None => Converted(results.map(_.toOption.get), "")
        }
    }
}
