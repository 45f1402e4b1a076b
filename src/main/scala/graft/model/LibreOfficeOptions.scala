package graft.model

/** The full LibreOffice export-option surface (T3) — field-for-field
  * twin of the reference's `Options` struct with its exact defaults
  * (`pkg/modules/libreoffice/api/api.go:70-305`, defaults `:253-305`).
  * A user of the reference keeps every knob when switching; values ride
  * the task row as a typed struct column.
  */
final case class LibreOfficeOptions(
    password: String = "",
    landscape: Boolean = false,
    pageRanges: String = "",
    updateIndexes: Boolean = true,
    exportFormFields: Boolean = true,
    allowDuplicateFieldNames: Boolean = false,
    exportBookmarks: Boolean = true,
    exportBookmarksToPdfDestination: Boolean = false,
    exportPlaceholders: Boolean = false,
    exportNotes: Boolean = false,
    exportNotesPages: Boolean = false,
    exportOnlyNotesPages: Boolean = false,
    exportNotesInMargin: Boolean = false,
    convertOooTargetToPdfTarget: Boolean = false,
    exportLinksRelativeFsys: Boolean = false,
    exportHiddenSlides: Boolean = false,
    skipEmptyPages: Boolean = false,
    addOriginalDocumentAsStream: Boolean = false,
    singlePageSheets: Boolean = false,
    initialView: Int = 0,
    initialPage: Int = 1,
    magnification: Int = 0,
    zoom: Int = 100,
    pageLayout: Int = 0,
    firstPageOnLeft: Boolean = false,
    resizeWindowToInitialPage: Boolean = false,
    centerWindow: Boolean = false,
    openInFullScreenMode: Boolean = false,
    displayPdfDocumentTitle: Boolean = true,
    hideViewerMenubar: Boolean = false,
    hideViewerToolbar: Boolean = false,
    hideViewerWindowControls: Boolean = false,
    useTransitionEffects: Boolean = true,
    openBookmarkLevels: Int = -1,
    losslessImageCompression: Boolean = false,
    quality: Int = 90,
    reduceImageResolution: Boolean = false,
    maxImageResolution: Int = 300,
    nativeWatermarkText: String = "",
    nativeWatermarkColor: Int = 8388223,
    nativeWatermarkFontHeight: Int = 0,
    nativeWatermarkRotateAngle: Int = 0,
    nativeWatermarkFontName: String = "Helvetica",
    nativeTiledWatermarkText: String = "",
    pdfA: String = "",
    pdfUa: Boolean = false)

object LibreOfficeOptions {

  /** Form binding with the reference's validation envelope: quality
    * clamps to [1,100] semantics (route rejects out-of-range),
    * maxImageResolution must be one of the UNO-accepted DPI steps.
    */
  def bind(form: FormData): LibreOfficeOptions = {
    val o = LibreOfficeOptions(
      password = form.string("password"),
      landscape = form.bool("landscape", default = false),
      pageRanges = form.string("nativePageRanges"),
      updateIndexes = form.bool("updateIndexes", default = true),
      exportFormFields = form.bool("exportFormFields", default = true),
      allowDuplicateFieldNames = form.bool("allowDuplicateFieldNames", default = false),
      exportBookmarks = form.bool("exportBookmarks", default = true),
      exportBookmarksToPdfDestination = form.bool("exportBookmarksToPdfDestination", default = false),
      exportPlaceholders = form.bool("exportPlaceholders", default = false),
      exportNotes = form.bool("exportNotes", default = false),
      exportNotesPages = form.bool("exportNotesPages", default = false),
      exportOnlyNotesPages = form.bool("exportOnlyNotesPages", default = false),
      exportNotesInMargin = form.bool("exportNotesInMargin", default = false),
      convertOooTargetToPdfTarget = form.bool("convertOooTargetToPdfTarget", default = false),
      exportLinksRelativeFsys = form.bool("exportLinksRelativeFsys", default = false),
      exportHiddenSlides = form.bool("exportHiddenSlides", default = false),
      skipEmptyPages = form.bool("skipEmptyPages", default = false),
      addOriginalDocumentAsStream = form.bool("addOriginalDocumentAsStream", default = false),
      singlePageSheets = form.bool("singlePageSheets", default = false),
      initialView = form.int("initialView", 0),
      initialPage = form.int("initialPage", 1),
      magnification = form.int("magnification", 0),
      zoom = form.int("zoom", 100),
      pageLayout = form.int("pageLayout", 0),
      firstPageOnLeft = form.bool("firstPageOnLeft", default = false),
      resizeWindowToInitialPage = form.bool("resizeWindowToInitialPage", default = false),
      centerWindow = form.bool("centerWindow", default = false),
      openInFullScreenMode = form.bool("openInFullScreenMode", default = false),
      displayPdfDocumentTitle = form.bool("displayPdfDocumentTitle", default = true),
      hideViewerMenubar = form.bool("hideViewerMenubar", default = false),
      hideViewerToolbar = form.bool("hideViewerToolbar", default = false),
      hideViewerWindowControls = form.bool("hideViewerWindowControls", default = false),
      useTransitionEffects = form.bool("useTransitionEffects", default = true),
      openBookmarkLevels = form.int("openBookmarkLevels", -1),
      losslessImageCompression = form.bool("losslessImageCompression", default = false),
      quality = form.int("quality", 90),
      reduceImageResolution = form.bool("reduceImageResolution", default = false),
      maxImageResolution = form.int("maxImageResolution", 300),
      nativeWatermarkText = form.string("nativeWatermarkText"),
      nativeWatermarkColor = form.int("nativeWatermarkColor", 8388223),
      nativeWatermarkFontHeight = form.int("nativeWatermarkFontHeight", 0),
      nativeWatermarkRotateAngle = form.int("nativeWatermarkRotateAngle", 0),
      nativeWatermarkFontName = form.string("nativeWatermarkFontName", "Helvetica"),
      nativeTiledWatermarkText = form.string("nativeTiledWatermarkText"),
      pdfA = form.string("pdfa"),
      pdfUa = form.bool("pdfua", default = false))
    if (o.quality < 1 || o.quality > 100)
      form.addError(s"form field 'quality' must be within [1, 100] (got '${o.quality}')")
    if (!Set(75, 150, 300, 600, 1200).contains(o.maxImageResolution))
      form.addError(
        s"form field 'maxImageResolution' must be 75, 150, 300, 600 or 1200 (got '${o.maxImageResolution}')")
    o
  }

  /** Native-vs-post-process PDF/A decision (`libreoffice/routes.go:
    * 336-337,389-394,481-502`): convert natively inside LibreOffice
    * only when no split and no post-processing would degrade
    * compliance; otherwise convert after the chain.
    */
  def convertNatively(o: LibreOfficeOptions, split: SplitOptions,
                      hasPostProcessing: Boolean): Boolean =
    (o.pdfA.nonEmpty || o.pdfUa) && split.mode.isEmpty && !hasPostProcessing
}
