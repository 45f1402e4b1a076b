package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The JSON-encoded nested option fields of the reference (§1.2 SURVEY:
  * cookies `[]Cookie`, extraHttpHeaders `map[string]string`,
  * metadata `map[string]any`, emulatedMediaFeatures, failOn* lists —
  * `chromium/routes.go:36-43,117-253`, `pdfengines/routes.go:106-169`)
  * parsed into typed columns with `from_json` — the Catalyst-native
  * answer to the reference's encoding/json binds, fully codegen'd and
  * schema-checked at plan time.
  */
object OptionColumns {

  /** Cookie{name,value,domain,path,secure,httpOnly,sameSite}
    * (`chromium/chromium.go:382-410`).
    */
  val cookieSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("name", StringType),
    StructField("value", StringType),
    StructField("domain", StringType),
    StructField("path", StringType),
    StructField("secure", BooleanType),
    StructField("httpOnly", BooleanType),
    StructField("sameSite", StringType))))

  /** ExtraHttpHeader{name,value,scope} (`chromium/chromium.go:412-426`);
    * the wire form is a map, scope rides a parallel map.
    */
  val headersSchema: MapType = MapType(StringType, StringType)

  val metadataSchema: MapType = MapType(StringType, StringType)

  val statusCodesSchema: ArrayType = ArrayType(IntegerType)

  /** emulatedMediaFeatures: the wire form is `map[string]string`
    * (`chromium/routes.go:36-43,233-250`); the engine form is an array
    * of {name, value} structs sorted by name (the reference appends Go
    * map entries in iteration order — nondeterministic — so the
    * canonical engine order is sorted).
    */
  val mediaFeaturesSchema: MapType = MapType(StringType, StringType)

  def mediaFeaturesCol(json: Column): Column =
    array_sort(transform(map_entries(from_json(json, mediaFeaturesSchema)),
      e => struct(e.getField("key").as("name"), e.getField("value").as("value"))))

  /** Recursive bookmark tree schema (`pdfengines/routes.go:133-170`,
    * `pdfengine.go:200-207`: {title, page, children:[...]}) capped at
    * `maxDepth` levels — Catalyst types are finite, so the bind rejects
    * (nulls) anything nested deeper, which the engine treats like the
    * reference's 400 on malformed bookmark JSON.
    */
  def bookmarksSchema(maxDepth: Int = 6): ArrayType = {
    def level(d: Int): StructType = {
      val base = Seq(
        StructField("title", StringType),
        StructField("page", IntegerType))
      StructType(if (d <= 1) base else base :+ StructField("children", ArrayType(level(d - 1))))
    }
    ArrayType(level(maxDepth))
  }

  def bookmarksCol(json: Column, maxDepth: Int = 6): Column =
    from_json(json, bookmarksSchema(maxDepth))

  /** Parsed bookmark rows → the in-operator [[Bookmark]] tree (the
    * bridge to SpanOps.writeBookmarks/readBookmarks).
    */
  def rowToBookmarks(rows: Seq[org.apache.spark.sql.Row]): Seq[Bookmark] =
    if (rows == null) Nil
    else rows.filter(_ != null).map { r =>
      val title = if (r.isNullAt(0)) "" else r.getString(0)
      val page = if (r.isNullAt(1)) 0 else r.getInt(1)
      val children =
        if (r.length > 2 && !r.isNullAt(2)) rowToBookmarks(r.getSeq[org.apache.spark.sql.Row](2))
        else Nil
      Bookmark(title, page, children)
    }

  /** Parse a cookies JSON column and canonicalize sameSite in place —
    * the column twin of the sameSiteRegexp rewrite
    * (`chromium/routes.go:27-30,117-158`).
    */
  def cookiesCol(json: Column): Column =
    transform(from_json(json, cookieSchema), c =>
      c.withField("sameSite",
        when(lower(c.getField("sameSite")) === "lax", "Lax")
          .when(lower(c.getField("sameSite")) === "strict", "Strict")
          .when(lower(c.getField("sameSite")) === "none", "None")
          .otherwise(c.getField("sameSite"))))

  def headersCol(json: Column): Column = from_json(json, headersSchema)

  def metadataCol(json: Column): Column = from_json(json, metadataSchema)

  def statusCodesCol(json: Column): Column = from_json(json, statusCodesSchema)

  /** The navigation/wait option group (`chromium/routes.go:113-116,159,
    * 219-232`): waitDelay (Go duration → millis), waitWindowStatus /
    * waitForExpression / waitForSelector / userAgent (plain strings),
    * emulatedMediaType (enum). These are the last form fields of the
    * reference's Chromium surface to gain typed columns.
    */

  /** waitDelay: Go-duration string → whole milliseconds; null for
    * anything `time.ParseDuration` rejects (the engine's error-row
    * guard checks `isnull` where the reference 400s).
    */
  def waitDelayMsCol(c: Column): Column =
    graft.functions.TextFunctions.goDurationMsCol(c)

  /** emulatedMediaType: '' (default) | 'screen' | 'print'; anything
    * else nulls (the reference rejects with "wrong value, expected
    * either 'screen', 'print' or empty", `chromium/routes.go:219-232`).
    */
  def emulatedMediaTypeCol(c: Column): Column =
    when(c.isNull || c === "" || c === "screen" || c === "print", coalesce(c, lit("")))
      .otherwise(lit(null).cast(StringType))

  /** F13-style cross-constraint: the deprecated waitWindowStatus field
    * is bound but no longer consumed by the browser actions
    * (`chromium/routes.go:114,265` vs `browser.go:350-383` — only
    * WaitForExpression reaches the page); its documented legacy meaning
    * is polling `window.status === '<value>'`. The rewrite produces the
    * EFFECTIVE wait expression: an explicit waitForExpression wins,
    * otherwise a set waitWindowStatus lowers to its expression form.
    */
  def effectiveWaitExpression(waitWindowStatus: Column, waitForExpression: Column): Column =
    when(waitForExpression.isNotNull && waitForExpression =!= "", waitForExpression)
      .when(waitWindowStatus.isNotNull && waitWindowStatus =!= "",
        concat(lit("window.status === '"), waitWindowStatus, lit("'")))
      .otherwise(lit(""))

  /** Bind every nested option column on a task frame in one shot;
    * malformed JSON yields null (the engine's error-row guard checks
    * `isnull` where the reference 400s).
    */
  def bindNested(df: DataFrame,
                 cookiesJson: String = "cookies",
                 headersJson: String = "extraHttpHeaders",
                 metadataJson: String = "metadata",
                 failOnJson: String = "failOnHttpStatusCodes",
                 mediaFeaturesJson: String = "emulatedMediaFeatures",
                 bookmarksJson: String = "bookmarks"): DataFrame = {
    def has(c: String) = df.columns.contains(c)
    var out = df
    if (has(cookiesJson)) out = out.withColumn(cookiesJson, cookiesCol(col(cookiesJson)))
    if (has(headersJson)) out = out.withColumn(headersJson, headersCol(col(headersJson)))
    if (has(metadataJson)) out = out.withColumn(metadataJson, metadataCol(col(metadataJson)))
    if (has(failOnJson)) out = out.withColumn(failOnJson, statusCodesCol(col(failOnJson)))
    if (has(mediaFeaturesJson)) out = out.withColumn(mediaFeaturesJson, mediaFeaturesCol(col(mediaFeaturesJson)))
    if (has(bookmarksJson)) out = out.withColumn(bookmarksJson, bookmarksCol(col(bookmarksJson)))
    out
  }
}
