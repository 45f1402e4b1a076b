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

  /** Bind every nested option column on a task frame in one shot;
    * malformed JSON yields null (the engine's error-row guard checks
    * `isnull` where the reference 400s).
    */
  def bindNested(df: DataFrame,
                 cookiesJson: String = "cookies",
                 headersJson: String = "extraHttpHeaders",
                 metadataJson: String = "metadata",
                 failOnJson: String = "failOnHttpStatusCodes"): DataFrame = {
    def has(c: String) = df.columns.contains(c)
    var out = df
    if (has(cookiesJson)) out = out.withColumn(cookiesJson, cookiesCol(col(cookiesJson)))
    if (has(headersJson)) out = out.withColumn(headersJson, headersCol(col(headersJson)))
    if (has(metadataJson)) out = out.withColumn(metadataJson, metadataCol(col(metadataJson)))
    if (has(failOnJson)) out = out.withColumn(failOnJson, statusCodesCol(col(failOnJson)))
    out
  }
}
