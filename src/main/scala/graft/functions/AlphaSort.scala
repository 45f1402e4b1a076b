package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Alphanumeric ordering — behavioral port of the reference's
  * `AlphanumericSort` (`pkg/gotenberg/sort.go:26-110`), which defines
  * merge/zip/crawl-input ordering and therefore output span order.
  *
  * Shape of the rule (four-way, see `sort.go:36-79`):
  *   - number extracted as prefix → compare (num, rest);
  *   - number extracted right-before-extension or trailing → compare
  *     (rest, num, original);
  *   - one prefix vs one suffix-ish → compare rest, tie → prefix first;
  *   - numbered before unnumbered; neither numbered → lexicographic.
  *
  * This is a comparator, not a lexicographic key (prefix pairs compare
  * num-first while mixed pairs compare rest-first), so the exact port is
  * an `Ordering[String]` used inside per-group sorts. For plan-level /
  * oracle-checked sorting we expose [[prefixKeyCols]], the (num, rest)
  * key for the common `{n}_name.ext` fixture family, expressible in both
  * Spark and ANSI SQL.
  */
object AlphaSort {

  sealed trait NumberLoc
  case object NumberNone extends NumberLoc
  case object NumberPrefix extends NumberLoc
  case object NumberExtSuffix extends NumberLoc
  case object NumberSuffix extends NumberLoc

  private val prefixRe = """^(\d+)(.*)$""".r
  private val extSuffixRe = """^(.*?)(\d+)(\.[^.]+)$""".r
  private val suffixRe = """^(.*?)(\d+)$""".r

  /** `extractNumber` port (`sort.go:81-103`). Numbers that overflow Int
    * fall through to the next pattern, like Go's `strconv.Atoi` failure.
    */
  def extractNumber(str0: String): (Long, String, NumberLoc) = {
    val str = baseName(str0)
    def atoi(s: String): Option[Long] = {
      // Go strconv.Atoi: fits in platform int (64-bit); cap similarly.
      try { val v = java.lang.Long.parseLong(s); Some(v) }
      catch { case _: NumberFormatException => None }
    }
    str match {
      case prefixRe(num, rest) if atoi(num).isDefined =>
        return (atoi(num).get, rest, NumberPrefix)
      case _ =>
    }
    str match {
      case extSuffixRe(pre, num, ext) if atoi(num).isDefined =>
        return (atoi(num).get, pre + ext, NumberExtSuffix)
      case _ =>
    }
    str match {
      case suffixRe(pre, num) if atoi(num).isDefined =>
        return (atoi(num).get, pre, NumberSuffix)
      case _ =>
    }
    (-1L, str, NumberNone)
  }

  /** filepath.Base analog (paths in doc ids use '/'). */
  def baseName(p: String): String = {
    if (p.isEmpty) return "."
    var s = p
    while (s.length > 1 && s.endsWith("/")) s = s.dropRight(1)
    val i = s.lastIndexOf('/')
    val b = if (i >= 0) s.substring(i + 1) else s
    if (b.isEmpty) "/" else b
  }

  /** `Less` port (`sort.go:36-79`). */
  def less(x: String, y: String): Boolean = {
    val (numI, restI, locI) = extractNumber(x)
    val (numJ, restJ, locJ) = extractNumber(y)
    if (numI != -1L && numJ != -1L) {
      if (locI == NumberPrefix && locJ == NumberPrefix) {
        if (numI != numJ) numI < numJ else restI < restJ
      } else if (locI != NumberPrefix && locJ != NumberPrefix) {
        if (restI != restJ) restI < restJ
        else if (numI != numJ) numI < numJ
        else x < y
      } else {
        if (restI != restJ) restI < restJ else locI == NumberPrefix
      }
    } else if (numI != -1L) true
    else if (numJ != -1L) false
    else x < y
  }

  /** Stable ordering for in-operator sorts (merge order, zip naming). */
  val ordering: Ordering[String] = (a: String, b: String) =>
    if (less(a, b)) -1 else if (less(b, a)) 1 else 0

  def sorted(names: Seq[String]): Seq[String] = names.sorted(ordering)

  /** (num, rest) sort key Columns for prefix-numbered names — the
    * `{n}_{name}` fixture family (`pdfengines/routes.go:299-315` split
    * renaming produces exactly this shape). ANSI-expressible:
    * `CAST(regexp_extract(name,'^(\d+)',1) AS BIGINT), regexp_replace(...)`.
    */
  def prefixKeyCols(name: Column): Seq[Column] = Seq(
    when(regexp_extract(name, "^(\\d+)", 1) === "", lit(Long.MaxValue))
      .otherwise(regexp_extract(name, "^(\\d+)", 1).cast("long")),
    regexp_replace(name, "^\\d+", "")
  )

  /** digitSuffixSort port (`pdfcpu/pdfcpu.go:226` reassembly order for
    * split parts named `{base}_{i}.pdf`).
    */
  def digitSuffixOrdering: Ordering[String] = Ordering.by { s: String =>
    val m = extSuffixRe.findFirstMatchIn(baseName(s))
    m.map(_.group(2).toLong).getOrElse(Long.MaxValue)
  }
}
