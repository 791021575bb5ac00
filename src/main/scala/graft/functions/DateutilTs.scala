package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.GraftTimeBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * The dateutil-leniency timestamp parse as ONE native expression.
 *
 * Why native: the Column formulation is a coalesce of ~30
 * `try_to_timestamp` branches plus regexp guards — semantically right,
 * but every branch inlines its own formatter call into the generated
 * code, so each timestamp RULE contributed a huge slab to its
 * projection's method: the ODE mega-projections slid into janino's
 * whole-stage fusion fallback, and the 100k-record head-to-head paid
 * ~3 s of extra compile. One generated call into a static walk over
 * pre-built formatters replaces the whole chain — tiny call site,
 * identical semantics (each branch is built through
 * [[GraftTimeBridge.patternParser]], exactly what
 * `try_to_timestamp(col, lit(fmt))` evaluates, and the formatless arm
 * is the same `DateTimeUtils.stringToTimestamp` the CAST grammar uses).
 *
 * Behavior is pinned row-for-row by the 45-value ref-golden grid
 * (fixtures/lenient, q_rule_timestamp_lenient): the guards (year 0,
 * double timezone), the GMT/UTC zone strip, the weekday strips, the
 * letter gate on the formatless cast, and the branch ORDER all mirror
 * the prior Column chain exactly.
 */
object DateutilTsOps {

  private val yearZeroRe = Pattern.compile("^\\s*0000([-./]|[0-9]{4})")
  private val doubleTzRe =
    Pattern.compile("(Z|[+-][0-9]{2}:?[0-9]{2})\\s+(GMT|UTC)\\s*$")
  private val zoneRe = Pattern.compile("\\s+(GMT|UTC)\\s*$")
  private val lettersRe = Pattern.compile("[A-Za-z]{2,}")
  private val wkCommaRe = Pattern.compile("^[A-Za-z]{3}, ")
  private val wkRe = Pattern.compile("^[A-Za-z]{3} ")
  // r8 residual closure (ref dateutil/parser/_parser.py, public):
  // POSIX tzstr — "UTC+05:30" names the zone Etc/GMT+5:30, i.e. the
  // OPPOSITE of the face offset — and bare ALL-CAPS tznames, which
  // dateutil accepts as a label with tzinfo=None (NAIVE result) when
  // no tzinfos mapping is given. Both require an HOUR to be present
  // (dateutil's _could_be_tzname gates on res.hour is not None).
  private val posixRe =
    Pattern.compile("\\s+(GMT|UTC)([+-])([0-9]{1,2})(?::?([0-9]{2}))?\\s*$")
  private val tznameRe = Pattern.compile("\\s+([A-Z]{2,5})\\s*$")
  private val awareTailRe =
    Pattern.compile("(Z|[+-][0-9]{2}:?[0-9]{2}|\\s(GMT|UTC))\\s*$")
  private val hasTimeRe = Pattern.compile("[0-9]:[0-9]{2}|[0-9]T[0-9]{4}")
  private val notTznames = Set("GMT", "UTC", "AM", "PM")

  // input selectors per branch
  private val RAW = 0; private val CLEANED = 1
  private val WK_COMMA = 2; private val WK = 3
  // weekday strip COMPOSED with the GMT/UTC zone strip — the RFC-1123
  // shape ("Tue, 14 May 2019 19:05:47 GMT") needs both: dateutil drops
  // the optional weekday AND resolves the trailing named UTC zone
  private val WK_COMMA_CLEANED = 4

  /** (pattern, input-selector) in EXACT prior-chain order. */
  private val spec: Array[(String, Int)] = Array(
    ("yyyy-MM-dd'T'HH:mm:ss'Z'", RAW),
    ("yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX", RAW),
    ("yyyy-MM-dd'T'HH:mm:ss.SSSXXX", RAW),
    ("yyyy-MM-dd'T'HH:mm:ssXXX", RAW),
    ("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'", RAW),
    ("yyyy-MM-dd HH:mm:ssXXX", RAW),
    ("yyyy/MM/dd HH:mm:ss", RAW),
    ("MM/dd/yyyy HH:mm:ss", CLEANED),
    ("yyyy-MM-dd'T'HH:mm:ssXX", RAW),
    ("yyyyMMdd'T'HHmmssXX", RAW),
    ("MMM d yyyy HH:mm:ss XX", RAW),
    ("MMM d yyyy HH:mm:ss", RAW),
    ("MMM d yyyy", RAW),
    ("MM/dd/yyyy HH:mm", RAW),
    ("d MMM yyyy HH:mm:ss XX", WK_COMMA),
    ("MMM d HH:mm:ss yyyy", WK),
    // zone-stripped input: identical to WK_COMMA when no zone suffix is
    // present (cleaned == raw), and additionally parses RFC-1123
    ("d MMM yyyy HH:mm:ss", WK_COMMA_CLEANED),
    ("MMM d, yyyy h:mm:ss a", RAW),
    ("dd/MM/yyyy HH:mm:ss", RAW),
    ("yyyy.MM.dd HH:mm:ss", RAW),
    ("d-MMM-yyyy HH:mm", CLEANED),
    ("yyyyMMdd", RAW),
    ("yyyy-MM-dd'T'HH:mm:ss,SSSSSS'Z'", RAW),
    ("d MMM yyyy HH:mm:ss", CLEANED),
    ("MMM d yyyy HH:mm:ss XXX", RAW))

  private lazy val parsers: Array[(String => java.lang.Long, Int)] =
    spec.map { case (p, sel) => (GraftTimeBridge.patternParser(p), sel) }

  /** The branch walk proper, over one input string (no zone-suffix
    * rewrites — those live in [[parseMicros]], which may re-enter the
    * walk on a zone-stripped base). */
  private def walkMicros(raw: String): java.lang.Long = {
    val cleaned = zoneRe.matcher(raw).replaceAll("")
    // formatless CAST grammar first (the dominant ISO family), gated
    // against multi-letter tokens (zone ids / POSIX tzstr, which the
    // cast accepts but dateutil rejects or sign-inverts)
    if (!lettersRe.matcher(cleaned).find()) {
      val r = GraftTimeBridge.castParse(cleaned)
      if (r != null) return r
    }
    lazy val wkComma = wkCommaRe.matcher(raw).replaceFirst("")
    lazy val wk = wkRe.matcher(raw).replaceFirst("")
    lazy val wkCommaCleaned = wkCommaRe.matcher(cleaned).replaceFirst("")
    var i = 0
    while (i < parsers.length) {
      val (p, sel) = parsers(i)
      val input = sel match {
        case RAW => raw
        case CLEANED => cleaned
        case WK_COMMA => wkComma
        case WK => wk
        case WK_COMMA_CLEANED => wkCommaCleaned
      }
      val r = p(input)
      if (r != null) return r
      i += 1
    }
    null
  }

  /** Epoch micros, or null when no dateutil-accepted shape matches.
    *
    * NAIVE results are epoch micros of the wall time read as UTC; the
    * aware/naive CLASSIFICATION lives in the rule compiler's `aware`
    * regex, which must stay in lockstep with the zone handling here
    * (POSIX-suffixed values are aware, bare-tzname values naive). */
  def parseMicros(v: UTF8String): java.lang.Long = {
    val raw = v.toString
    if (yearZeroRe.matcher(raw).find() || doubleTzRe.matcher(raw).find())
      return null
    val r = walkMicros(raw)
    if (r != null) return r
    // POSIX tzstr: strip "UTC+05:30", parse the base as wall time, then
    // apply the INVERTED offset. utcoffset = -(face), so
    // epoch = wall - utcoffset = wall + face — the one zone form where
    // the face sign is ADDED.
    val pm = posixRe.matcher(raw)
    if (pm.find()) {
      val base = raw.substring(0, pm.start())
      if (awareTailRe.matcher(base).find() || !hasTimeRe.matcher(base).find())
        return null
      val b = walkMicros(base)
      if (b == null) return null
      val sign = if (pm.group(2) == "+") 1L else -1L
      val off = (pm.group(3).toLong * 3600L +
        (if (pm.group(4) != null) pm.group(4).toLong * 60L else 0L)) * 1000000L
      return java.lang.Long.valueOf(b.longValue() + sign * off)
    }
    // bare ALL-CAPS tzname (EST, PQRST, …): dateutil keeps the label
    // with tzinfo=None — the value parses NAIVE
    val tm = tznameRe.matcher(raw)
    if (tm.find() && !notTznames.contains(tm.group(1))) {
      val base = raw.substring(0, tm.start())
      if (!awareTailRe.matcher(base).find() && hasTimeRe.matcher(base).find())
        return walkMicros(base)
    }
    null
  }
}

/** Lenient dateutil-style timestamp parse, null on failure — the native
 *  form of the rule compiler's parse chain (micros since epoch, UTC). */
case class DateutilTimestamp(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "graft_dateutil_ts"
  override def inputTypes: Seq[GraftBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = TimestampType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    DateutilTsOps.parseMicros(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      |java.lang.Long ${ev.value}Tmp = graft.functions.DateutilTsOps.parseMicros($v);
      |if (${ev.value}Tmp == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = ${ev.value}Tmp.longValue(); }
      |""".stripMargin)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
