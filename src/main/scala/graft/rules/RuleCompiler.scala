package graft.rules

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model._

/**
 * Lowers a [[ValidationSuite]] to Catalyst `Column` expression trees:
 * the whole rule set becomes ONE wide projection (no joins, no UDFs —
 * everything codegen-friendly built-ins), so Catalyst gets full freedom
 * for CSE / constant folding / null propagation across rules.
 *
 * Per-record semantics mirror the reference interpreter
 * (odevalidator/validator.py:83-243):
 *   - each rule emits struct(field_path, valid, details);
 *   - `validations` = array of all rule structs (+ per-element structs for
 *     `.list` rules, validator.py:304-378);
 *   - conditional rules are first-wins `when` chains with fallback to the
 *     unconditional check (validator.py:96-129);
 *   - skip-sequential conditions emit boolean side-columns, aggregated
 *     per-file downstream (validator.py:110-112; SURVEY §2.7 W7).
 */
object RuleCompiler {

  /** Schema-aware path resolution: dotted path with `{i}` list indices
   *  (validator.py:172-194). Unresolvable path ⇒ lit(null) — the reference
   *  yields None for any missing step. */
  def pathColumn(schema: StructType, path: String): Column = {
    val segments = path.split('.')
    resolve(schema, segments.toList, None).getOrElse(nullCol)
  }

  /** Data type a path resolves to, if any. */
  def pathType(schema: StructType, path: String): Option[DataType] =
    typeOf(schema, path.split('.').toList)

  private def nullCol: Column = lit(null).cast(StringType)

  private val IndexedSeg = """^(.+)\{(\d+)\}$""".r

  private def resolve(dt: DataType, segs: List[String], cur: Option[Column]): Option[Column] =
    segs match {
      case Nil => cur
      case seg :: rest =>
        val (name, idx) = seg match {
          case IndexedSeg(n, i) => (n, Some(i.toInt))
          case n => (n, None)
        }
        dt match {
          case st: StructType =>
            st.fields.find(_.name == name).flatMap { f =>
              val base = cur.map(_.getField(name)).getOrElse(col(quoted(name)))
              (idx, f.dataType) match {
                case (Some(i), at: ArrayType) =>
                  // element_at is 1-based; reference uses 0-based Python indexing
                  resolve(at.elementType, rest, Some(element_at(base, i + 1)))
                case (Some(_), _) => None
                case (None, inner) => resolve(inner, rest, Some(base))
              }
            }
          case _ => None
        }
    }

  private def typeOf(dt: DataType, segs: List[String]): Option[DataType] = segs match {
    case Nil => Some(dt)
    case seg :: rest =>
      val (name, idx) = seg match {
        case IndexedSeg(n, i) => (n, Some(i.toInt))
        case n => (n, None)
      }
      dt match {
        case st: StructType =>
          st.fields.find(_.name == name).flatMap { f =>
            (idx, f.dataType) match {
              case (Some(_), at: ArrayType) => typeOf(at.elementType, rest)
              case (Some(_), _) => None
              case (None, inner) => typeOf(inner, rest)
            }
          }
        case _ => None
      }
  }

  private def quoted(name: String): String = s"`$name`"

  /** Python-style truthiness per column type (validator.py:137 `not value`):
   *  null, empty string, numeric zero, false, empty array are all falsy. */
  def falsy(c: Column, dt: Option[DataType]): Column = dt match {
    case Some(StringType) => c.isNull || c === ""
    case Some(_: NumericType) => c.isNull || c === lit(0)
    case Some(BooleanType) => c.isNull || !c
    case Some(_: ArrayType) => c.isNull || size(c) === 0
    case _ => c.isNull || c.cast(StringType) === ""
  }

  private def verdict(path: String, valid: Column, details: Column): Column =
    struct(lit(path).as("field_path"), valid.as("valid"), details.as("details"))

  private def pass(path: String): Column = verdict(path, lit(true), lit(""))
  private def fail(path: String, details: Column): Column = verdict(path, lit(false), details)

  /** `%d`-style rendering of a decimal: truncation toward zero, matching
   *  Python `'%d' % Decimal(v)` in failure details (validator.py:210-213). */
  private def intRepr(c: Column): Column =
    when(c >= 0, floor(c)).otherwise(ceil(c)).cast(LongType).cast(StringType)

  private def scalarLit(s: JsonScalar): Column = s match {
    case JStr(v) => lit(v)
    case JNum(v) => lit(v.underlying())
  }

  /** Python str(list) of config scalars for details text, e.g.
   *  "['RV', 'EV']" (validator.py:167). */
  private def pyListRepr(xs: Seq[JsonScalar]): String =
    xs.map(_.repr).mkString("[", ", ", "]")

  // ---------------------------------------------------------------------
  // Unconditional check (validator.py:196-243)
  // ---------------------------------------------------------------------
  private def unconditional(rule: FieldRule, value: Column, schema: StructType): Column = {
    val path = rule.path
    val missing = fail(path, lit("Field missing: " + path))
    val empty =
      if (rule.allowEmpty) pass(path)
      else fail(path, lit("Field empty"))

    val typed: Column = rule.fieldType match {
      case FieldTypes.Enum =>
        val known = rule.values.map {
          case JStr(v) => v.toLowerCase
          case JNum(v) => JNum(v).repr.toLowerCase
        }
        val detail = concat(
          lit("Value '"), value.cast(StringType),
          lit("' not in list of known values: ["),
          lit(rule.values.map { case JStr(v) => v; case n: JNum => n.repr }.mkString(", ")),
          lit("]"))
        when(!lower(value.cast(StringType)).isin(known: _*), fail(path, detail))
          .otherwise(pass(path))

      case FieldTypes.Decimal =>
        val dec = value.cast(DecimalType(38, 10))
        val parseFail = fail(path, concat(
          lit("failure to perform decimal validation on "), value.cast(StringType)))
        val upper = rule.upperLimit.map { u =>
          when(dec > lit(u.underlying()), fail(path, concat(
            lit("Value '"), intRepr(dec), lit(s"' is greater than upper limit '${u.toBigInt}'"))))
        }
        val lower = rule.lowerLimit.map { l =>
          when(dec < lit(l.underlying()), fail(path, concat(
            lit("Value '"), intRepr(dec), lit(s"' is less than lower limit '${l.toBigInt}'"))))
        }
        val limitChecks = (upper.toSeq ++ lower.toSeq)
          .reduceOption((a, b) => coalesce(a, b))
          .getOrElse(lit(null))
        when(dec.isNull, parseFail).otherwise(coalesce(limitChecks, pass(path)))

      case FieldTypes.Timestamp =>
        val ts = parseTimestamp(value, rule.dateFormat)
        val parseFail = fail(path, lit("failure to perform timestamp validation"))
        val earliest = rule.earliestTime.map { e =>
          when(ts < lit(java.sql.Timestamp.from(e)), fail(path, concat(
            lit("Timestamp value '"), ts.cast(StringType),
            lit(s"' occurs before earliest limit '$e'"))))
        }
        val latest = rule.latestTime.map { lb =>
          val bound = lb match {
            case FixedTime(i) => lit(java.sql.Timestamp.from(i))
            case NowTime => current_timestamp() // per-query constant = suite-compile NOW
          }
          // +1 minute grace (validator.py:226)
          when(ts > bound + expr("INTERVAL 1 MINUTE"), fail(path, concat(
            lit("Timestamp value '"), ts.cast(StringType), lit("' occurs after latest limit"))))
        }
        val boundChecks = (earliest.toSeq ++ latest.toSeq)
          .reduceOption((a, b) => coalesce(a, b))
          .getOrElse(lit(null))
        when(ts.isNull, parseFail).otherwise(coalesce(boundChecks, pass(path)))

      case FieldTypes.Choice =>
        val children = rule.choices.map(ch => pathColumn(schema, rule.path + "." + ch))
        val cnt = children.map(c => when(c.isNotNull, 1).otherwise(0))
          .reduceOption(_ + _).getOrElse(lit(0))
        when(cnt === 0, fail(path, lit(s"No choices found in '$path'")))
          // >1 branch raises in the reference (format bug, validator.py:241-243)
          // and lands on the generic failure message — still invalid:
          .when(cnt > 1, fail(path, lit("failure to perform choice validation")))
          .otherwise(pass(path))

      case _ => pass(path) // string / serial / unknown: presence+empty only
    }

    when(value.isNull, missing)
      .when(value.cast(StringType) === "", empty)
      .otherwise(typed)
  }

  /** Lenient timestamp parse: coalesce chain approximating dateutil's ISO
   *  handling (validator.py:216-229); explicit DateFormat wins. */
  def parseTimestamp(value: Column, dateFormat: Option[String]): Column = dateFormat match {
    case Some(fmt) => try_to_timestamp(value, lit(pythonToJavaFormat(fmt)))
    case None => coalesce(
      try_to_timestamp(value), // ISO local / space-separated
      try_to_timestamp(value, lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")),
      try_to_timestamp(value, lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")),
      try_to_timestamp(value, lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
      try_to_timestamp(value, lit("yyyy-MM-dd'T'HH:mm:ss'Z'")),
      try_to_timestamp(value, lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")),
      try_to_timestamp(value, lit("yyyy-MM-dd HH:mm:ssXXX")),
      try_to_timestamp(value, lit("yyyy/MM/dd HH:mm:ss")),
      try_to_timestamp(value, lit("MM/dd/yyyy HH:mm:ss")))
  }

  /** Python strptime directives → java.time pattern (the subset seen in
   *  rule configs). */
  private[rules] def pythonToJavaFormat(py: String): String =
    py.replace("%Y", "yyyy").replace("%m", "MM").replace("%d", "dd")
      .replace("%H", "HH").replace("%M", "mm").replace("%S", "ss")
      .replace("%f", "SSSSSS").replace("%z", "XXX").replace("%%", "%")

  // ---------------------------------------------------------------------
  // Conditional chain (validator.py:96-170)
  // ---------------------------------------------------------------------
  private def conditionMet(cond: ConditionalRule, target: Column, schema: StructType): Column = {
    val ref = pathColumn(schema, cond.ifPart.fieldName)
    val refType = pathType(schema, cond.ifPart.fieldName)
    cond.ifPart.fieldValues match {
      case Some(vals) =>
        // referenced value ∈ fieldValues (exact; null ⇒ not met)
        coalesce(compareIn(ref, refType, vals), lit(false))
      case None =>
        // both referenced field AND target falsy ⇒ met (validator.py:134-138)
        falsy(ref, refType) && falsy(target, None)
    }
  }

  /** `value in [...]` with Python cross-type equality: numbers compare
   *  numerically, strings exactly. */
  private def compareIn(c: Column, dt: Option[DataType], vals: Seq[JsonScalar]): Column = {
    val allNum = vals.forall(_.isInstanceOf[JNum])
    if (allNum) c.cast(DecimalType(38, 10)).isin(vals.map { case JNum(v) => lit(v.underlying()).cast(DecimalType(38, 10)); case _ => lit(null) }: _*)
    else dt match {
      case Some(_: NumericType) => lit(false) // numeric value never equals string literal in Python
      case _ => c.isin(vals.collect { case JStr(v) => v }: _*)
    }
  }

  private def thenVerdict(rule: FieldRule, thenPart: Option[ThenPart], target: Column, schema: StructType): Column = {
    val path = rule.path
    thenPart match {
      case None => pass(path) // no thenPart ⇒ condition met, nothing to check (validator.py:151)
      case Some(tp) =>
        val missing = fail(path, lit("Required Field is missing."))
        val body: Column = tp match {
          case ThenPart(_, Some(swField), _) =>
            val sw = pathColumn(schema, swField)
            val swType = pathType(schema, swField)
            when(!falsy(sw, swType) && !target.cast(StringType).startsWith(sw.cast(StringType)),
              fail(path, concat(
                lit("Value of Field ('"), target.cast(StringType),
                lit("') does not start with "), sw.cast(StringType))))
              .otherwise(pass(path))
          case ThenPart(Some(vals), _, _) =>
            val targetType = None // compare raw
            when(!coalesce(compareIn(target, targetType, vals), lit(false)),
              fail(path, concat(
                lit("Value of Field ('"), target.cast(StringType),
                lit(s"') is not one of the expected values (${pyListRepr(vals)})"))))
              .otherwise(pass(path))
          case _ => pass(path)
        }
        when(target.isNull, missing).otherwise(body)
    }
  }

  /** Compile one rule to its verdict struct column. */
  def compileRule(rule: FieldRule, schema: StructType): Column = {
    val target = pathColumn(schema, rule.path)
    if (rule.equalsValueOpaque) {
      // EqualsValue was a non-conditions JSON value ⇒ reference skips all
      // checks (validator.py:96-129 returns None ⇒ pass)
      pass(rule.path)
    } else if (rule.fieldConditions.isEmpty && rule.conditions.nonEmpty) {
      // only skip-rules: field validation falls back to unconditional
      unconditional(rule, target, schema)
    } else if (rule.fieldConditions.isEmpty) {
      unconditional(rule, target, schema)
    } else {
      // first-wins chain with fallback to unconditional when none met
      rule.fieldConditions.foldRight(unconditional(rule, target, schema)) { (cond, fallback) =>
        when(conditionMet(cond, target, schema), thenVerdict(rule, cond.thenPart, target, schema))
          .otherwise(fallback)
      }
    }
  }

  /** Sequential-skip flag for one rule: true iff ANY skip condition is met
   *  on this record (aggregated per file downstream — SURVEY §2.7 W7). */
  def compileSkipFlag(rule: FieldRule, schema: StructType): Option[Column] = {
    val target = pathColumn(schema, rule.path)
    val conds = rule.skipConditions.map(c => conditionMet(c, target, schema))
    conds.reduceOption(_ || _)
  }

  /** Sanitized column name for a rule's skip flag. */
  def skipFlagName(path: String): String = "skip__" + path.replace('.', '_').replace("{", "_").replace("}", "_")

  // ---------------------------------------------------------------------
  // List rules: `a.list.b` expanded over every element (validator.py:304-378)
  // ---------------------------------------------------------------------

  /** Compile a `.list` rule to an ARRAY of verdict structs — one per actual
   *  array element. Degenerate cases mirror the reference's
   *  `populate_list_validations` exactly (traced at validator.py:313-341):
   *  a MISSING list yields two failing probes (`a{0}.b` via the ''-branch
   *  and `a{0}` via the non-list branch, both executing for data==''); an
   *  EMPTY list yields zero probes (the `range(0)` loop body never runs).
   *  One `.list` level supported (the shipped configs use at most one). */
  def compileListRule(rule: FieldRule, schema: StructType): Column = {
    val segs = rule.path.split('.').toList
    val li = segs.indexOf("list")
    val arrayPath = segs.take(li).mkString(".")
    val tailSegs = segs.drop(li + 1)
    val arrCol = pathColumn(schema, arrayPath)
    val arrType = pathType(schema, arrayPath)

    val probeBase = arrayPath + "{0}"
    val probeDeep = if (tailSegs.nonEmpty) probeBase + "." + tailSegs.mkString(".") else probeBase
    val missingProbes = array(
      fail(probeDeep, lit("Field missing: " + probeDeep)),
      fail(probeBase, lit("Field missing: " + probeBase)))

    arrType match {
      case Some(at: ArrayType) =>
        val elemVerdicts = transform(arrCol, elem => {
          val target = tailSegs.foldLeft(elem)((c, s) => c.getField(s))
          val elemSchema = at.elementType match {
            case st: StructType => st
            case _ => new StructType()
          }
          compileElementVerdict(rule, target, elemSchema)
        })
        coalesce(elemVerdicts, missingProbes)
      case _ => missingProbes
    }
  }

  /** Verdict for one list element (same unconditional semantics, path label
   *  kept as the rule path — per-element indices surface in `details`). */
  private def compileElementVerdict(rule: FieldRule, target: Column, elemSchema: StructType): Column =
    unconditional(rule.copy(conditions = Nil), target, elemSchema)

  // ---------------------------------------------------------------------
  // Whole-suite lowering
  // ---------------------------------------------------------------------

  /** All rule verdicts as one `validations` array column. */
  def validationsColumn(suite: ValidationSuite, schema: StructType): Column = {
    val scalar = suite.scalarRules.map(r => compileRule(r, schema))
    val scalarArr = array(scalar: _*)
    val listArrs = suite.listRules.map(r => compileListRule(r, schema))
    (scalarArr +: listArrs).reduceOption((a, b) => concat(a, b)).getOrElse(array())
  }

  /** Skip-flag columns (name → Column) for the suite. */
  def skipFlagColumns(suite: ValidationSuite, schema: StructType): Seq[(String, Column)] =
    suite.scalarRules.flatMap { r =>
      compileSkipFlag(r, schema).map(c => r.path -> c)
    }
}
