package graft.config

import java.time.{Instant, OffsetDateTime, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.model._

/**
 * Compiles an INI rule file into a [[graft.model.ValidationSuite]] —
 * the suite "logical plan" later lowered to Catalyst Columns.
 *
 * Mirrors `TestCase.__init__` + `Field.__init__`
 * (reference: odevalidator/validator.py:24-80,262-292):
 *  - `_settings` carries DataType / Sequential / HasHeader;
 *  - every other section is one rule; sections whose path contains a
 *    `.list` segment are dynamic list rules (validator.py:289-291);
 *  - `Values`/`Choices`/`EqualsValue` are JSON literals;
 *  - `LatestTime = NOW` resolves at suite-compile time (validator.py:69-70).
 */
object SuiteLoader {

  private val mapper = new ObjectMapper()

  def fromFile(path: String): ValidationSuite =
    fromString(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))

  def fromString(text: String): ValidationSuite = {
    val ini = Ini.parse(text)
    val settings = ini.section("_settings").getOrElse(
      throw new IllegalArgumentException("Invalid config ini file, '_settings' field not defined."))
    val dataType = settings.getOrElse("datatype", "json")
    val sequential = settings.get("sequential").exists(_.equalsIgnoreCase("true"))
    val hasHeader = dataType == "csv" &&
      ini.get("_settings", "HasHeader").exists(_.equalsIgnoreCase("true"))

    val rules = ini.sections.collect {
      case (name, kvs) if name != "_settings" => compileRule(name, k => kvs.get(k.toLowerCase))
    }.toSeq
    ValidationSuite(dataType, sequential, hasHeader, rules)
  }

  private def compileRule(path: String, get: String => Option[String]): FieldRule = {
    val fieldType = get("Type").getOrElse(
      throw new IllegalArgumentException(s"Missing required configuration property 'Type' for field $path"))

    val (conds, opaque) = get("EqualsValue") match {
      case None => (Nil, false)
      case Some(raw) =>
        val node = mapper.readTree(raw)
        if (node.isObject && node.has("conditions"))
          (parseConditions(node.get("conditions")), false)
        // Python-Iterable values (dict/list/str) without 'conditions' fall
        // through to _check_unconditional (validator.py:98-126) — the
        // normal checks still run; only NON-iterable values (numbers,
        // booleans, null) leave validation = None, skipping everything
        else if (node.isObject || node.isArray || node.isTextual) (Nil, false)
        else (Nil, true)
    }

    FieldRule(
      path = path,
      fieldType = fieldType,
      values = get("Values").map(parseScalarArray).getOrElse(Nil),
      choices = get("Choices").map(v => parseScalarArray(v).map(_.asInstanceOf[JStr].value)).getOrElse(Nil),
      upperLimit = get("UpperLimit").map(BigDecimal(_)),
      lowerLimit = get("LowerLimit").map(BigDecimal(_)),
      dateFormat = get("DateFormat"),
      earliestTime = get("EarliestTime").map(parseTime),
      latestTime = get("LatestTime").map {
        // resolved once at suite-compile time, like the reference's
        // datetime.now(timezone.utc) at Field init (validator.py:69-70);
        // NowTime stays available for programmatic suites wanting query-time NOW
        case "NOW" => FixedTime(Instant.now())
        case other => FixedTime(parseTime(other))
      },
      allowEmpty = get("AllowEmpty").contains("True"),
      conditions = conds,
      equalsValueOpaque = opaque,
      isListRule = path.split('.').contains("list"))
  }

  private def parseConditions(arr: JsonNode): Seq[ConditionalRule] = {
    (0 until arr.size).map { i =>
      val c = arr.get(i)
      val ifNode = c.get("ifPart")
      val ifPart = IfPart(
        fieldName = ifNode.get("fieldName").asText,
        fieldValues = Option(ifNode.get("fieldValues")).map(jsonScalars))
      val thenPart = Option(c.get("thenPart")).map { t =>
        ThenPart(
          matchAgainst = Option(t.get("matchAgainst")).map(jsonScalars),
          startsWithField = Option(t.get("startsWithField")).map(_.asText),
          // Python truthiness (validator.py:110): any non-empty string counts,
          // booleans/numbers by value.
          skipSequentialValidation = Option(t.get("skipSequentialValidation")).exists { n =>
            if (n.isBoolean) n.asBoolean
            else if (n.isNumber) n.decimalValue().signum != 0
            else n.asText.nonEmpty
          })
      }
      ConditionalRule(ifPart, thenPart)
    }
  }

  private def parseScalarArray(raw: String): Seq[JsonScalar] =
    jsonScalars(mapper.readTree(raw))

  private def jsonScalars(node: JsonNode): Seq[JsonScalar] =
    (0 until node.size).map { i =>
      val n = node.get(i)
      if (n.isNumber) JNum(BigDecimal(n.decimalValue())) else JStr(n.asText)
    }

  /** Lenient ISO-ish timestamp parse for config literals (validator.py:63-75
   *  uses dateutil; configs only ever carry ISO-8601 or nothing). */
  private[config] def parseTime(s: String): Instant = {
    val t = s.trim
    def attempt[A](f: => A): Option[A] = try Some(f) catch { case _: Exception => None }
    attempt(OffsetDateTime.parse(t).toInstant)
      .orElse(attempt(Instant.parse(t)))
      .orElse(attempt(LocalDateTime.parse(t).toInstant(ZoneOffset.UTC)))
      .orElse(attempt(LocalDateTime.parse(t, DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")).toInstant(ZoneOffset.UTC)))
      .orElse(attempt(java.time.LocalDate.parse(t).atStartOfDay.toInstant(ZoneOffset.UTC)))
      .getOrElse(throw new IllegalArgumentException(s"Unable to parse configuration timestamp: $s"))
      // dateutil truncates to whole seconds via .replace(microsecond=0) (validator.py:64,75)
      .truncatedTo(java.time.temporal.ChronoUnit.SECONDS)
  }
}
