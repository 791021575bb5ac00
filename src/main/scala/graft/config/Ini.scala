package graft.config

import scala.collection.immutable.ListMap

/**
 * Minimal INI parser with ExtendedInterpolation-style `${key}` /
 * `${section:key}` substitution, matching the subset of Python
 * `configparser.ConfigParser(interpolation=ExtendedInterpolation())`
 * behavior the reference rule configs rely on
 * (odevalidator/validator.py:264, config_2.ini:19,33,136).
 *
 * Supported surface (everything the three shipped configs use):
 *  - `[section]` headers; keys are `Name = value` (or `Name : value`);
 *  - `#`/`;` full-line comments;
 *  - multi-line values: continuation lines are indented and non-empty
 *    (configparser semantics — e.g. the wrapped EqualsValue JSON at
 *    config_2.ini:17-20), joined with '\n';
 *  - `${Key}` resolves within the current section, `${sect:Key}` across
 *    sections; interpolation is recursive.
 */
object Ini {

  final case class IniFile(sections: ListMap[String, ListMap[String, String]]) {
    def section(name: String): Option[ListMap[String, String]] = sections.get(name)
    def get(section: String, key: String): Option[String] =
      sections.get(section).flatMap(_.get(key.toLowerCase))
  }

  private val SectionRe = """^\[(.+)\]\s*$""".r
  private val KeyValRe  = """^([^=:\s][^=:]*?)\s*[=:]\s*(.*)$""".r

  def parse(text: String): IniFile = {
    var sections = ListMap.empty[String, ListMap[String, String]]
    var current: Option[String] = None
    var lastKey: Option[String] = None

    for (rawLine <- text.linesIterator) {
      val noComment =
        if (rawLine.trim.startsWith("#") || rawLine.trim.startsWith(";")) ""
        else rawLine
      noComment match {
        case l if l.trim.isEmpty =>
          // configparser default (empty_lines_in_values=True): a blank or
          // comment line INSIDE a multi-line value keeps the value going
          // (recorded as an empty line; trailing empties stripped below) —
          // resetting here would silently truncate wrapped JSON values
          if (lastKey.isDefined && current.isDefined) {
            val sec = current.get; val key = lastKey.get
            sections = sections.updated(sec,
              sections(sec).updated(key, sections(sec)(key) + "\n"))
          }
        case SectionRe(name) =>
          current = Some(name.trim)
          lastKey = None
          if (!sections.contains(name.trim))
            sections = sections.updated(name.trim, ListMap.empty)
        case l if l.head.isWhitespace && lastKey.isDefined && current.isDefined =>
          // continuation of previous value (configparser: indented lines)
          val sec = current.get; val key = lastKey.get
          val prev = sections(sec)(key)
          sections = sections.updated(sec, sections(sec).updated(key, prev + "\n" + l.trim))
        case KeyValRe(key, value) if current.isDefined =>
          val sec = current.get
          val k = key.trim.toLowerCase // configparser lower-cases option names
          sections = sections.updated(sec, sections(sec).updated(k, value.trim))
          lastKey = Some(k)
        case _ => // stray line outside a section — ignore
      }
    }
    // configparser strips trailing empty lines from values
    val trimmed = sections.map { case (sec, kvs) =>
      sec -> kvs.map { case (k, v) => k -> v.replaceAll("\\n+$", "") }
    }
    interpolateAll(IniFile(trimmed))
  }

  /** Resolve `${Key}` / `${section:Key}` recursively (depth-capped). */
  private def interpolateAll(ini: IniFile): IniFile = {
    val Ref = """\$\{([^}]+)\}""".r
    def resolve(section: String, value: String, depth: Int): String = {
      // ExtendedInterpolation's '$$' escape: sentinel it out BEFORE ref
      // matching so '$${x}' yields the literal '${x}', restore at top
      val esc = value.replace("$$", "\u0000")
      val out =
        if (depth > 10 || !esc.contains("${")) esc
        else Ref.replaceAllIn(esc, m => {
          val ref = m.group(1)
          val (sec, key) =
            if (ref.contains(":")) { val Array(s, k) = ref.split(":", 2); (s, k) }
            else (section, ref)
          val replacement = ini.get(sec, key)
            .map(v => resolve(sec, v, depth + 1))
            .getOrElse(m.matched)
          java.util.regex.Matcher.quoteReplacement(replacement)
        })
      if (depth == 0) out.replace("\u0000", "$") else out
    }
    IniFile(ini.sections.map { case (sec, kvs) =>
      sec -> kvs.map { case (k, v) => k -> resolve(sec, v, 0) }
    })
  }
}
