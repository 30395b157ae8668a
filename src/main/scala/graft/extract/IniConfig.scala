package graft.extract

/** Minimal configparser-compatible INI reader.
  *
  * The reference keeps its settings in `config.ini` read with Python's
  * `configparser` (reference `extract_script.py:13-30`, `config.ini:1-5`);
  * graft's mains historically took `.properties` files. This parser
  * accepts the reference's file shape directly, matching configparser's
  * defaults for the constructs that appear in such files:
  *
  *  - `[section]` headers; keys below belong to the section,
  *  - `key = value` or `key : value` (first separator wins),
  *  - keys lowercased (configparser's default `optionxform`),
  *  - values trimmed, empty values allowed,
  *  - `;` / `#` full-line comments and blank lines ignored,
  *  - a later duplicate key overwrites the earlier one.
  *
  * Interpolation and multi-line continuation values are intentionally
  * unsupported (the reference uses neither); a key outside any section
  * is an error, as in configparser.
  */
object IniConfig {

  def parse(content: String): Map[String, Map[String, String]] = {
    val out = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.LinkedHashMap[String, String]]
    var section: Option[String] = None
    content.linesIterator.zipWithIndex.foreach { case (raw, i) =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith(";") && !line.startsWith("#")) {
        if (line.startsWith("[") && line.endsWith("]")) {
          val name = line.substring(1, line.length - 1).trim
          section = Some(name)
          out.getOrElseUpdate(name, scala.collection.mutable.LinkedHashMap.empty)
        } else {
          val sep = {
            val eq = line.indexOf('='); val co = line.indexOf(':')
            if (eq < 0) co else if (co < 0) eq else math.min(eq, co)
          }
          if (sep <= 0) sys.error(s"config.ini line ${i + 1}: not a 'key = value' line: $raw")
          val sec = section.getOrElse(
            sys.error(s"config.ini line ${i + 1}: key before any [section]"))
          // Locale.ROOT: configparser's optionxform is ASCII str.lower;
          // a default-locale lowercase turns 'CLIENT_ID' into
          // 'clıent_ıd' (dotless ı) on a tr_TR JVM and every lookup
          // then misses
          out(sec).update(
            line.take(sep).trim.toLowerCase(java.util.Locale.ROOT),
            line.drop(sep + 1).trim)
        }
      }
    }
    out.map { case (k, v) => k -> v.toMap }.toMap
  }

  def read(path: java.nio.file.Path): Map[String, Map[String, String]] =
    parse(java.nio.file.Files.readString(path))

  /** Section accessor with the reference's error behavior (it exits
    * when `[database]` is missing — we throw with the same message
    * shape and let the main decide). */
  def section(ini: Map[String, Map[String, String]], name: String): Map[String, String] =
    ini.getOrElse(name, sys.error(s"config.ini must have a [$name] section"))
}
