package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** INI config source + write-back (SURVEY §2 S15/K11) — the reference's
  * job-option defaulting loop re-expressed for Spark jobs: a sectioned
  * `key = value` file whose section items become DEFAULTS under the
  * caller's explicit options (do_common.py:152-165 reads a conf section
  * into the option parser's defaults; explicit flags still win), and a
  * write-back that persists the effective options to a section while
  * PRESERVING every other section (do_common.py:224-236).
  *
  * Format is Python-ConfigParser compatible — the same files the
  * reference reads/writes round-trip here: `[section]` headers,
  * `key = value` (or `key: value`) lines, `#`/`;` comments, keys
  * lowercased on read, values written as `key = value`. Dependency-free
  * like every other source in this package.
  *
  * The natural Spark seam: the merged map IS a `DataFrameReader
  * .options(…)` / `DataFrameWriter.options(…)` payload, so a job's
  * source/sink tuning lives in a conf section instead of code —
  * [[readerDefaults]] is that one-liner.
  */
object ConfigSource {

  /** Parse an INI file: section name → (key → value), insertion-ordered.
    * A missing file reads as empty (the reference's `os.path.isfile`
    * guard). Keys are lowercased, matching RawConfigParser. */
  def read(path: String): Map[String, Map[String, String]] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) return Map.empty
    val sections = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.LinkedHashMap[String, String]]
    var current: Option[String] = None
    val header = """^\[(.+)\]\s*$""".r
    val kv = """^([^=:\s][^=:]*?)\s*[=:]\s*(.*)$""".r
    Files.readString(p, StandardCharsets.UTF_8).linesIterator.foreach {
      raw =>
        val line = raw.trim
        line match {
          case "" => ()
          case l if l.startsWith("#") || l.startsWith(";") => ()
          case header(name) =>
            current = Some(name)
            sections.getOrElseUpdate(name,
              scala.collection.mutable.LinkedHashMap.empty)
          case kv(k, v) =>
            current.foreach(sec =>
              sections(sec)(k.toLowerCase.trim) = v.trim)
          case _ => () // continuation/garbage lines: ignored, like the ref
        }
    }
    sections.map { case (s, m) => s -> m.toMap }.toMap
  }

  /** One section's items, empty if the file or section is absent. */
  def section(path: String, name: String): Map[String, String] =
    read(path).getOrElse(name, Map.empty)

  /** The reference's `convert_str_to_boolean`: ConfigParser stringifies
    * booleans as "True"/"False"; normalize them back (here to the
    * lowercase forms Spark reader options expect). Other values pass
    * through untouched. */
  def normalizeBooleans(m: Map[String, String]): Map[String, String] =
    m.map {
      case (k, "True") => k -> "true"
      case (k, "False") => k -> "false"
      case kv => kv
    }

  /** Effective options = conf-section DEFAULTS under the caller's
    * explicit options — the reference's `parser.set_defaults(**dd)`
    * then re-parse: a key set explicitly always beats the file. */
  def withDefaults(path: String, sectionName: String,
      explicit: Map[String, String]): Map[String, String] =
    normalizeBooleans(section(path, sectionName)) ++ explicit

  /** [[withDefaults]] applied to a reader — the S15 data-plane seam:
    * `ConfigSource.readerDefaults(spark.read, "conf.ini", "csv_job",
    * Map("path" -> …))`. */
  def readerDefaults(reader: org.apache.spark.sql.DataFrameReader,
      path: String, sectionName: String,
      explicit: Map[String, String] = Map.empty)
      : org.apache.spark.sql.DataFrameReader =
    reader.options(withDefaults(path, sectionName, explicit))

  /** K11 write-back (`write_configfile`): upsert `entries` into
    * `sectionName`, creating the file or section as needed and
    * PRESERVING all other sections and their keys. Existing keys in
    * the target section are overwritten (ConfigParser `set`), absent
    * ones are added; the write is whole-file atomic via temp+rename so
    * a concurrent reader never sees a half-written file. */
  def writeSection(path: String, sectionName: String,
      entries: Map[String, String]): Unit = {
    val existing = read(path)
    val target = existing.getOrElse(sectionName, Map.empty) ++
      entries.map { case (k, v) => k.toLowerCase -> v }
    val ordered =
      (existing.keys.toSeq.filterNot(_ == sectionName) :+ sectionName)
        .map(s => s -> (if (s == sectionName) target else existing(s)))
    val body = ordered.map { case (s, m) =>
      s"[$s]\n" + m.map { case (k, v) => s"$k = $v" }.mkString("\n")
    }.mkString("", "\n\n", "\n")
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    val tmp = Paths.get(path + s".tmp${ProcessHandle.current().pid()}")
    Files.writeString(tmp, body, StandardCharsets.UTF_8)
    Files.move(tmp, p,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }
}
