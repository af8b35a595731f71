package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ConfigSource

/** S15/K11: sectioned INI config → option defaults, and write-back that
  * preserves foreign sections — ConfigParser-compatible round trip
  * (reference do_common.py:152-165 / 224-236). */
class ConfigSourceSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory("confsrc")
    d.resolve(name).toString
  }

  // what Python's RawConfigParser.write() emits for the reference's
  // own conf (lowercased keys, `key = value`, True/False booleans)
  private val refStyle =
    """[dicom_job]
      |scan_dir = /data/incoming
      |recursive = True
      |send_mail = False
      |max_series = 250
      |
      |[results_db]
      |host = db.example
      |port = 3306
      |""".stripMargin

  test("read: sections, comments, ':' separator, lowercased keys, " +
      "missing file reads empty") {
    val p = tmp("a.conf")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
      refStyle + "\n# trailing comment\n; alt comment\nUPPER: mixed\n")
    val all = ConfigSource.read(p)
    assert(all.keySet == Set("dicom_job", "results_db"))
    assert(all("dicom_job")("scan_dir") == "/data/incoming")
    assert(all("dicom_job")("max_series") == "250")
    // ':' separated + uppercase key, appended under the LAST section
    assert(all("results_db")("upper") == "mixed")
    assert(ConfigSource.read(tmp("missing.conf")).isEmpty)
    assert(ConfigSource.section(p, "no_such").isEmpty)
  }

  test("withDefaults: conf section defaults under explicit options, " +
      "booleans normalized, explicit keys always win") {
    val p = tmp("b.conf")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p), refStyle)
    val opts = ConfigSource.withDefaults(p, "dicom_job",
      explicit = Map("scan_dir" -> "/override", "new_flag" -> "1"))
    assert(opts("scan_dir") == "/override", "explicit must beat the file")
    assert(opts("recursive") == "true" && opts("send_mail") == "false",
      "ConfigParser True/False must normalize to lowercase")
    assert(opts("max_series") == "250" && opts("new_flag") == "1")
  }

  test("readerDefaults drives a real reader: csv header option comes " +
      "from the conf section") {
    val dir = java.nio.file.Files.createTempDirectory("confcsv")
    val csv = dir.resolve("t.csv")
    java.nio.file.Files.writeString(csv, "name,qty\nwidget,3\nbolt,5\n")
    val p = tmp("c.conf")
    ConfigSource.writeSection(p, "csv_job",
      Map("header" -> "true", "inferSchema" -> "true"))
    val df = ConfigSource.readerDefaults(spark.read, p, "csv_job")
      .csv(csv.toString)
    assert(df.columns.toSeq == Seq("name", "qty"),
      "header=true from the conf section must reach the reader")
    assert(df.count() == 2)
  }

  test("writeSection: upserts the target section, preserves every " +
      "other section and key, survives a reread round trip") {
    val p = tmp("d.conf")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p), refStyle)
    ConfigSource.writeSection(p, "dicom_job",
      Map("max_series" -> "999", "NEW_KEY" -> "added"))
    val all = ConfigSource.read(p)
    assert(all("dicom_job")("max_series") == "999", "upsert overwrites")
    assert(all("dicom_job")("new_key") == "added", "upsert adds, lowercased")
    assert(all("dicom_job")("scan_dir") == "/data/incoming",
      "untouched keys of the target section survive")
    assert(all("results_db") ==
      Map("host" -> "db.example", "port" -> "3306"),
      "foreign sections must be preserved verbatim")
    // creating a brand-new section in a brand-new file also works
    val fresh = tmp("e.conf")
    ConfigSource.writeSection(fresh, "s1", Map("k" -> "v"))
    assert(ConfigSource.section(fresh, "s1") == Map("k" -> "v"))
  }

  test("write → read → write is stable (ConfigParser-style emission)") {
    val p = tmp("f.conf")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p), refStyle)
    ConfigSource.writeSection(p, "results_db", Map("port" -> "3307"))
    val once = java.nio.file.Files.readString(java.nio.file.Paths.get(p))
    ConfigSource.writeSection(p, "results_db", Map("port" -> "3307"))
    val twice = java.nio.file.Files.readString(java.nio.file.Paths.get(p))
    assert(once == twice, "idempotent rewrite")
    assert(once.contains("[results_db]") && once.contains("port = 3307"))
  }
}
