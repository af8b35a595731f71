package graft.sinks

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.US_ASCII
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

/** K12 — tar archive sink (reference: `create_dicom_tar`,
  * do_results_DB.py:404-417, which shells out to `tar -czf` per series).
  *
  * Spark-first form: ONE archive per partition, written executor-side by
  * `foreachPartition` — rows stream through a fixed 512-byte header
  * buffer, nothing is ever collected to the driver, and archive count =
  * partition count (repartition the input to choose it). The format is
  * hand-rolled POSIX USTAR (plain uncompressed tar — 100% public,
  * dependency-free; ~40 lines of header math), so the output is
  * readable by any stock `tar` — asserted in SourcesSinksSpec against
  * the system binary.
  *
  * Determinism: entry mtime comes from the caller (a data column or a
  * constant), never the wall clock, so re-running the job produces
  * byte-identical archives — the property that makes the sink safely
  * retryable/speculative (a re-run overwrites with identical bytes).
  *
  * Input contract: `pathCol` string (entry name; names over 100 bytes
  * use the USTAR `prefix` field — up to 255 bytes split at a '/', a
  * name that cannot be split fails fast rather than truncating
  * silently), `payloadCol` binary.
  */
object TarSink {

  /** Writes each partition's (path, payload) rows to
    * `outDir/part-NNNNN.tar`. Returns the number of archives written. */
  def writeTar(df: DataFrame, pathCol: String, payloadCol: String,
      outDir: String, mtimeSec: Long = 0L): Int = {
    Files.createDirectories(Paths.get(outDir))
    val pIdx = df.schema.fieldNames.indexOf(pathCol)
    val bIdx = df.schema.fieldNames.indexOf(payloadCol)
    require(pIdx >= 0 && bIdx >= 0,
      s"tar sink needs '$pathCol' and '$payloadCol' columns")
    val written = df.sparkSession.sparkContext.longAccumulator("tars")
    df.foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val out = new BufferedOutputStream(new FileOutputStream(
            f"$outDir/part-$pid%05d.tar"))
          try {
            rows.foreach { r =>
              val name = r.getString(pIdx)
              val bytes = r.getAs[Array[Byte]](bIdx)
              out.write(header(name, bytes.length.toLong, mtimeSec))
              out.write(bytes)
              val pad = (512 - bytes.length % 512) % 512
              if (pad > 0) out.write(new Array[Byte](pad))
            }
            out.write(new Array[Byte](1024)) // end-of-archive blocks
            written.add(1)
          } finally out.close()
        }
    }
    written.value.toInt
  }

  /** Splits a path over 100 bytes into USTAR (prefix, name) at a '/'
    * such that name ≤ 100 and prefix ≤ 155 (the reader rejoins them as
    * `prefix + "/" + name`). Fails when no split point exists. */
  private[sinks] def splitName(path: String): (String, String) = {
    // ASCII-only so char offsets == byte offsets (a non-ASCII name
    // would be silently mangled by the US_ASCII encoder otherwise)
    require(path.forall(c => c >= ' ' && c < 127),
      s"tar entry name must be printable ASCII: $path")
    if (path.length <= 100) ("", path)
    else {
      // longest prefix ≤ 155 ending at a slash whose remainder ≤ 100
      val cut = path.zipWithIndex
        .filter { case (c, i) => c == '/' && i <= 155 &&
          path.length - i - 1 <= 100 }
        .map(_._2).lastOption
      cut match {
        case Some(i) => (path.substring(0, i), path.substring(i + 1))
        case None => throw new IllegalArgumentException(
          s"tar entry name not splittable into 155+100 at a '/': $path")
      }
    }
  }

  /** One 512-byte USTAR header. Numeric fields are zero-padded octal
    * ASCII; checksum is the byte sum with the checksum field itself
    * counted as spaces. */
  private[sinks] def header(name: String, size: Long,
      mtime: Long): Array[Byte] = {
    val (prefix, base) = splitName(name)
    val nameB = base.getBytes(US_ASCII)
    val h = new Array[Byte](512)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes(US_ASCII); System.arraycopy(b, 0, h, off, b.length)
    }
    def oct(off: Int, width: Int, v: Long): Unit =
      put(off, ("%0" + (width - 1) + "o").format(v))
    System.arraycopy(nameB, 0, h, 0, nameB.length)
    if (prefix.nonEmpty) put(345, prefix)
    oct(100, 8, 420)          // mode 0644
    oct(108, 8, 0)            // uid
    oct(116, 8, 0)            // gid
    oct(124, 12, size)
    oct(136, 12, mtime)
    h(156) = '0'              // typeflag: regular file
    put(257, "ustar")         // magic (NUL-terminated by the zero array)
    put(263, "00")            // version
    // checksum: field treated as 8 spaces during the sum
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    val sum = h.map(_ & 0xff).sum
    put(148, "%06o".format(sum)); h(154) = 0; h(155) = ' '
    h
  }
}
