package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tar-shard source — the inverse of the K12 sink ([[graft.sinks
  * .TarSink]]) and the archetypal "sharded archive corpus" reader a
  * training-data pipeline ingests (tar/WARC shards of many small
  * members: reading millions of tiny files directly thrashes any
  * filesystem's metadata layer; shards amortize it).
  *
  * Spark-first shape: the shard FILES parallelize across the cluster
  * (`binaryFile` rows — one task can hold a whole shard, the same
  * bound the sink wrote under), and each shard's members are unpacked
  * executor-side into (shard, name, payload) rows by a flatMap over
  * the USTAR block structure. Nothing driver-side; member extraction
  * is a streaming walk over one in-memory shard.
  *
  * Format discipline mirrors the sink: POSIX USTAR headers, octal
  * sizes, `prefix` field rejoined with '/', 512-byte blocks, the
  * two-zero-block terminator. Malformed trailing garbage ends the walk
  * (skip-malformed, like every reader in this repo); a corrupt SIZE
  * field fails the shard loudly rather than mis-framing every
  * subsequent member. Non-regular-file entries (dirs, links,
  * PAX/GNU extension blocks) are skipped structurally — their payload
  * still advances the cursor, so following members stay framed.
  */
object TarSource {

  /** All members of all `.tar` shards under `dir` as
    * (shard, name, payload) rows. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tar").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (shard, bytes) =>
        members(bytes).map { case (name, payload) =>
          (shard, name, payload)
        }
      }
      .toDF("shard", "name", "payload")
  }

  /** Parses one in-memory USTAR archive into (name, payload) members.
    * GNU long-name ('L') and PAX ('x') extension entries are APPLIED,
    * not just skipped: a default-format `tar -cf` stores a >100-byte
    * path in the extension block and truncates the following header's
    * name field — returning the truncated name would be silently wrong
    * data. Exposed for direct reuse (and the round-trip spec). */
  def members(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = Seq.newBuilder[(String, Array[Byte])]
    var off = 0
    var done = false
    var overrideName: Option[String] = None
    while (!done && off + 512 <= bytes.length) {
      val block = java.util.Arrays.copyOfRange(bytes, off, off + 512)
      if (block.forall(_ == 0)) done = true // end-of-archive marker
      else {
        def str(o: Int, w: Int): String = {
          var end = o
          while (end < o + w && block(end) != 0) end += 1
          new String(block, o, end - o,
            java.nio.charset.StandardCharsets.US_ASCII)
        }
        val size = java.lang.Long.parseLong(str(124, 12).trim, 8)
        if (size < 0 || off + 512 + size > bytes.length)
          throw new IllegalArgumentException(
            s"tar member at offset $off claims $size bytes past the shard")
        val payload = java.util.Arrays.copyOfRange(bytes,
          off + 512, off + 512 + size.toInt)
        val headerName = {
          val prefix = str(345, 155)
          val base = str(0, 100)
          if (prefix.isEmpty) base else s"$prefix/$base"
        }
        block(156) match {
          case b if b == '0'.toByte || b == 0.toByte =>
            out += ((overrideName.getOrElse(headerName), payload))
            overrideName = None
          case b if b == 'L'.toByte =>
            // GNU long name: payload = real name of the NEXT member,
            // NUL-terminated
            val end = payload.indexOf(0.toByte) match {
              case -1 => payload.length; case i => i
            }
            overrideName = Some(new String(payload, 0, end,
              java.nio.charset.StandardCharsets.US_ASCII))
          case b if b == 'x'.toByte =>
            // PAX extended header: "<len> path=<value>\n" records
            val text = new String(payload,
              java.nio.charset.StandardCharsets.UTF_8)
            text.split("\n").find(_.contains(" path=")).foreach { rec =>
              overrideName = Some(rec.substring(
                rec.indexOf(" path=") + 6))
            }
          case _ => () // dirs, links, global PAX: structural skip
        }
        val padded = ((size + 511) / 512) * 512
        off += 512 + padded.toInt
      }
    }
    out.result()
  }
}
