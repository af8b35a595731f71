package graft.sinks

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.DataFrame

/** K4 — REST catalog sink (update_exam_sql_db_gg, Cenir_DB.py:137-158):
  * each exam row POSTs as form parameters to the reservation API with
  * the fixed extras (range/log/token/test); rows with rid == 0 are
  * skipped up front (do_dicom.py:114-116); response lines containing
  * ERROR are counted (the reference logs them at error level).
  *
  * Spark-first shape: `foreachPartition` — each partition posts its own
  * rows through one transport, so N executors drain the batch
  * concurrently and nothing funnels through the driver. Transient
  * failures retry with exponential backoff; a row that exhausts its
  * retries is COUNTED (Result.failed), not thrown — one dead endpoint
  * row must not kill a catalog-scale job, and the caller decides from
  * the counts. Counts travel back on accumulators.
  *
  * Delivery is AT-LEAST-ONCE: a task that fails (or runs speculatively)
  * after posting part of its partition is re-run in full, so the
  * endpoint can see a row more than once. Every POST therefore carries
  * an `idem` parameter — a deterministic hash of the row's content —
  * for endpoint-side dedup; callers who cannot dedup server-side should
  * run the job with `spark.speculation=false` and treat Result.posted
  * as an upper bound. The accumulator COUNTS are exactly-once (Spark
  * applies action-accumulator updates only for the first successful
  * attempt of each task), so posted/failed reflect the winning
  * attempts, not retries.
  *
  * The transport is a trait so tests (and alternate auth schemes) can
  * inject; [[HttpTransport]] is the JDK-only production default,
  * exercised end-to-end in SourcesSinksSpec against a local HTTP stub.
  */
trait RestTransport extends Serializable {
  /** POST form-encoded params, return the response body; throw on
    * transport or HTTP >= 400 failure. */
  def post(url: String, params: Seq[(String, String)]): String
}

object HttpTransport extends RestTransport {
  override def post(url: String, params: Seq[(String, String)]): String = {
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    val conn = new java.net.URI(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(30000)
      conn.setRequestProperty("Content-Type",
        "application/x-www-form-urlencoded")
      val body = params.map { case (k, v) => s"${enc(k)}=${enc(v)}" }
        .mkString("&")
      conn.getOutputStream.write(body.getBytes(UTF_8))
      val code = conn.getResponseCode
      val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
      val text = if (is == null) ""
        else new String(is.readAllBytes(), UTF_8)
      if (code >= 400)
        throw new java.io.IOException(s"HTTP $code from $url: ${text.take(200)}")
      text
    } finally conn.disconnect()
  }
}

object RestSink {

  /** posted = rows acknowledged; skippedNoRid = rid==0 rows never sent;
    * failed = rows that exhausted retries; errorLines = ERROR lines
    * across all responses (the reference's log-scrape). */
  case class Result(posted: Long, skippedNoRid: Long, failed: Long,
    errorLines: Long)

  def postExams(df: DataFrame, url: String, token: String,
      transport: RestTransport = HttpTransport, maxRetries: Int = 3,
      test: Boolean = false): Result = {
    val sc = df.sparkSession.sparkContext
    val posted = sc.longAccumulator("rest_posted")
    val skipped = sc.longAccumulator("rest_skipped_no_rid")
    val failed = sc.longAccumulator("rest_failed")
    val errLines = sc.longAccumulator("rest_error_lines")
    val fields = df.schema.fieldNames
    val ridIdx = fields.indexOf("rid")
    require(ridIdx >= 0, "REST sink input needs a rid column")
    df.foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        rows.foreach { row =>
          if (row.isNullAt(ridIdx) ||
              String.valueOf(row.get(ridIdx)) == "0") {
            skipped.add(1) // do_dicom.py:114-116
          } else {
            val vals = fields.indices.map(i =>
              if (row.isNullAt(i)) "" else String.valueOf(row.get(i)))
            // content-derived, so identical across retries, speculative
            // attempts, and whole-job re-runs of the same batch
            val idem = java.security.MessageDigest.getInstance("MD5")
              .digest(vals.mkString("\u0000").getBytes(UTF_8))
              .map("%02x".format(_)).mkString
            val params = fields.indices.map(i => fields(i) -> vals(i)) ++
              Seq("range" -> "100", "log" -> "2", "token" -> token,
                "test" -> (if (test) "1" else "0"), "idem" -> idem)
            var attempt = 0
            var done = false
            while (!done) {
              try {
                val text = transport.post(url, params)
                errLines.add(text.linesIterator.count(_.contains("ERROR")))
                posted.add(1)
                done = true
              } catch {
                case _: java.io.IOException if attempt < maxRetries =>
                  attempt += 1
                  Thread.sleep(50L << attempt) // backoff: 100/200/400 ms
                case _: java.io.IOException =>
                  failed.add(1)
                  done = true
              }
            }
          }
        }
    }
    Result(posted.value, skipped.value, failed.value, errLines.value)
  }
}
