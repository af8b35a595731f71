package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main. Runs every SparkEntry query on SPARK_GRAFT_SF_DIR,
  * prints ONE JSON line on stdout, and also writes it to $BENCH_OUT
  * (default bench_out.json) so the driver never has to scrape sbt logs.
  *
  * Each query gets a warmup run (JIT + shuffle-file warm) before the
  * timed run; errors are recorded per query instead of silently timing a
  * failure (the round-1 bench swallowed them).
  */
object Bench {

  /** Force FULL materialization of every output column. `.count()` lets
    * Catalyst prune unconsumed projections — round-6's t13 benched at
    * 0.33 s while its consumed cost was ~30× that. `toRdd.count()`
    * executes the plan whose output is the query's real select list
    * (UnsafeRows materialize each column), so projection-only queries
    * are billed what a consumer would actually pay. */
  def consume(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.toRdd.count()

  private[graft] def jsonQ(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => " "
    case c => c.toString
  } + "\""

  /** The driver-scraped stdout line: full JSON if it fits, else drop
    * the FASTEST queries until ≤ `budget` chars (the slow ones are the
    * ones worth grading). Pure so BenchRenderSpec can gate it. */
  private[graft] def stdoutLine(
      times: Seq[(String, Double)], errors: Seq[(String, String)],
      sfDir: String, budget: Int = 1700): String = {
    val es = errors.take(3)
      .map { case (k, v) => s"${jsonQ(k)}:${jsonQ(v.take(60))}" }
      .mkString("{", ",", "}")
    val total = times.map(_._2).sum
    def render(qmap: Seq[(String, Double)], omitted: Int): String = {
      val qs = qmap.map { case (k, v) => f"${jsonQ(k)}:$v%.3f" }
        .mkString("{", ",", "}")
      val omit = if (omitted > 0) s""","queries_omitted":$omitted""" else ""
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,""" +
        s""""errors":$es,"n_ok":${times.size},"n_err":${errors.size}$omit,""" +
        s""""sf":${jsonQ(sfDir)}}"""
    }
    val bySlowest = times.sortBy(-_._2)
    Iterator.range(0, times.size + 1)
      .map(drop => render(bySlowest.dropRight(drop).sortBy(_._1), drop))
      .find(_.length <= budget)
      .getOrElse(render(Seq.empty, times.size))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def q(s: String): String = jsonQ(s)

    // optional args = query-name filter, for iterating on one operator
    // without paying for the whole suite
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => args.isEmpty || args.contains(n))
    val times = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      try {
        consume(fn(spark, sfDir)) // warmup: JIT, codegen, file listing
        // min of three timed runs: GC/JIT noise at this scale is on
        // the order of the measurement itself (round-2's w4 read 6.5 s
        // for a 0.5 s query because BOTH timed runs caught a GC pause)
        val runs = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          consume(fn(spark, sfDir))
          (System.nanoTime() - t0) / 1e9
        }
        times(name) = runs.min
        // dedup pipelines cache small feature tables; clear between
        // queries so storage memory never accumulates across the
        // suite, and drain the garbage NOW so the previous query's
        // heap doesn't bill a GC pause to the next one
        spark.catalog.clearCache()
        System.gc()
      } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.take(1).mkString.take(200)
      }
    }
    // The driver captures only the LAST ~2000 chars of stdout and parses
    // the JSON line out of that window; sbt appends its own ~90-char
    // "[success] Total time" trailer. A full-precision map of 67+ queries
    // is ~2400 chars and silently fails to parse (BENCH_r03/r04). Keep
    // the stdout line under 1700 chars by dropping the FASTEST queries
    // first (the slow ones are the ones worth grading); the full-precision
    // map always lands in $BENCH_OUT.
    val line = stdoutLine(times.toSeq, errors.toSeq, sfDir)
    println(line)
    val total = times.values.sum
    val full = times.map { case (k, v) => s"${q(k)}:$v" }
      .mkString("{", ",", "}")
    val esFull = errors.map { case (k, v) => s"${q(k)}:${q(v)}" }
      .mkString("{", ",", "}")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$full,""" +
      s""""errors":$esFull,"n_ok":${times.size},"n_err":${errors.size},""" +
      s""""sf":${q(sfDir)}}"""
    val out = sys.env.getOrElse("BENCH_OUT", "bench_out.json")
    Files.writeString(Paths.get(out), json + "\n")
    spark.stop()
  }
}
