package graft.bench

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftFunctions, SharedSpark, Tables}
import graft.operators.DedupOps

/** Guarded versions of the three round-10 one-shot measurements
  * (VERDICT r10 ask #8): LshRecallProbe, StreamDedupProbe, and the
  * ScaleUp constant-density j3 methodology were run once and their
  * headline numbers recorded in BENCH_NOTES — nothing would fail if a
  * later change eroded them. These specs re-derive each headline
  * property at suite scale with stated tolerances (BandCapMarginSpec
  * is the model), so erosion fails loudly instead of aging silently:
  *
  *  1. recall@J≥0.8 of the capped LSH chain stays ≥ 0.98 even when
  *     the band cap GENUINELY BINDS (probe headline: 99.74% → 99.40%
  *     from sf0.1 to sf10 with the 1000 cap firing — here the cap is
  *     lowered until it fires on the sf0.1 corpus);
  *  2. streaming dedup per-batch cost stays FLAT in store size
  *     (probe headline: 1.03 s → 1.46 s for a 100× store) — a 20×
  *     store may cost at most 3× per batch at suite scale, which a
  *     reintroduced per-batch corpus re-banding would blow through;
  *  3. ScaleUp's constant-density event mode really is
  *     constant-density (the j3 re-probe's validity: day keys never
  *     collide across copies, per-day volume stays at the base rate)
  *     while dense mode multiplies per-day volume in place.
  */
class ProbeGuardSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val Off = 100000000L // planted-copy id offset, scale-safe

  test("LSH recall under a BINDING band cap stays ≥ 0.98 on the " +
      "planted-copy corpus (the LshRecallProbe headline, guarded)") {
    val dir = "/root/testdata/sf0.1"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    GraftFunctions.register(spark)
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val cop = base.filter(col("doc_id") % 4 === 0)
      .select((col("doc_id") + Off).as("doc_id"),
        concat_ws(" ", expr(
          "slice(split(text, ' '), 4, size(split(text, ' ')))"))
          .as("text"))
    val all = base.union(cop).filter(length(col("text")) >= 8)
      .repartition(col("doc_id"))
      .withColumn("shingles", expr("md5_shingle60(text)"))
      .cache()
    val sh = all.select(col("doc_id"), col("shingles"))
    val banded = DedupOps.minhashBanded(sh).cache()
    // a cap BELOW this corpus's largest band bucket (~226 planted,
    // BandCapMarginSpec) — the cap must actually fire here, or the
    // test guards nothing
    val cap = 100
    val overflowed = DedupOps.bucketOverflow(banded,
      Seq("band", "band_key"), cap).count()
    assert(overflowed >= 1,
      s"cap $cap did not bind on this corpus — recall-under-cap is " +
        "untested; lower the cap")
    // the GRADED chain's shape (r12: the shingles-on-banded self-join
    // verify) — this guard must exercise what d2/d12/d15 actually run
    val detected = DedupOps.lshVerifiedPairs(banded,
      Seq("band", "band_key"), sh, 0.8, cap, ordered = false)
    val planted = all.select(col("doc_id").as("doc_a"))
      .filter(col("doc_a") % 4 === 0 && col("doc_a") < Off)
      .join(all.select(col("doc_id").as("doc_b")),
        col("doc_b") === col("doc_a") + Off)
    val truth = DedupOps.verifyJaccard(planted, sh, 0.0, ordered = false)
    val scored = truth.join(
        detected.select(col("doc_a"), col("doc_b"),
          lit(true).as("caught")),
        Seq("doc_a", "doc_b"), "left")
      .agg(sum(when(col("jacc") >= 0.8, 1L).otherwise(0L)).as("dups"),
        sum(when(col("jacc") >= 0.8 && col("caught"), 1L)
          .otherwise(0L)).as("caught"))
      .head()
    banded.unpersist(); all.unpersist()
    val (dups, caught) = (scored.getLong(0), scored.getLong(1))
    assert(dups > 50, s"only $dups planted true dups — corpus drifted")
    val recall = caught.toDouble / dups
    assert(recall >= 0.98,
      f"capped-LSH recall@J≥0.8 fell to $recall%.4f " +
        f"($caught/$dups, cap=$cap bound on $overflowed buckets) — " +
        "the 15-other-bands margin eroded")
  }

  test("streaming dedup per-batch cost is FLAT in store size: a 12× " +
      "store costs ≤ 3× per batch (the StreamDedupProbe headline, " +
      "guarded)", graft.SlowTest) {
    val src = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$src/documents.parquet").exists())
    GraftFunctions.register(spark)
    val work = java.nio.file.Files
      .createTempDirectory("sdguard").toString
    def docs: DataFrame = spark.read.parquet(s"$src/documents.parquet")
      .select(col("doc_id"), col("text"))
      .filter(length(col("text")) >= 8)
    val dk = docs.agg(max(col("doc_id"))).head.getLong(0) + 1L
    val lower = "abcdefghijklmnopqrstuvwxyz"
    def permuted(df: DataFrame, seed: Int): DataFrame = {
      val p = ScaleUp.permutation(seed)
      df.withColumn("text",
        translate(col("text"), lower + lower.toUpperCase,
          p + p.toUpperCase))
    }
    def corpus(copies: Int): DataFrame =
      (0 until copies).map { i =>
        val keyed = docs.withColumn("doc_id", col("doc_id") + lit(dk * i))
        if (i == 0) keyed else permuted(keyed, 300 + i)
      }.reduce(_ unionByName _)
    def buildStore(copies: Int, dest: String): Unit = {
      val sh = corpus(copies).repartition(col("doc_id"))
        .withColumn("shingles", expr("md5_shingle60(text)"))
        .select(col("doc_id"), col("shingles"))
      DedupOps.bandHashes(sh).write.mode("overwrite").parquet(dest)
    }
    // batch b: novel docs (fresh permutation) + verbatim copies of
    // base-corpus docs, re-keyed above every store id
    def batchOf(b: Int): DataFrame =
      permuted(docs.filter(col("doc_id") % 2 === 0), 900 + b)
        .unionByName(docs.filter(col("doc_id") % 7 === b % 7))
        .select((col("doc_id") + 10000000L * (b + 1)).as("doc_id"),
          col("text"))
    def medianBatchSec(store: String): Double = {
      DedupOps.probeAndExtend(store, batchOf(99))
        .queryExecution.toRdd.count(): Unit // warmup
      val secs = (0 until 3).map { b =>
        val t0 = System.nanoTime()
        DedupOps.probeAndExtend(store, batchOf(b))
          .queryExecution.toRdd.count(): Unit
        (System.nanoTime() - t0) / 1e9
      }
      secs.sorted.apply(secs.size / 2)
    }
    // 12× keeps the regression signal (a reintroduced per-batch
    // corpus re-banding costs ∝ store corpus ⇒ ratio ≫ 3) while
    // keeping this spec's share of the suite budget small
    buildStore(1, s"$work/s1")
    buildStore(12, s"$work/s12")
    val m1 = medianBatchSec(s"$work/s1")
    val m12 = medianBatchSec(s"$work/s12")
    val ratio = m12 / m1
    assert(ratio <= 3.0,
      f"per-batch cost grew $ratio%.2f× ($m1%.2fs → $m12%.2fs) on a " +
        "12× store — the probe path is no longer flat in store size " +
        "(re-banding the corpus per batch? batch side not broadcast?)")
  }

  test("ScaleUp constant-density events keep per-day volume at the " +
      "base rate on 3× more days; dense mode triples per-day volume " +
      "in place (the j3 re-probe's methodology, guarded)") {
    val src = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$src/events.parquet").exists())
    val ev = Tables.load(spark, src, "events")
    val ek = ev.agg(max(col("event_id"))).head.getLong(0) + 1L
    val uk = ev.agg(max(col("user_id"))).head.getLong(0) + 1L
    def perDay(df: DataFrame) = df
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
    val base = perDay(ev).cache()
    val baseDays = base.count()
    val baseMax = base.agg(max(col("n"))).head.getLong(0)

    val cd = perDay(ScaleUp.scaledEvents(ev, 3, "constant-density",
      ek, uk)).cache()
    assert(cd.count() == 3 * baseDays,
      "constant-density copies collided on day keys — j3's " +
        "time-bucketed join would cross copies and read super-linear " +
        "for data reasons")
    assert(cd.agg(max(col("n"))).head.getLong(0) == baseMax,
      "constant-density mode changed per-day volume — the axis is " +
        "supposed to be DAYS, not rate")

    val dense = perDay(ScaleUp.scaledEvents(ev, 3, "dense", ek, uk))
      .cache()
    assert(dense.count() == baseDays,
      "dense mode leaked events outside the original wall-clock window")
    assert(dense.agg(max(col("n"))).head.getLong(0) == 3 * baseMax,
      "dense mode should multiply per-day volume in place")
    base.unpersist(); cd.unpersist(); dense.unpersist()
  }
}
