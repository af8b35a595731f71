package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-probe data generator: replicates the driver's sf0.1 tables
  * `copies`× into a scratch dir (default /tmp/sf1) so the top bench
  * queries can be timed one scale up. This data is ONLY for timing —
  * correctness stays gated on the driver's own testdata + DuckDB.
  *
  * Replication preserves the properties the probe cares about:
  *
  *  - **Referential integrity**: every key domain (custkey, orderkey,
  *    partkey, suppkey, doc_id, vec_id, user_id, event_id) is offset
  *    by `copy * (max+1)` consistently across all tables that carry
  *    it, so joins at sf1 match exactly as many rows per probe row as
  *    at sf0.1. `nation`/`region` are fixed-size dimensions in TPC-H
  *    and are copied as-is.
  *  - **Constant duplicate density**: `documents.text` is passed
  *    through a per-copy SEEDED LETTER PERMUTATION, so a copy is NOT
  *    a near-duplicate of its source — shingle/MinHash/SimHash
  *    neighborhoods keep sf0.1's density instead of every doc gaining
  *    spurious twins (which would quadratically inflate LSH pair
  *    counts and make the probe read super-linear for data reasons,
  *    not plan reasons). Text length is preserved, so length/chunking
  *    distributions are unchanged. Always scale FROM the driver's
  *    sf0.1 (copies = 10·target_sf): composing ScaleUp over its own
  *    output multiplies transforms and any structural collision in
  *    the family shows up as verbatim duplicate text.
  *  - **Distinct vectors**: embeddings get a small per-copy offset so
  *    ANN neighborhoods aren't 10-way ties.
  *  - **Events scale on a chosen axis** (arg 4):
  *      - `dense` (default): `ts` kept, user_id offset — 10× more
  *        users in the same wall-clock window. Time-bucketed
  *        neighborhoods (j3's ±300 s band) then hold 10× the events
  *        and TRUE pair outputs grow ~100× — a property of the data,
  *        not the plan (round-9 finding).
  *      - `constant-density`: each copy's `ts` additionally shifts by
  *        copy × (span + 1 day), so the corpus covers 10× more DAYS
  *        at the original per-day rate — how event volume actually
  *        grows in production. Day-keyed joins never cross copies and
  *        per-neighborhood cardinality is unchanged, so a linear
  *        operator must measure ~linear here (the j3 re-probe,
  *        VERDICT r9 ask #3).
  */
object ScaleUp {

  private val lower = "abcdefghijklmnopqrstuvwxyz"
  private val upper = lower.toUpperCase

  /** Per-copy seeded letter PERMUTATION (identity at i=0); non-letters
    * unchanged. A rotation family caps at 26 distinct transforms, so
    * any copy count above 26 — or a ScaleUp composed over an earlier
    * ScaleUp output, where net rotations add mod 26 — produces
    * VERBATIM duplicate texts across copies and quadratically inflates
    * true-dup density (this invalidated the first sf10 attempt).
    * Seeded Fisher-Yates gives 26! possible maps: copies never
    * collide, text length and shingle-set structure are preserved.
    * The shuffle is HAND-ROLLED (splitmix64-fed Fisher-Yates) so the
    * seed→permutation map is specified by this repo, not by
    * scala.util.Random.shuffle's implementation — regenerating scaled
    * corpora on a different Scala version must produce byte-identical
    * text (round-9 advice). */
  private[bench] def permutation(i: Int): String = {
    // splitmix64 (public-domain PRNG finalizer) over a per-copy seed
    var state = 0x5ca1eab1eL + i
    def next(): Long = {
      state += 0x9e3779b97f4a7c15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val a = lower.toCharArray
    var k = a.length - 1
    while (k > 0) {
      val j = (Math.floorMod(next(), k + 1L)).toInt
      val t = a(k); a(k) = a(j); a(j) = t
      k -= 1
    }
    new String(a)
  }

  private def permute(c: org.apache.spark.sql.Column, i: Int) = {
    if (i == 0) c
    else {
      val p = permutation(i)
      translate(c, lower + upper, p + p.toUpperCase)
    }
  }

  /** Events scaled on the chosen axis (see the class doc) — factored
    * out of [[main]] so ScaleUpSpec can pin the density semantics the
    * j3 re-probe depends on: `dense` multiplies per-day volume in the
    * original wall-clock window; `constant-density` shifts copy i by
    * i × (span+1) whole days, so day keys never collide across copies
    * and every per-day/per-neighborhood cardinality stays at the base
    * corpus's level. */
  private[bench] def scaledEvents(base: DataFrame, copies: Int,
      eventMode: String, eventStride: Long, userStride: Long): DataFrame = {
    // constant-density: copy i lives span+1 days later — whole
    // days, so per-day session shapes replicate exactly and
    // to_date keys never collide across copies
    val shiftDays: Long =
      if (eventMode == "dense") 0L
      else base
        .agg(((floor(unix_timestamp(max(col("ts"))) / 86400L) -
          floor(unix_timestamp(min(col("ts"))) / 86400L)) + 1L)
          .as("d")).head.getLong(0)
    (0 until copies).map { i =>
      val keyed = base
        .withColumn("event_id", col("event_id") + lit(eventStride * i))
        .withColumn("user_id", col("user_id") + lit(userStride * i))
      if (shiftDays == 0L || i == 0) keyed
      else keyed.withColumn("ts", timestamp_add(
        "DAY", lit(i * shiftDays), col("ts")))
    }.reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = if (args.length > 1) args(1) else "/tmp/sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val eventMode = if (args.length > 3) args(3) else "dense"
    require(Set("dense", "constant-density")(eventMode),
      s"event mode must be dense|constant-density, got $eventMode")

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame =
      spark.read.parquet(s"$src/$t.parquet")

    def strideOf(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1L

    // key-domain strides, shared across every table carrying the key
    val ok = strideOf(read("orders"), "o_orderkey")
    val ck = strideOf(read("customer"), "c_custkey")
    val pk = strideOf(read("part"), "p_partkey")
    val sk = strideOf(read("supplier"), "s_suppkey")
    val dk = strideOf(read("documents"), "doc_id")
    val vk = strideOf(read("embeddings"), "vec_id")
    val ek = strideOf(read("events"), "event_id")
    val uk = strideOf(read("events"), "user_id")

    /** `copies`-way union of per-copy transforms of `t`. */
    def scaled(t: String)(f: (DataFrame, Int) => DataFrame): DataFrame = {
      val base = read(t)
      (0 until copies).map(i => f(base, i)).reduce(_ unionByName _)
    }
    def shift(k: String, stride: Long, i: Int)(df: DataFrame): DataFrame =
      df.withColumn(k, col(k) + lit(stride * i))

    val out: Seq[(String, DataFrame)] = Seq(
      "region" -> read("region"),
      "nation" -> read("nation"),
      "customer" -> scaled("customer") { (d, i) =>
        shift("c_custkey", ck, i)(d)
      },
      "supplier" -> scaled("supplier") { (d, i) =>
        shift("s_suppkey", sk, i)(d)
      },
      "part" -> scaled("part") { (d, i) => shift("p_partkey", pk, i)(d) },
      "orders" -> scaled("orders") { (d, i) =>
        shift("o_custkey", ck, i)(shift("o_orderkey", ok, i)(d))
      },
      "lineitem" -> scaled("lineitem") { (d, i) =>
        shift("l_suppkey", sk, i)(
          shift("l_partkey", pk, i)(shift("l_orderkey", ok, i)(d)))
      },
      "events" -> scaledEvents(read("events"), copies, eventMode, ek, uk),
      "documents" -> scaled("documents") { (d, i) =>
        shift("doc_id", dk, i)(d)
          .withColumn("text", permute(col("text"), i))
      },
      "embeddings" -> scaled("embeddings") { (d, i) =>
        shift("vec_id", vk, i)(d).withColumn("embedding",
          transform(col("embedding"), x => x + lit(i * 1e-3f)))
      }
    )

    out.foreach { case (t, df) =>
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"wrote $dst/$t.parquet")
    }
    spark.stop()
  }
}
