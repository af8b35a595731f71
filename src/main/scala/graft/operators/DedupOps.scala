package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.load

/** Deduplication suite for large-scale training-data pipelines: exact
  * (hash-groupBy), MinHash+LSH (shingle → minhash → band → bucket join),
  * SimHash (band-blocked Hamming), and n-gram Jaccard (rare-token
  * blocked inverted index). The reference's dedup surface is A1-A3/J3
  * (timestamp-bucketed duplicate groups, Cenir_DB.py:453); these
  * generalize it to content-based near-duplicate detection over
  * `documents`.
  *
  * Scale design (the point of each variant):
  *  - nothing is ever all-pairs: candidates come from equi-joins on
  *    band/bucket keys, so the shuffle is on bucket keys and each
  *    bucket's pair blowup is local;
  *  - signatures (minhash sig, simhash bits) are computed with
  *    higher-order expressions inside whole-stage codegen — one pass
  *    over each doc, no explode×perm shuffle;
  *  - exact verification runs only on candidate pairs (25 at sf0.01),
  *    never the cross product.
  */
object DedupOps {

  /** Distinct char 8-gram shingles of `text` (min doc length is 48). */
  private val shinglesExpr =
    "array_distinct(transform(sequence(1, length(text)-7), i -> substring(text, i, 8)))"

  /** 60-bit stable hash per shingle (md5 prefix, see Fns.hash60). */
  private val hashesExpr =
    "transform(shingles, s -> cast(conv(substr(md5(cast(s as binary)),1,15),16,10) as bigint))"

  /** 28-bit variant for overflow-safe minhash permutations. */
  private val hashes28Expr =
    "transform(shingles, s -> cast(conv(substr(md5(cast(s as binary)),1,7),16,10) as bigint))"

  /** Let-binding at the expression level: evaluates `value` ONCE per row
    * and binds it as lambda variable `name` inside `body`. Without this,
    * projection collapse inlines an expensive array expression into a
    * downstream lambda and re-evaluates it on every lambda iteration
    * (observed: the 128-perm minhash recomputed its 300 md5 shingle
    * hashes inside every permutation — a ~128× blowup). */
  private def bindOnce(value: String, name: String, body: String): String =
    s"aggregate(array(1), $value, (acc_$name, ig_$name) -> acc_$name, $name -> $body)"

  /** Docs repartitioned BEFORE the heavy per-doc expressions: the
    * single-file parquet scan is one partition, and signature math must
    * run on all cores (and, on a cluster, all executors). */
  private def docsWithShingles(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(col("doc_id"), col("text"))
      .repartition(col("doc_id"))
      .withColumn("shingles", expr(shinglesExpr))

  /** Exact Jaccard over candidate pairs: join the slim shingle table on
    * both sides of the pair list, intersect/union in one projection. */
  private def verifyJaccard(pairs: DataFrame, sh: DataFrame,
      threshold: Double): DataFrame = {
    val a = sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val b = sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    pairs.join(a, "doc_a").join(b, "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni",
        size(col("sh_a")) + size(col("sh_b")) - col("inter"))
      .withColumn("jacc",
        col("inter").cast("double") / col("uni").cast("double"))
      .filter(col("jacc") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jacc"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: hash-groupBy keep-first. The input is the corpus
    // unioned with a re-keyed copy of itself so the dedup actually drops
    // rows (the raw corpus has no byte-identical duplicates).
    "d1_exact_dedup" -> ((s, dir) => {
      val d = load(s, dir, "documents").select(col("doc_id"), col("text"))
      val dup = d.withColumn("doc_id", col("doc_id") + 100000)
      d.union(dup)
        .groupBy(md5(col("text").cast("binary")).as("content_hash"))
        .agg(min(col("doc_id")).as("keeper_id"),
          count(lit(1)).as("n_copies"))
        .orderBy(col("keeper_id"))
    }),

    // MinHash + LSH: 128 permutations over 28-bit shingle hashes,
    // banded 16×8; candidates from a self-join on (band, band_key);
    // exact-Jaccard verification on candidates only. At 16 bands of 8
    // rows the false-negative probability at j≥0.9 is ~1e-10, so the
    // output equals the exact-threshold oracle.
    "d2_minhash_lsh" -> ((s, dir) => {
      val sh = docsWithShingles(s, dir)
      // hashes → signature → band keys in ONE projection, each layer
      // bound once per row (see bindOnce).
      val bandsExpr = bindOnce(hashes28Expr, "xs",
        bindOnce(
          """transform(sequence(0,127), j ->
            |  array_min(transform(xs, x ->
            |    pmod((2*j+1)*x + (j*j+7919), 2147483647))))""".stripMargin,
          "sig",
          """transform(sequence(0,15), b ->
            |  md5(cast(array_join(slice(sig, b*8+1, 8), ',') as binary)))"""
            .stripMargin))
      val sig = sh.select(col("doc_id"),
        posexplode(expr(bandsExpr)).as(Seq("band", "band_key")))
      val cands = sig.as("l").join(sig.as("r"),
          col("l.band") === col("r.band") &&
          col("l.band_key") === col("r.band_key") &&
          col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
        .distinct()
      verifyJaccard(cands, sh, 0.8)
    }),

    // SimHash: 60-bit signature (majority vote per bit over shingle
    // hashes), blocked on 10 bands of 6 bits (pigeonhole-exact for
    // Hamming ≤ 9), verified with bit_count(xor) ≤ 6. Oracle recomputes
    // the identical integer-only signature in SQL — no float anywhere.
    "d3_simhash_hamming" -> ((s, dir) => {
      // signature computed once per row via bindOnce; the cheap band
      // slicing then references the bound value.
      val simExpr = bindOnce(hashesExpr, "hs",
        """aggregate(sequence(0,59), 0L, (acc, b) -> acc +
          |  if(aggregate(hs, 0L, (c, x) ->
          |       c + if((shiftright(x, b) & 1) = 1, 1L, -1L)) > 0,
          |     shiftleft(1L, b), 0L))""".stripMargin)
      val sim = docsWithShingles(s, dir)
        .select(col("doc_id"), expr(simExpr).as("sim"))
        // barrier: keep the signature from being inlined (and thus
        // recomputed) into the band explode below
        .repartition(col("doc_id"))
      val banded = sim.select(col("doc_id"), col("sim"),
        posexplode(expr(
          "transform(sequence(0,9), b -> shiftright(sim, b*6) & 63)"))
          .as(Seq("band", "band_val")))
      val cands = banded.as("l").join(banded.as("r"),
          col("l.band") === col("r.band") &&
          col("l.band_val") === col("r.band_val") &&
          col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
          bit_count(col("l.sim").bitwiseXOR(col("r.sim"))).as("hamming"))
        .distinct()
      cands.filter(col("hamming") <= 6)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // n-gram Jaccard: word 3-grams, blocked on rare trigrams
    // (document frequency ≤ 10 — the classic rare-token inverted
    // index), exact trigram-Jaccard ≥ 0.7 on candidates.
    "d4_ngram_jaccard" -> ((s, dir) => {
      val tg = load(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .withColumn("w", split(col("text"), " "))
        .withColumn("shingles", expr(
          """array_distinct(transform(sequence(1, size(w)-2), i ->
            |  concat_ws(' ', element_at(w,i), element_at(w,i+1),
            |            element_at(w,i+2))))""".stripMargin))
        .select(col("doc_id"), col("shingles"))
      val inv = tg.select(col("doc_id"), explode(col("shingles")).as("t"))
      val rare = inv.groupBy(col("t")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= 10).select(col("t"))
      val rareInv = inv.join(broadcast(rare), "t")
      val cands = rareInv.as("l").join(rareInv.as("r"),
          col("l.t") === col("r.t") && col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
        .distinct()
      verifyJaccard(cands, tg, 0.7)
    })
  )

  /** DuckDB mirrors. d1/d2/d4 oracles are the *exact* definitions
    * (all-pairs at verification sf is cheap); d3 recomputes the same
    * integer simhash. */
  val oracle: Map[String, String] = Map(
    "d1_exact_dedup" ->
      """SELECT md5(text) AS content_hash, MIN(doc_id) AS keeper_id,
        |       COUNT(*) AS n_copies
        |FROM (SELECT doc_id, text FROM documents
        |      UNION ALL SELECT doc_id + 100000, text FROM documents) t
        |GROUP BY 1 ORDER BY keeper_id""".stripMargin,

    "d2_minhash_lsh" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct([substr(text, i, 8)
        |                   for i in range(1, length(text)-6)]) AS ss
        |  FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(len(list_intersect(a.ss, b.ss)) AS DOUBLE)
        |    / (len(a.ss) + len(b.ss) - len(list_intersect(a.ss, b.ss)))
        |    AS jacc
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.ss, b.ss)) AS DOUBLE)
        |    / (len(a.ss) + len(b.ss) - len(list_intersect(a.ss, b.ss))) >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin,

    "d3_simhash_hamming" ->
      """WITH d AS (SELECT doc_id, text FROM documents),
        |sh AS (SELECT doc_id,
        |         unnest(list_distinct([substr(text, i, 8)
        |           for i in range(1, length(text)-6)])) AS s FROM d),
        |h AS (SELECT doc_id, ('0x' || substr(md5(s),1,15))::BIGINT AS x
        |      FROM sh),
        |bits AS (SELECT doc_id, b,
        |           CASE WHEN SUM(CASE WHEN (x >> b) & 1 = 1
        |                              THEN 1 ELSE -1 END) > 0
        |                THEN 1::BIGINT << b ELSE 0::BIGINT END AS v
        |         FROM h CROSS JOIN (SELECT unnest(range(60)) AS b) t
        |         GROUP BY doc_id, b),
        |sim AS (SELECT doc_id, CAST(SUM(v) AS BIGINT) AS sim FROM bits
        |        GROUP BY 1)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       bit_count(xor(a.sim, b.sim)) AS hamming
        |FROM sim a JOIN sim b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sim, b.sim)) <= 6
        |ORDER BY doc_a, doc_b""".stripMargin,

    "d4_ngram_jaccard" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
        |           FROM documents),
        |tg AS (SELECT doc_id,
        |         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |                        for i in range(1, len(w)-1)]) AS ss
        |       FROM d)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(len(list_intersect(a.ss, b.ss)) AS DOUBLE)
        |    / (len(a.ss) + len(b.ss) - len(list_intersect(a.ss, b.ss)))
        |    AS jacc
        |FROM tg a JOIN tg b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.ss, b.ss)) AS DOUBLE)
        |    / (len(a.ss) + len(b.ss) - len(list_intersect(a.ss, b.ss))) >= 0.7
        |ORDER BY doc_a, doc_b""".stripMargin
  )
}
