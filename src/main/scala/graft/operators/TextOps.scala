package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.load

/** Text-analysis suite over `documents`: corpus stats, token counting,
  * a lang-ID n-gram/stopword heuristic, quality scoring, and document
  * fingerprinting. Generalizes the reference's string-derivation layer
  * (sanitizers do_common.py:238-329, SeqType classifier when-chains
  * Exam_info.py:293-344) to corpus-scale text features.
  *
  * Everything is a single projection (whole-stage codegen) or one hash
  * aggregate — no UDFs, no shuffles beyond the group key.
  */
object TextOps {

  /** The t8/t15 deterministic split bucket (0-99): md5 of the id's
    * decimal string, first 15 hex chars as a bigint — ONE definition so
    * the split scheme cannot drift between the per-doc split and the
    * leakage-safe cluster split. */
  private def splitBucket(idCol: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    graft.functions.Fns.md5Bucket(idCol.cast("string"), 100)

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map[String, (SparkSession, String) => DataFrame](
    // Gopher/C4-style repetition signals per document: duplicate
    // word-bigram fraction (near-1 = boilerplate loops) and top-word
    // coverage (near-1 = one token dominates). The bigram stats are
    // per-row array expressions inside codegen; the top-word count is
    // the one genuinely relational piece (explode → per-(doc,word)
    // count → per-doc max), shuffling (doc_id, word) counts only —
    // partial aggregation eats the fan-out map-side. Ratios are exact
    // small-int divisions, so both engines agree bitwise.
    "t10_repetition" -> ((s, dir) => {
      val docs = load(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 2)
      val bi = docs.select(col("doc_id"), size(col("w")).as("n_words"),
        expr("""transform(sequence(1, size(w)-1), i ->
                  concat_ws(' ', element_at(w,i), element_at(w,i+1)))""")
          .as("bigrams"))
        .select(col("doc_id"), col("n_words"),
          size(col("bigrams")).as("n_bi"),
          size(array_distinct(col("bigrams"))).as("n_bi_d"))
      val top = docs.select(col("doc_id"), explode(col("w")).as("word"))
        .groupBy(col("doc_id"), col("word"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id")).agg(max(col("c")).as("top_cnt"))
      bi.join(top, "doc_id")
        .select(col("doc_id"),
          ((col("n_bi") - col("n_bi_d")).cast("double") / col("n_bi"))
            .as("dup_bigram_frac"),
          (col("top_cnt").cast("double") / col("n_words"))
            .as("top_word_frac"))
        .withColumn("flagged",
          col("dup_bigram_frac") > 0.2 || col("top_word_frac") > 0.2)
        .orderBy(col("doc_id"))
    }),

    // PII masking: email/phone redaction with per-doc redaction counts
    // — pure row-level regex projections (whole-stage codegen, no
    // shuffle beyond the final sort). The corpus is synthetic words,
    // so PII is planted deterministically (every 10th doc an email,
    // every 7th a phone) to prove the masking actually fires; the
    // masked text leaves the query as an md5 so row width stays small.
    "t11_pii_mask" -> ((s, dir) => {
      val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val phone = "\\d{3}-\\d{3}-\\d{4}"
      load(s, dir, "documents")
        .select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 10 === 0,
              lit(" contact bob@example.com")).otherwise(lit("")),
            when(col("doc_id") % 7 === 0,
              lit(" call 555-123-4567")).otherwise(lit("")))
            .as("txt"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("txt"), lit(email), lit(0)))
            .as("n_emails"),
          size(regexp_extract_all(col("txt"), lit(phone), lit(0)))
            .as("n_phones"),
          md5(regexp_replace(regexp_replace(col("txt"), email, "<EMAIL>"),
            phone, "<PHONE>").cast("binary")).as("masked_hash"))
        .orderBy(col("doc_id"))
    }),

    // Corpus stats per language: counts + exact char sums + avg.
    "t1_lang_stats" -> ((s, dir) => {
      load(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          (sum(col("n_chars")).cast("double") / count(lit(1)))
            .as("avg_chars"))
        .orderBy(col("lang"))
    }),

    // Whitespace token count per document.
    "t2_token_count" -> ((s, dir) => {
      load(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).as("n_tokens"),
          col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // Lang-ID heuristic: stopword hits ('the'/'a' density) → predicted
    // class, compared against the labeled lang column.
    "t3_lang_id" -> ((s, dir) => {
      load(s, dir, "documents")
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_stop", expr(
          "size(filter(toks, t -> t = 'the' OR t = 'a'))"))
        .withColumn("pred_lang",
          when(col("n_stop") >= 3, lit("en")).otherwise(lit("other")))
        .select(col("doc_id"), col("n_stop"), col("pred_lang"), col("lang"),
          (col("pred_lang") === col("lang")).as("agree"))
        .orderBy(col("doc_id"))
    }),

    // Quality scoring: token stats + a when-chain bucket (the SeqType
    // classifier shape, Exam_info.py:293-344).
    "t4_quality_score" -> ((s, dir) => {
      load(s, dir, "documents")
        .withColumn("n_tokens", size(split(col("text"), " ")))
        .withColumn("body_chars",
          length(regexp_replace(col("text"), " ", "")))
        .withColumn("avg_tok_len",
          col("body_chars").cast("double") / col("n_tokens"))
        .withColumn("quality",
          when(col("avg_tok_len") >= 5, lit("hi"))
            .when(col("avg_tok_len") >= 4, lit("mid"))
            .otherwise(lit("lo")))
        .select(col("doc_id"), col("n_tokens"), col("body_chars"),
          col("avg_tok_len"), col("quality"))
        .orderBy(col("doc_id"))
    }),

    // Document fingerprint: md5 of the whitespace-normalized lowercase
    // text (the voxel-hash equality idea, do_dicom_compare_recup_to
    // .py:234-243, applied to text).
    "t5_fingerprint" -> ((s, dir) => {
      load(s, dir, "documents")
        .select(col("doc_id"),
          md5(lower(regexp_replace(col("text"), "\\s+", " "))
            .cast("binary")).as("fp"))
        .orderBy(col("doc_id"))
    }),

    // Sequence packing for training batches: documents accumulate into
    // fixed-token-budget batches per language (running-sum window →
    // batch id = which 2048-token block the doc's last token lands in).
    // Scale shape: the window partitions by lang (any shard key), so
    // each partition packs independently — no global sort, no driver
    // loop; at 100 TB the same plan packs per-shard in parallel.
    "t7_sequence_pack" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("doc_id"))
      load(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).as("tokens"))
        .withColumn("cum", sum(col("tokens")).over(w))
        .withColumn("batch_id", floor((col("cum") - 1) / 2048).cast("long"))
        .groupBy(col("lang"), col("batch_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tokens")).cast("long").as("tok_sum"))
        .orderBy(col("lang"), col("batch_id"))
    }),

    // Deterministic train/eval split: bucket = shared md5-60bit hash
    // of the doc id mod 100, split = train when bucket < 90. Hash-based
    // (not random) so the split is reproducible across runs, engines,
    // and cluster sizes — the property a training pipeline needs for
    // leakage-free held-out sets.
    "t8_hash_split" -> ((s, dir) => {
      load(s, dir, "documents")
        .withColumn("bucket", splitBucket(col("doc_id")))
        .withColumn("split",
          when(col("bucket") < 90, lit("train")).otherwise(lit("eval")))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("chars"))
        .orderBy(col("lang"), col("split"))
    }),

    // Leakage-safe split (beyond t8): exact-duplicate documents must
    // land in the SAME split, or eval leaks training text — the
    // classic contamination bug in per-doc hash splits. Cluster =
    // content hash; the split decision hashes the cluster's KEEPER id
    // (min doc_id), so every copy follows its keeper atomically. The
    // corpus unions shifted copies (the d1 fixture) so multi-doc
    // clusters really exist. Scale shape: one hash groupBy for the
    // keeper + an equi-join back on the hash — d1's shape exactly; no
    // window, no driver state; the split column is a pure projection.
    "t15_leakage_safe_split" -> ((s, dir) => {
      val d = load(s, dir, "documents").select(col("doc_id"), col("text"))
      val all = d.union(
          d.select((col("doc_id") + 100000000L).as("doc_id"), col("text")))
        .withColumn("h", md5(col("text")))
      // keeper election as a window min (t16's shape): one shuffle on
      // h, and the union+md5 subtree is referenced exactly once —
      // the groupBy+join form re-computed it per consumer
      val byHash = org.apache.spark.sql.expressions.Window
        .partitionBy(col("h"))
      all
        .withColumn("keeper_id", min(col("doc_id")).over(byHash))
        .withColumn("split", when(splitBucket(col("keeper_id")) < 90,
          lit("train")).otherwise(lit("eval")))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("h")).as("n_clusters"))
        .orderBy(col("split"))
    }),

    // Global vocabulary statistics: top-20 word trigrams by corpus
    // frequency (every occurrence counted). Explode → one partial+
    // final hash agg → top-k; deterministic tie-break on the ngram.
    "t9_top_ngrams" -> ((s, dir) => {
      load(s, dir, "documents")
        .withColumn("w", split(col("text"), " "))
        .filter(size(col("w")) >= 3)
        .select(explode(expr(
          """transform(sequence(1, size(w)-2), i ->
            |  concat_ws(' ', element_at(w,i), element_at(w,i+1),
            |            element_at(w,i+2)))""".stripMargin)).as("ngram"))
        .groupBy(col("ngram"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("ngram"))
        .limit(20)
    }),

    // Deterministic stratified sample: 20% of each language, selected
    // by md5-of-id order (not rand()) so the sample is identical across
    // runs, engines, and cluster sizes — and a rerun over a grown
    // corpus keeps previously-sampled docs only if they still win on
    // hash order, which is the reproducibility contract a training-mix
    // builder needs. One window per stratum (partition-local sort);
    // count-over-partition rides the same sort, so the whole query is a
    // single shuffle on lang.
    "t12_stratified_sample" -> ((s, dir) => {
      val byLang = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang"))
      val w = byLang.orderBy(col("pick"), col("doc_id"))
      load(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          md5(col("doc_id").cast("string")).as("pick"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n_lang", count(lit(1)).over(byLang))
        .filter(col("rn") <= ceil(col("n_lang") * 0.2))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    })
  ) ++ queriesExtra

  /** The t13 gate as an input-agnostic transformation: one stateless
    * projection (`doc_id`, `n_words`, `keep`, `reason`), so the SAME
    * function runs over a batch table or a `readStream` source with no
    * watermark or state — parity asserted in StreamingSpec.
    *
    * The gate is the hottest operator of a training-data pipeline, so
    * it runs as the native codegen'd
    * [[graft.functions.expressions.TextQualityGate]] expression: one
    * pass per row, exact HashSet bigram dedup, no interpreted
    * higher-order functions, and inherently pushdown-proof — a
    * `filter(keep)` inlines one linear expression, wherever the
    * optimizer moves it. [[qualityGateSql]] keeps the pure-SQL
    * let-binding form; TextQualitySpec asserts the two agree row for
    * row (and the DuckDB oracle checks the native form end-to-end). */
  def qualityGate(docs: DataFrame): DataFrame = {
    graft.GraftFunctions.register(docs.sparkSession)
    docs
      .withColumn("st", expr("text_quality_gate(text)"))
      .select(col("doc_id"), col("st.n_words").as("n_words"),
        col("st.keep").as("keep"),
        coalesce(col("st.reason"), lit("ok")).as("reason"))
  }

  /** t24's transformation: the Gopher document-level rules over any
    * frame with (`doc_id`, `text`). Stateless projection — see the
    * query comment for the rule provenance and scale shape. */
  def gopherRules(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), size(col("w")).as("n_words"),
        (expr("aggregate(w, 0L, (acc, x) -> acc + length(x))")
          .cast("double") / size(col("w"))).as("mean_word_len"),
        (expr("size(filter(w, x -> x rlike '[a-z]'))").cast("double")
          / size(col("w"))).as("alpha_frac"),
        expr("""size(array_distinct(filter(w, x ->
               x in ('the','a','of','to','and','that','with','for'))))""")
          .as("n_stop"))
      .withColumn("ok_words",
        col("n_words") >= 50 && col("n_words") <= 100000)
      .withColumn("ok_mean",
        col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0)
      .withColumn("ok_alpha", col("alpha_frac") > 0.8)
      .withColumn("ok_stop", col("n_stop") >= 2)
      .withColumn("keep",
        col("ok_words") && col("ok_mean") && col("ok_alpha") &&
          col("ok_stop"))

  /** t25's transformation: overlapping token-window chunks (window
    * `size` tokens, stride `stride`) over any frame with (`doc_id`,
    * `text`). A window start past the first is emitted only when more
    * than `size - stride` (the overlap) tokens remain, so no chunk
    * duplicates its predecessor's tail without adding content; every
    * token is still covered because the previous window spans
    * `stride + overlap` tokens past its own start (asserted in
    * ChunkGopherSpec). */
  def ragChunks(docs: DataFrame, size: Int = 32, stride: Int = 24)
      : DataFrame = {
    val overlap = size - stride
    docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"),
        posexplode(expr(
          s"""transform(filter(sequence(1, size(w), $stride), st ->
             |  st = 1 or size(w) - st >= $overlap),
             |  st -> named_struct(
             |    'start_tok', st,
             |    'n_tokens', size(slice(w, st, $size)),
             |    'chunk_hash', md5(array_join(slice(w, st, $size), ' '))))"""
            .stripMargin)))
      .select(col("doc_id"), col("pos").as("chunk_id"),
        col("col.start_tok").as("start_tok"),
        col("col.n_tokens").as("n_tokens"),
        col("col.chunk_hash").as("chunk_hash"))
  }

  /** The pure-SQL form of the gate (no custom expression — runs on a
    * stock Spark session). Expression SHAPE matters here, not just
    * semantics: the naive version derived `w`/`bi`/`dup_bi_frac` as
    * separate columns; when a downstream `filter(keep)` was pushed
    * through the projection, Catalyst substituted the WHOLE chain into
    * the predicate, and because the references sit inside CaseWhen
    * branches (lazily evaluated, excluded from codegen subexpression
    * elimination) the split/bigram work re-ran per reference —
    * `element_at(split(text), i)` per index made the predicate
    * O(words²): 12.1 s vs 0.8 s at sf0.1 (round-6 verdict). The fix is
    * a let-binding: `transform(array(x), w -> body)` evaluates `x`
    * once and binds it as a lambda VALUE, not a re-inlined expression,
    * no matter where the optimizer moves the predicate. */
  def qualityGateSql(docs: DataFrame): DataFrame =
    docs
      .withColumn("st", expr(
        """element_at(transform(array(split(text, ' ')), w ->
          |  element_at(transform(array(case when size(w) >= 2 then
          |        transform(sequence(1, size(w)-1), i ->
          |          concat_ws(' ', element_at(w,i), element_at(w,i+1)))
          |      else cast(array() as array<string>) end), bi ->
          |    named_struct(
          |      'n_words', size(w),
          |      'reason',
          |        case
          |          when size(w) < 10 or size(w) > 5000 then 'length'
          |          when size(filter(w, t -> t = 'the' OR t = 'a')) < 1
          |            then 'language'
          |          when size(bi) > 0 and
          |               cast(size(bi) - size(array_distinct(bi)) as double)
          |                 / cast(size(bi) as double) > 0.2
          |            then 'repetition'
          |        end)), 1)), 1)""".stripMargin))
      .select(col("doc_id"), col("st.n_words").as("n_words"),
        col("st.reason").isNull.as("keep"),
        coalesce(col("st.reason"), lit("ok")).as("reason"))

  /** t18's BM25 scored frame (doc_id, score) — every document holding
    * at least one query term, scored. Shared with the hybrid fusion
    * query (v7): the fused ranking must see the SAME scores the
    * lexical top-k returns. */
  private[operators] def bm25Scored(s: SparkSession, dir: String)
      : DataFrame = {
    val docs = load(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    val stats = docs.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(size(col("w"))).cast("double") / count(lit(1))).as("avgdl"))
    val toks = docs
      .select(col("doc_id"), size(col("w")).as("dl"),
        explode(col("w")).as("term"))
      .filter(col("term").isin("key", "table", "merge"))
    val tf = toks.groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfq = toks.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val sc = tf.join(broadcast(dfq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("s",
        ((col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))) *
        ((col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) *
            (lit(0.25) + lit(0.75) * (col("dl") / col("avgdl"))))))
    sc.groupBy(col("doc_id"))
      .agg(round(
        coalesce(sum(when(col("term") === "key", col("s"))), lit(0.0)) +
        coalesce(sum(when(col("term") === "table", col("s"))), lit(0.0)) +
        coalesce(sum(when(col("term") === "merge", col("s"))), lit(0.0)),
        6).as("score"))
  }

  private def queriesExtra: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Cross-corpus novelty: the fraction of a doc's DISTINCT trigrams
    // that appear nowhere else in the corpus (df == 1) — the
    // complementary signal to t10's intra-doc repetition, used for
    // boilerplate-vs-original curriculum weighting. One explode + one
    // partial+final df aggregate + a join back keyed on the trigram;
    // at 100 TB the join key becomes a 64-bit hash (as in d4) so the
    // shuffle carries 8-byte keys, not strings — the string key here
    // keeps the oracle engine-exact.
    "t14_novelty" -> ((s, dir) => {
      val tg = load(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 3)
        .select(col("doc_id"), explode(expr(
          """array_distinct(transform(sequence(1, size(w)-2), i ->
            |  concat_ws(' ', element_at(w,i), element_at(w,i+1),
            |            element_at(w,i+2))))""".stripMargin)).as("t"))
        .cache() // two consumers (df agg + join-back) — without the
                 // cache the trigram extraction executes twice
      val dfT = tg.groupBy(col("t")).agg(count(lit(1)).as("df"))
      tg.join(dfT, "t")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
        .withColumn("novelty", round(
          col("n_unique").cast("double") / col("n_grams").cast("double"), 6))
        .orderBy(col("doc_id"))
    }),

    // Composite quality filter — the C4/Gopher-style keep/drop gate a
    // corpus passes through before training, with the FIRST failing
    // rule as the drop reason: length window (10..5000 words), a
    // language signal (≥1 English stopword), repetition (dup-bigram
    // fraction ≤ 0.2, the t10 signal). One projection pass, no joins,
    // no shuffle until the final ORDER BY — at 100 TB this runs at
    // scan speed and the filter decision travels instead of the text.
    "t13_quality_filter" -> ((s, dir) =>
      qualityGate(load(s, dir, "documents")).orderBy(col("doc_id"))),

    // The text-side capstone — the data-prep run a training job
    // actually executes, in one plan: quality gate (t13's exact
    // conditions) → exact dedup among the survivors (content-hash
    // keeper election) → deterministic split (the shared t8/t15
    // bucket) → the per-(lang, split) training-mix report. Corpus =
    // documents ∪ shifted copies so the dedup stage really drops rows.
    // Scale shape: two hash aggregates + one equi-join; the gate and
    // split are pure projections; nothing all-pairs, nothing driver-
    // side — the same report runs unchanged over 100 TB.
    "t16_training_mix" -> ((s, dir) => {
      val d = load(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text"))
      val all = d.union(d.select((col("doc_id") + 100000000L).as("doc_id"),
        col("lang"), col("text")))
      val kept = qualityGate(all.select(col("doc_id"), col("text")))
        .filter(col("keep"))
        .select(col("doc_id"), col("n_words"))
      val hashed = all.withColumn("h", md5(col("text")))
        .select(col("doc_id"), col("lang"), col("h"))
      val survivors = hashed.join(kept, "doc_id")
      // keeper election as a window min, not groupBy+self-join: one
      // shuffle on h instead of two, and `survivors` (which embeds the
      // gate) is referenced exactly once in the plan
      val byHash = org.apache.spark.sql.expressions.Window
        .partitionBy(col("h"))
      survivors
        .withColumn("keeper_id", min(col("doc_id")).over(byHash))
        .filter(col("doc_id") === col("keeper_id"))
        .withColumn("split", when(splitBucket(col("doc_id")) < 90,
          lit("train")).otherwise(lit("eval")))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_words")).cast("long").as("tokens"))
        .orderBy(col("lang"), col("split"))
    }),

    // BPE-ish token counting (the second half of the token-counting
    // row, next to t2's whitespace count): a GPT-style pre-tokenizer
    // regex — letter runs, digit runs CAPPED AT 3 (the digit-chunking
    // trick modern BPE vocabularies use so long numbers split), symbol
    // runs — counted per doc and compared against the whitespace
    // count. Punctuation/number payloads are planted deterministically
    // (t11's pattern) so the two counts genuinely diverge. Pure
    // projection: regexp_extract_all inside codegen, no shuffle until
    // the final ORDER BY — token accounting at scan speed, the thing a
    // training-budget estimate runs over the whole corpus.
    "t17_bpe_tokens" -> ((s, dir) => {
      val pat = "[a-zA-Z]+|[0-9]{1,3}|[^a-zA-Z0-9 ]+"
      load(s, dir, "documents")
        .select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 5 === 0,
              lit(" order #A-12345 total 9990")).otherwise(lit("")),
            when(col("doc_id") % 3 === 0,
              lit(" (c) 2024, v2.1!")).otherwise(lit("")))
            .as("txt"))
        .select(col("doc_id"),
          size(split(col("txt"), " ")).as("n_ws_tokens"),
          size(regexp_extract_all(col("txt"), lit(pat), lit(0)))
            .as("n_bpe_tokens"))
        .withColumn("fertility",
          round(col("n_bpe_tokens").cast("double") /
            col("n_ws_tokens").cast("double"), 6))
        .orderBy(col("doc_id"))
    }),

    // BM25 top-k retrieval — the lexical-search complement of the
    // v-family's embedding ANN: score every document against a fixed
    // query term set with tf-saturated BM25 (k1 = 1.2, b = 0.75) and
    // return the top 20. The idf is the exact-rational variant
    // (N − df + ½)/(df + ½) — the exponentiated form of the
    // Robertson–Sparck-Jones log idf — so every arithmetic step is
    // +/−/×/÷ on doubles and both engines agree bitwise (ln is not
    // correctly-rounded and may differ across libm builds; sqrt is the
    // only transcendental the suite trusts). Per-term scores are summed
    // in a FIXED literal order via conditional aggregates: a plain
    // float SUM over shuffled rows would reassociate and flap bits.
    // Scale shape: the term filter prunes the exploded token stream at
    // the scan, the df/stats aggregates are term-cardinality tiny and
    // broadcast, and the per-doc score needs one (doc, term) hash
    // aggregate — at 100 TB this is one corpus scan plus
    // query-term-bounded state, the shape of a real retrieval probe.
    "t18_bm25" -> ((s, dir) =>
      bm25Scored(s, dir)
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)),

    // Temperature-resampled multilingual training mix — the
    // low-resource upweighting a multilingual run applies so the
    // dominant language does not swamp the rest: sampling weight ∝
    // (token count)^τ with τ = 0.5, i.e. sqrt — deliberately, because
    // IEEE sqrt is correctly rounded and bit-identical across engines
    // where pow/exp are not. The denominator folds the per-language
    // sqrt terms in a FIXED literal order over the corpus's language
    // codes (float addition must not depend on row order; an unknown
    // code would surface as weights not summing to 1, loudly). One
    // tiny per-language aggregate; the totals broadcast.
    "t19_temperature_mix" -> ((s, dir) => {
      val per = load(s, dir, "documents")
        .select(col("lang"), size(split(col("text"), " ")).as("n_words"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("n_tokens"))
      def term(l: String) = coalesce(
        sum(when(col("lang") === l, sqrt(col("n_tokens")))), lit(0.0))
      val tot = per.agg(sum(col("n_docs")).as("nn"),
        (term("de") + term("en") + term("es") + term("fr") + term("zh"))
          .as("denom"))
      per.crossJoin(broadcast(tot))
        .select(col("lang"), col("n_docs"), col("n_tokens"),
          round(col("n_docs").cast("double") / col("nn"), 6).as("p_raw"),
          round(sqrt(col("n_tokens")) / col("denom"), 6).as("w_sampled"))
        .orderBy(col("lang"))
    }),

    // DSIR-style domain-affinity scoring (Xie et al. 2023, "Data
    // Selection for Language Models via Importance Resampling"): score
    // every corpus document by how target-domain-like its token
    // distribution is. Tokens are HASHED into a fixed 4096-bucket
    // space first — the paper's hashed-n-gram device, and the thing
    // that makes this scale-safe: a 100 TB corpus has an unbounded
    // long-tail vocabulary, but the weight table is 4096 rows BY
    // CONSTRUCTION, so the broadcast can never outgrow the driver.
    // The per-bucket importance weight is the smoothed-probability
    // ratio p_target(b)/p_corpus(b) = ((ct+1)·(Nc+B)) / ((cc+1)·(Nt+B))
    // — kept as +/×/÷ on doubles (each IEEE op is correctly rounded,
    // so both engines agree bitwise; log-space DSIR would need ln,
    // which is not), and the per-doc sum goes through the DECIMAL path
    // so row order cannot reassociate it. Marker tokens are planted on
    // the target docs and on every 4th corpus doc so the score
    // genuinely separates. Scale shape: bucket aggregates collapse
    // map-side into ≤4096 partials per task; the only corpus-wide
    // shuffle is the per-doc hash aggregate — one scan plus
    // fixed-size state, the DSIR pass shape.
    "t20_domain_affinity" -> ((s, dir) => {
      val d = load(s, dir, "documents")
      // NO repartition spread here, deliberately (r17): the d7/d13
      // unsplittable-input fix was tried on both token passes and
      // REGRESSED t20 1.36 → 1.85 s — per-word md5 bucketing over
      // short tokens is ~0.3 s of single-core work, less than the two
      // exchanges the spread adds (the corpus is tokenized once per
      // DSIR pass, and both passes would pay the shuffle). d7's
      // 8-gram hashing is ~4× heavier per doc and won its exchange;
      // this one does not.
      val target = d.filter(col("source") === "src0")
        .select(concat(col("text"),
          lit(" quantum flux qubit quantum")).as("text"))
      val corpus = d.select(col("doc_id"),
        when(col("doc_id") % 4 === 0,
          concat(col("text"), lit(" quantum flux")))
          .otherwise(col("text")).as("text"))
      def buckets(df: DataFrame,
          cols: org.apache.spark.sql.Column*): DataFrame =
        df.select(cols :+ explode(split(col("text"), " ")).as("tok"): _*)
          .select(cols :+
            graft.functions.Fns.md5Bucket(col("tok"), 4096).as("b"): _*)
      val bT = buckets(target)
      val bC = buckets(corpus, col("doc_id"))
      // 4096 rows by construction; caching it collapses the tot and wt
      // branches into ONE corpus tokenization pass (the scoring join
      // below is the second, inherent DSIR pass)
      val wtable = bC.groupBy(col("b")).agg(count(lit(1)).as("cc"))
        .join(bT.groupBy(col("b")).agg(count(lit(1)).as("ct")),
          Seq("b"), "full_outer")
        .select(col("b"), coalesce(col("ct"), lit(0L)).as("ct"),
          coalesce(col("cc"), lit(0L)).as("cc"))
        .cache()
      val tot = wtable.agg(sum(col("ct")).as("nt"), sum(col("cc")).as("nc"))
      val nB = lit(4096L)
      val wt = wtable.crossJoin(broadcast(tot))
        .select(col("b"),
          (((col("ct") + lit(1L)).cast("double") *
            (col("nc") + nB).cast("double")) /
           ((col("cc") + lit(1L)).cast("double") *
            (col("nt") + nB).cast("double"))).as("wt"))
      bC.join(broadcast(wt), "b")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          graft.functions.Fns.decSum(col("wt")).as("aff_dec"))
        // round(double, 6) of the mean is NOT cross-engine safe: a mean
        // that lands exactly on a half boundary (sf0.1 doc 226:
        // 65.695916/88 = 0.7465445) rounds by shortest-repr in Spark
        // and by exact binary in DuckDB, and the engines disagree.
        // Instead: the DECIMAL(30,6) sum is the exact integer k·1e-6,
        // so half-up rounding of k/n is pure BIGINT arithmetic —
        // (2k+n) div 2n — identical everywhere by construction.
        .select(col("doc_id"), col("n_tokens"),
          col("aff_dec").cast("double").as("aff_sum"),
          (col("aff_dec") * 1000000).cast("long").as("k"))
        .withColumn("affinity",
          expr("(2*k + n_tokens) div (2*n_tokens)").cast("double")
            / lit(1e6))
        .drop("k")
        .orderBy(col("doc_id"))
    }),

    // Intra-document repetition REMOVAL — the transform complement of
    // t10's detection: treat each non-overlapping 10-word segment as a
    // paragraph (the suite's single-line stand-in, d10's convention),
    // keep only the FIRST occurrence of each distinct segment within
    // its document, and rebuild the cleaned text in original order
    // (the "remove duplicated paragraphs within a page" C4 step).
    // Every 4th doc is planted with its own leading segment prepended,
    // so the dedup genuinely drops text. Scale shape: the keep-first
    // window and the ordered rebuild both partition by doc_id — a
    // document's own segment count bounds every partition, nothing is
    // corpus-wide except the final ORDER BY.
    "t21_self_dedup" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
      val base = load(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w0"))
      val docs = base.select(col("doc_id"),
        when(col("doc_id") % 4 === 1,
          concat(slice(col("w0"), 1, 10), col("w0")))
          .otherwise(col("w0")).as("w"))
      val segs = docs.select(col("doc_id"),
          posexplode(expr(
            """transform(sequence(0, cast(floor((size(w)-1)/10) as int)),
              |  i -> concat_ws(' ', slice(w, i*10+1, 10)))""".stripMargin))
            .as(Seq("seg_no", "seg")))
        .cache() // feeds the keep-first window and the per-doc totals
      val byDocSeg = w.partitionBy(col("doc_id"), col("seg"))
        .orderBy(col("seg_no"))
      val rebuilt = segs
        .withColumn("rk", row_number().over(byDocSeg))
        .filter(col("rk") === 1)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_seg_kept"),
          md5(concat_ws(" ", expr(
            "transform(sort_array(collect_list(struct(seg_no, seg))), x -> x.seg)")))
            .as("clean_hash"))
      segs.groupBy(col("doc_id")).agg(count(lit(1)).as("n_seg"))
        .join(rebuilt, "doc_id")
        .select(col("doc_id"), col("n_seg"), col("n_seg_kept"),
          (col("n_seg") - col("n_seg_kept")).as("n_dropped"),
          col("clean_hash"))
        .orderBy(col("doc_id"))
    }),

    // Count-min sketch under the oracle gate: the sketch's
    // min-of-hashed-bucket-counts construction is fully relational
    // (depth 4 salted md5 buckets × width 64 — d·w = 256 counters),
    // so DuckDB replays it exactly and the compare pins BOTH the
    // estimates and the one-sided guarantee (overestimate =
    // cm_est − n_exact is provably ≥ 0; SketchSpec holds the
    // probabilistic error-bound tests, this holds the construction).
    // Scale shape: the counter table is 256 rows regardless of corpus
    // size (map-side partials collapse the 4× token fan-out per task)
    // and BROADCASTS to the probe side; exact counts are one hash
    // aggregate — the heavy-hitter pipeline a 100 TB frequency pass
    // runs, with the sketch as the bounded-state first stage.
    "t22_heavy_hitters" -> ((s, dir) => {
      import graft.functions.Fns.md5Bucket
      // ONE word-count aggregation feeds both the exact top-20 and
      // the sketch: per-cell CMS counts are additive, so summing
      // pre-aggregated word counts into (d, b) cells is algebraically
      // identical to incrementing per occurrence (the map-side-combine
      // form of sketch construction) — and the 4 md5 probes compute
      // per DISTINCT word, not per word occurrence (round 10: ~10×
      // fewer hashes; at 100 TB the hash work scales with vocabulary,
      // not corpus size)
      val counts = load(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n_exact"))
        .cache() // feeds the top-20 and the counter table
      val top = counts
        .orderBy(col("n_exact").desc, col("word")).limit(20)
      def bucket(d: org.apache.spark.sql.Column,
          word: org.apache.spark.sql.Column) =
        md5Bucket(concat_ws("#", d.cast("string"), word), 64)
      val cm = counts
        .select(col("word"), col("n_exact"),
          explode(sequence(lit(0), lit(3))).as("d"))
        .select(col("d"), bucket(col("d"), col("word")).as("b"),
          col("n_exact"))
        .groupBy(col("d"), col("b")).agg(sum(col("n_exact")).as("c"))
      top
        .select(col("word"), col("n_exact"),
          explode(sequence(lit(0), lit(3))).as("d"))
        .withColumn("b", bucket(col("d"), col("word")))
        .join(broadcast(cm), Seq("d", "b"))
        .groupBy(col("word"), col("n_exact"))
        .agg(min(col("c")).as("cm_est"))
        .withColumn("overestimate", col("cm_est") - col("n_exact"))
        .orderBy(col("n_exact").desc, col("word"))
    }),

    // t24 — the Gopher document-level quality rules (Rae et al. 2021,
    // App. A1.1) as an explicit per-rule breakdown, complementing the
    // t13 composite gate: word-count window [50, 100k], mean word
    // length in [3, 10], ≥80% of words containing an alphabetic
    // character, and ≥2 distinct required stopwords. (The paper's
    // line-level rules — ellipsis/bullet line fractions — need line
    // breaks the synthetic corpus doesn't have, so they are omitted
    // rather than trivially true.) One stateless projection over the
    // split array — array `filter`/`aggregate` lambdas, no explode, no
    // shuffle until the final ORDER BY: at 100 TB this is scan-speed
    // and the per-rule booleans travel instead of the text. All
    // fractions are single int/int IEEE divisions, so both engines
    // agree bitwise.
    "t24_gopher_rules" -> ((s, dir) =>
      gopherRules(load(s, dir, "documents")).orderBy(col("doc_id"))),

    // t25 — RAG-style overlapping chunking: fixed token windows
    // (32 tokens, stride 24 → 8-token overlap) per document, the shape
    // a retrieval index ingests. Window starts come from a per-row
    // `sequence(1, n, stride)` and each chunk is a `slice` of the
    // already-split array — one posexplode fans out to chunk rows, so
    // the only shuffle is the final ORDER BY; per-chunk text leaves
    // the plan as an md5, not the string (at 100 TB the hash travels,
    // the text stays in the scan). Chunks shorter than half the window
    // are merged into their predecessor by construction: a start is
    // emitted only if more than `overlap` tokens remain.
    "t25_rag_chunks" -> ((s, dir) =>
      ragChunks(load(s, dir, "documents"))
        .orderBy(col("doc_id"), col("chunk_id"))),

    // t23 — perplexity-PROXY scoring without a language model (the
    // CCNet-style LM-filter slot): per-token surprisal is the integer
    // 40 − floor(log2 corpus_freq) — rare tokens score high, stopwords
    // low — and a document's score is the mean over its tokens.
    // floor(log2 n) = length(bin(n)) − 1 keeps the whole query in
    // exact integer arithmetic (a real LM emits ln-probabilities, and
    // ln is not correctly rounded cross-engine; the binary magnitude
    // IS the deterministic stand-in for −log p). Scale shape: one
    // corpus-wide token groupBy builds the frequency table, then the
    // token stream joins it on tok — the same df-join shape as t14,
    // hot tokens handled by AQE skew split; the mean is the exact
    // half-up BIGINT division t20 uses.
    "t23_surprisal" -> ((s, dir) => {
      val toks = load(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      val surp = freq.select(col("tok"),
        (lit(40L) - (length(bin(col("n"))) - lit(1))).as("surp"))
      toks.join(surp, "tok")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("surp")).as("sum_surp"))
        .withColumn("mean_surp",
          expr("(2*sum_surp*1000000 + n_tokens) div (2*n_tokens)")
            .cast("double") / lit(1e6))
        .orderBy(col("doc_id"))
    }),

    // Epoch-seeded corpus shuffle + shard plan — the dataloader stage
    // after all curation: each epoch permutes the corpus with a
    // DIFFERENT deterministic order (seed folded into the hash, so
    // epoch 0 and epoch 1 disagree but every re-run agrees), and each
    // doc lands in one of 8 shards with a position within its shard.
    // This is how a distributed training job consumes the lake: shard
    // = which worker reads the doc, pos = in what order — computed as
    // a PLAN, not by materializing a shuffled copy of the corpus. One
    // window per (epoch, shard): at 100 TB the sort is per-shard
    // (corpus/8 per partition), nothing global; tie-break on doc_id
    // keeps the order total even under a hash collision.
    "t26_epoch_shuffle" -> ((s, dir) => {
      import graft.functions.Fns.md5Bucket
      val seeded = load(s, dir, "documents")
        .select(col("doc_id"))
        .crossJoin(s.range(0, 2).select(col("id").cast("int").as("epoch")))
        .withColumn("hkey",
          md5(concat_ws("#", col("epoch"), col("doc_id"))))
        .withColumn("shard",
          md5Bucket(concat_ws("#", col("epoch"), col("doc_id")), 8)
            .cast("int"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("epoch"), col("shard"))
        .orderBy(col("hkey"), col("doc_id"))
      seeded.withColumn("pos", row_number().over(w))
        .select(col("epoch"), col("doc_id"), col("shard"), col("pos"))
        .orderBy(col("epoch"), col("shard"), col("pos"))
    }),

    // Sanitizer chain applied to a deliberately dirty composite string
    // (alpha_num_str, do_common.py:238-287) — accents folded, slashes
    // and non-word chars to '_', runs collapsed, edges trimmed.
    "t6_sanitize" -> ((s, dir) => {
      import graft.functions.Sanitizers.alphaNumStr
      load(s, dir, "documents")
        .withColumn("dirty",
          concat(substring(col("text"), 1, 30), lit(" Pâtient/Nr° "),
            col("source")))
        .select(col("doc_id"), alphaNumStr(col("dirty")).as("clean"))
        .orderBy(col("doc_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    "t26_epoch_shuffle" ->
      """WITH seeded AS (
        |  SELECT e.epoch, d.doc_id,
        |    md5(e.epoch || '#' || d.doc_id) AS hkey,
        |    CAST(('0x' || substr(md5(e.epoch || '#' || d.doc_id),1,15))
        |      ::BIGINT % 8 AS INT) AS shard
        |  FROM documents d
        |  CROSS JOIN (SELECT CAST(unnest(range(2)) AS INT) AS epoch) e)
        |SELECT epoch, doc_id, shard,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY epoch, shard
        |    ORDER BY hkey, doc_id) AS INT) AS pos
        |FROM seeded
        |ORDER BY epoch, shard, pos""".stripMargin,

    // every fraction is one int/int IEEE division in both engines
    "t24_gopher_rules" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
        |           FROM documents),
        |s AS (SELECT doc_id, len(w) AS n_words,
        |        CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE)
        |          / len(w) AS mean_word_len,
        |        CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
        |          AS DOUBLE) / len(w) AS alpha_frac,
        |        len(list_distinct(list_filter(w, x -> x IN
        |          ('the','a','of','to','and','that','with','for'))))
        |          AS n_stop
        |      FROM d)
        |SELECT doc_id, n_words, mean_word_len, alpha_frac, n_stop,
        |  (n_words >= 50 AND n_words <= 100000) AS ok_words,
        |  (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS ok_mean,
        |  alpha_frac > 0.8 AS ok_alpha,
        |  n_stop >= 2 AS ok_stop,
        |  ((n_words >= 50 AND n_words <= 100000)
        |   AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
        |   AND alpha_frac > 0.8 AND n_stop >= 2) AS keep
        |FROM s ORDER BY doc_id""".stripMargin,

    "t25_rag_chunks" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
        |           FROM documents),
        |st AS (SELECT doc_id, w,
        |         unnest(list_filter(range(1, len(w) + 1, 24),
        |                            st -> st = 1 OR len(w) - st >= 8))
        |           AS start_tok
        |       FROM d),
        |c AS (SELECT doc_id, start_tok,
        |        list_slice(w, start_tok,
        |                   least(start_tok + 31, len(w))) AS chunk
        |      FROM st)
        |SELECT doc_id,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY start_tok) - 1
        |    AS chunk_id,
        |  start_tok, len(chunk) AS n_tokens,
        |  md5(array_to_string(chunk, ' ')) AS chunk_hash
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    // both engines' bin() render integers unpadded, so
    // length(bin(n))−1 is floor(log2 n) in each
    "t23_surprisal" ->
      """WITH toks AS (SELECT doc_id,
        |                unnest(string_split(text, ' ')) AS tok
        |              FROM documents),
        |freq AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok),
        |s AS (SELECT tok, 40 - (length(bin(n)) - 1) AS surp
        |      FROM freq),
        |d AS (SELECT doc_id, COUNT(*) AS n_tokens,
        |        CAST(SUM(surp) AS BIGINT) AS sum_surp
        |      FROM toks JOIN s USING (tok) GROUP BY doc_id)
        |SELECT doc_id, n_tokens, sum_surp,
        |  CAST((2*sum_surp*1000000 + n_tokens) // (2*n_tokens)
        |       AS DOUBLE) / CAST(1000000 AS DOUBLE) AS mean_surp
        |FROM d ORDER BY doc_id""".stripMargin,

    // DuckDB regexp_replace is first-match-only without the 'g' flag;
    // Spark's is global by default.
    "t11_pii_mask" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    text ||
        |    CASE WHEN doc_id % 10 = 0
        |         THEN ' contact bob@example.com' ELSE '' END ||
        |    CASE WHEN doc_id % 7 = 0
        |         THEN ' call 555-123-4567' ELSE '' END AS txt
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(txt,
        |      '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(txt, '\d{3}-\d{3}-\d{4}')) AS n_phones,
        |  md5(regexp_replace(
        |        regexp_replace(txt,
        |          '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |        '\d{3}-\d{3}-\d{4}', '<PHONE>', 'g')) AS masked_hash
        |FROM t ORDER BY doc_id""".stripMargin,

    "t17_bpe_tokens" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    text ||
        |    CASE WHEN doc_id % 5 = 0
        |         THEN ' order #A-12345 total 9990' ELSE '' END ||
        |    CASE WHEN doc_id % 3 = 0
        |         THEN ' (c) 2024, v2.1!' ELSE '' END AS txt
        |  FROM documents)
        |SELECT doc_id,
        |  len(string_split(txt, ' ')) AS n_ws_tokens,
        |  len(regexp_extract_all(txt, '[a-zA-Z]+|[0-9]{1,3}|[^a-zA-Z0-9 ]+'))
        |    AS n_bpe_tokens,
        |  round(CAST(len(regexp_extract_all(txt,
        |      '[a-zA-Z]+|[0-9]{1,3}|[^a-zA-Z0-9 ]+')) AS DOUBLE)
        |    / len(string_split(txt, ' ')), 6) AS fertility
        |FROM t ORDER BY doc_id""".stripMargin,

    "t18_bm25" ->
      """WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w
        |              FROM documents),
        |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
        |                 CAST(SUM(len(w)) AS DOUBLE) / COUNT(*) AS avgdl
        |          FROM docs),
        |toks AS (SELECT doc_id, len(w) AS dl, unnest(w) AS term
        |         FROM docs),
        |qt AS (SELECT doc_id, dl, term FROM toks
        |       WHERE term IN ('key', 'table', 'merge')),
        |tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf
        |       FROM qt GROUP BY 1, 2, 3),
        |dfq AS (SELECT term, COUNT(DISTINCT doc_id) AS df
        |        FROM qt GROUP BY 1),
        |sc AS (SELECT doc_id, term,
        |         ((n_docs - df + 0.5) / (df + 0.5)) *
        |         ((tf * 2.2) /
        |           (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))) AS s
        |       FROM tf JOIN dfq USING (term) CROSS JOIN stats)
        |SELECT doc_id,
        |  ROUND(COALESCE(SUM(CASE WHEN term = 'key' THEN s END), 0)
        |      + COALESCE(SUM(CASE WHEN term = 'table' THEN s END), 0)
        |      + COALESCE(SUM(CASE WHEN term = 'merge' THEN s END), 0), 6)
        |    AS score
        |FROM sc GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    "t19_temperature_mix" ->
      """WITH per AS (
        |  SELECT lang, COUNT(*) AS n_docs,
        |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
        |           AS n_tokens
        |  FROM documents GROUP BY 1),
        |tot AS (
        |  SELECT CAST(SUM(n_docs) AS BIGINT) AS nn,
        |    COALESCE(SUM(CASE WHEN lang = 'de' THEN sqrt(n_tokens) END), 0)
        |    + COALESCE(SUM(CASE WHEN lang = 'en' THEN sqrt(n_tokens) END), 0)
        |    + COALESCE(SUM(CASE WHEN lang = 'es' THEN sqrt(n_tokens) END), 0)
        |    + COALESCE(SUM(CASE WHEN lang = 'fr' THEN sqrt(n_tokens) END), 0)
        |    + COALESCE(SUM(CASE WHEN lang = 'zh' THEN sqrt(n_tokens) END), 0)
        |      AS denom
        |  FROM per)
        |SELECT lang, n_docs, n_tokens,
        |  ROUND(CAST(n_docs AS DOUBLE) / nn, 6) AS p_raw,
        |  ROUND(sqrt(n_tokens) / denom, 6) AS w_sampled
        |FROM per CROSS JOIN tot ORDER BY lang""".stripMargin,

    "t20_domain_affinity" ->
      """WITH target AS (
        |  SELECT text || ' quantum flux qubit quantum' AS text
        |  FROM documents WHERE source = 'src0'),
        |corpus AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 4 = 0 THEN text || ' quantum flux'
        |              ELSE text END AS text
        |  FROM documents),
        |b_t AS (SELECT ('0x' || substr(md5(tok), 1, 15))::BIGINT % 4096
        |          AS b
        |        FROM (SELECT unnest(string_split(text, ' ')) AS tok
        |              FROM target)),
        |b_c AS (SELECT doc_id,
        |          ('0x' || substr(md5(tok), 1, 15))::BIGINT % 4096 AS b
        |        FROM (SELECT doc_id,
        |                unnest(string_split(text, ' ')) AS tok
        |              FROM corpus)),
        |ct_t AS (SELECT b, COUNT(*) AS ct FROM b_t GROUP BY 1),
        |ct_c AS (SELECT b, COUNT(*) AS cc FROM b_c GROUP BY 1),
        |wtable AS (SELECT COALESCE(c.b, t.b) AS b,
        |                  COALESCE(t.ct, 0) AS ct,
        |                  COALESCE(c.cc, 0) AS cc
        |           FROM ct_c c FULL OUTER JOIN ct_t t ON c.b = t.b),
        |tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS nt,
        |               CAST(SUM(cc) AS BIGINT) AS nc FROM wtable),
        |wt AS (SELECT b,
        |         (CAST(ct + 1 AS DOUBLE) * CAST(nc + 4096 AS DOUBLE)) /
        |         (CAST(cc + 1 AS DOUBLE) * CAST(nt + 4096 AS DOUBLE))
        |           AS wt
        |       FROM wtable CROSS JOIN tot)
        |SELECT doc_id, COUNT(*) AS n_tokens,
        |  CAST(SUM(CAST(wt AS DECIMAL(30,6))) AS DOUBLE) AS aff_sum,
        |  CAST((2 * CAST(SUM(CAST(wt AS DECIMAL(30,6))) * 1000000
        |              AS BIGINT) + COUNT(*)) // (2 * COUNT(*))
        |       AS DOUBLE) / CAST(1000000 AS DOUBLE) AS affinity
        |FROM b_c JOIN wt USING (b)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "t22_heavy_hitters" ->
      """WITH words AS (SELECT unnest(string_split(text, ' ')) AS word
        |               FROM documents),
        |top AS (SELECT word, COUNT(*) AS n_exact FROM words
        |        GROUP BY 1 ORDER BY n_exact DESC, word LIMIT 20),
        |expanded AS (SELECT word, unnest(range(0, 4)) AS d FROM words),
        |cm AS (SELECT d,
        |         ('0x' || substr(md5(CAST(d AS VARCHAR) || '#' || word),
        |                         1, 15))::BIGINT % 64 AS b,
        |         COUNT(*) AS c
        |       FROM expanded GROUP BY 1, 2),
        |probes AS (
        |  SELECT word, n_exact, d,
        |    ('0x' || substr(md5(CAST(d AS VARCHAR) || '#' || word),
        |                    1, 15))::BIGINT % 64 AS b
        |  FROM top CROSS JOIN (SELECT unnest(range(0, 4)) AS d) t)
        |SELECT p.word, p.n_exact, CAST(MIN(cm.c) AS BIGINT) AS cm_est,
        |       CAST(MIN(cm.c) AS BIGINT) - p.n_exact AS overestimate
        |FROM probes p JOIN cm USING (d, b)
        |GROUP BY 1, 2
        |ORDER BY p.n_exact DESC, p.word""".stripMargin,

    "t21_self_dedup" ->
      """WITH base AS (SELECT doc_id, string_split(text, ' ') AS w0
        |              FROM documents),
        |docs AS (SELECT doc_id,
        |           CASE WHEN doc_id % 4 = 1 THEN w0[1:10] || w0
        |                ELSE w0 END AS w
        |         FROM base),
        |segs AS (
        |  SELECT doc_id, i AS seg_no,
        |         array_to_string(w[i*10+1 : i*10+10], ' ') AS seg
        |  FROM docs
        |  CROSS JOIN (SELECT unnest(range(0,
        |    (SELECT MAX(len(w)) // 10 + 1 FROM docs))) AS i) t
        |  WHERE i*10 < len(w)),
        |kept AS (SELECT doc_id, seg_no, seg,
        |                ROW_NUMBER() OVER (PARTITION BY doc_id, seg
        |                                   ORDER BY seg_no) AS rk
        |         FROM segs),
        |reb AS (SELECT doc_id, COUNT(*) AS n_seg_kept,
        |               md5(string_agg(seg, ' ' ORDER BY seg_no))
        |                 AS clean_hash
        |        FROM kept WHERE rk = 1 GROUP BY doc_id),
        |ns AS (SELECT doc_id, COUNT(*) AS n_seg FROM segs
        |       GROUP BY doc_id)
        |SELECT ns.doc_id, ns.n_seg, reb.n_seg_kept,
        |       ns.n_seg - reb.n_seg_kept AS n_dropped, reb.clean_hash
        |FROM ns JOIN reb USING (doc_id) ORDER BY ns.doc_id""".stripMargin,

    "t10_repetition" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
        |           FROM documents WHERE len(string_split(text,' ')) >= 2),
        |bi AS (SELECT doc_id, len(w) AS n_words,
        |         len([w[i] || ' ' || w[i+1] for i in range(1, len(w))])
        |           AS n_bi,
        |         len(list_distinct(
        |           [w[i] || ' ' || w[i+1] for i in range(1, len(w))]))
        |           AS n_bi_d
        |       FROM w),
        |top AS (SELECT doc_id, MAX(c) AS top_cnt FROM (
        |          SELECT doc_id, COUNT(*) AS c
        |          FROM (SELECT doc_id, unnest(w) AS word FROM w)
        |          GROUP BY doc_id, word)
        |        GROUP BY 1)
        |SELECT bi.doc_id,
        |  CAST(n_bi - n_bi_d AS DOUBLE) / n_bi AS dup_bigram_frac,
        |  CAST(top_cnt AS DOUBLE) / n_words AS top_word_frac,
        |  (CAST(n_bi - n_bi_d AS DOUBLE) / n_bi > 0.2
        |   OR CAST(top_cnt AS DOUBLE) / n_words > 0.2) AS flagged
        |FROM bi JOIN top ON bi.doc_id = top.doc_id
        |ORDER BY bi.doc_id""".stripMargin,

    "t14_novelty" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
        |           FROM documents),
        |tg AS (SELECT doc_id,
        |         unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |                               for i in range(1, len(w)-1)])) AS t
        |       FROM d WHERE len(w) >= 3),
        |dft AS (SELECT t, COUNT(*) AS df FROM tg GROUP BY 1)
        |SELECT doc_id, COUNT(*) AS n_grams,
        |  CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_unique,
        |  round(CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |        / COUNT(*), 6) AS novelty
        |FROM tg JOIN dft USING (t)
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "t13_quality_filter" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
        |           FROM documents),
        |f AS (SELECT doc_id, len(w) AS n_words,
        |        len([t for t in w if t = 'the' OR t = 'a']) AS n_stop,
        |        CASE WHEN len(w) >= 2 THEN
        |          [w[i] || ' ' || w[i+1] for i in range(1, len(w))]
        |        ELSE [] END AS bi
        |      FROM d),
        |r AS (SELECT doc_id, n_words,
        |        CASE
        |          WHEN n_words < 10 OR n_words > 5000 THEN 'length'
        |          WHEN n_stop < 1 THEN 'language'
        |          WHEN len(bi) > 0 AND
        |               CAST(len(bi) - len(list_distinct(bi)) AS DOUBLE)
        |                 / len(bi) > 0.2 THEN 'repetition'
        |        END AS reason
        |      FROM f)
        |SELECT doc_id, n_words, reason IS NULL AS keep,
        |       COALESCE(reason, 'ok') AS reason
        |FROM r ORDER BY doc_id""".stripMargin,

    "t16_training_mix" ->
      """WITH allw AS (SELECT doc_id, lang, text FROM documents
        |              UNION ALL
        |              SELECT doc_id + 100000000, lang, text FROM documents),
        |dw AS (SELECT doc_id, string_split(text, ' ') AS w FROM allw),
        |f AS (SELECT doc_id, len(w) AS n_words,
        |        len([t for t in w if t = 'the' OR t = 'a']) AS n_stop,
        |        CASE WHEN len(w) >= 2 THEN
        |          [w[i] || ' ' || w[i+1] for i in range(1, len(w))]
        |        ELSE [] END AS bi
        |      FROM dw),
        |r AS (SELECT doc_id, n_words,
        |        CASE
        |          WHEN n_words < 10 OR n_words > 5000 THEN 'length'
        |          WHEN n_stop < 1 THEN 'language'
        |          WHEN len(bi) > 0 AND
        |               CAST(len(bi) - len(list_distinct(bi)) AS DOUBLE)
        |                 / len(bi) > 0.2 THEN 'repetition'
        |        END AS reason
        |      FROM f),
        |kept AS (SELECT doc_id, n_words FROM r WHERE reason IS NULL),
        |hashed AS (SELECT a.doc_id, a.lang, md5(a.text) AS h FROM allw a),
        |surv AS (SELECT hashed.doc_id, hashed.lang, hashed.h,
        |           kept.n_words
        |         FROM hashed JOIN kept USING (doc_id)),
        |kp AS (SELECT h, MIN(doc_id) AS keeper_id FROM surv GROUP BY h),
        |uniq AS (SELECT s.lang, s.doc_id, s.n_words
        |         FROM surv s JOIN kp
        |           ON kp.h = s.h AND s.doc_id = kp.keeper_id),
        |sp AS (SELECT lang,
        |         CASE WHEN ('0x' ||
        |               substr(md5(CAST(doc_id AS VARCHAR)),1,15))
        |               ::BIGINT % 100 < 90
        |              THEN 'train' ELSE 'eval' END AS split,
        |         n_words
        |       FROM uniq)
        |SELECT lang, split, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n_words) AS BIGINT) AS tokens
        |FROM sp GROUP BY 1, 2 ORDER BY lang, split""".stripMargin,

    "t12_stratified_sample" ->
      """WITH r AS (SELECT doc_id, lang,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY lang) AS n_lang
        |  FROM documents)
        |SELECT doc_id, lang FROM r
        |WHERE rn <= CEIL(n_lang * 0.2)
        |ORDER BY doc_id""".stripMargin,

    "t1_lang_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |       CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE) / COUNT(*)
        |         AS avg_chars
        |FROM documents GROUP BY 1 ORDER BY lang""".stripMargin,

    "t2_token_count" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS n_tokens, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t3_lang_id" ->
      """SELECT doc_id,
        |  len([t for t in string_split(text, ' ')
        |       if t = 'the' OR t = 'a']) AS n_stop,
        |  CASE WHEN len([t for t in string_split(text, ' ')
        |                 if t = 'the' OR t = 'a']) >= 3
        |       THEN 'en' ELSE 'other' END AS pred_lang,
        |  lang,
        |  (CASE WHEN len([t for t in string_split(text, ' ')
        |                  if t = 'the' OR t = 'a']) >= 3
        |        THEN 'en' ELSE 'other' END) = lang AS agree
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t4_quality_score" ->
      """SELECT doc_id, n_tokens, body_chars,
        |       CAST(body_chars AS DOUBLE) / n_tokens AS avg_tok_len,
        |       CASE WHEN CAST(body_chars AS DOUBLE) / n_tokens >= 5 THEN 'hi'
        |            WHEN CAST(body_chars AS DOUBLE) / n_tokens >= 4 THEN 'mid'
        |            ELSE 'lo' END AS quality
        |FROM (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
        |             length(replace(text, ' ', '')) AS body_chars
        |      FROM documents) t
        |ORDER BY doc_id""".stripMargin,

    "t5_fingerprint" ->
      """SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g')))
        |         AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t7_sequence_pack" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, len(string_split(text, ' ')) AS tokens
        |  FROM documents),
        |packed AS (
        |  SELECT lang, tokens,
        |    (CAST(SUM(tokens) OVER (PARTITION BY lang ORDER BY doc_id)
        |          AS BIGINT) - 1) // 2048 AS batch_id
        |  FROM toks)
        |SELECT lang, batch_id, COUNT(*) AS n_docs,
        |       CAST(SUM(tokens) AS BIGINT) AS tok_sum
        |FROM packed GROUP BY 1, 2 ORDER BY lang, batch_id""".stripMargin,

    "t8_hash_split" ->
      """WITH b AS (
        |  SELECT lang, n_chars,
        |    CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,15))
        |              ::BIGINT % 100 < 90
        |         THEN 'train' ELSE 'eval' END AS split
        |  FROM documents)
        |SELECT lang, split, COUNT(*) AS n_docs,
        |       CAST(SUM(n_chars) AS BIGINT) AS chars
        |FROM b GROUP BY 1, 2 ORDER BY lang, split""".stripMargin,

    "t15_leakage_safe_split" ->
      """WITH allw AS (SELECT doc_id, text FROM documents
        |              UNION ALL
        |              SELECT doc_id + 100000000, text FROM documents),
        |h AS (SELECT doc_id, md5(text) AS h FROM allw),
        |k AS (SELECT h, MIN(doc_id) AS keeper_id FROM h GROUP BY h),
        |s AS (SELECT h.h,
        |        CASE WHEN ('0x' ||
        |              substr(md5(CAST(k.keeper_id AS VARCHAR)),1,15))
        |              ::BIGINT % 100 < 90
        |             THEN 'train' ELSE 'eval' END AS split
        |      FROM h JOIN k USING (h))
        |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(COUNT(DISTINCT h) AS BIGINT) AS n_clusters
        |FROM s GROUP BY 1 ORDER BY split""".stripMargin,

    "t9_top_ngrams" ->
      """WITH g AS (
        |  SELECT unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |                 for i in range(1, len(w)-1)]) AS ngram
        |  FROM (SELECT string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 3)
        |SELECT ngram, COUNT(*) AS n FROM g
        |GROUP BY 1 ORDER BY n DESC, ngram LIMIT 20""".stripMargin,

    "t6_sanitize" ->
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(
        |      translate(substr(text,1,30) || ' Pâtient/Nr° ' || source,
        |                'éèêëàâäôöîïûüùçµ', 'eeeeaaaooiiuuucm'),
        |      '/', '_', 'g'),
        |    '[^\x00-\x7F]', '', 'g'),
        |    '[^A-Za-z0-9_]', '_', 'g'),
        |    '_+', '_', 'g'),
        |    '^_|_$', '', 'g') AS clean
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
