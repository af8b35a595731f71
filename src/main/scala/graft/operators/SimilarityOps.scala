package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.load

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (64-dim float vectors).
  *
  * v1 is the exact baseline: brute-force cosine top-k for a query set,
  * computed with higher-order expressions (zip_with dot product, strict
  * left-fold accumulation so the float result is deterministic).
  * v2 is the scale path: sign-bucket LSH (axis hyperplanes on the first
  * 4 dims → 16 buckets); candidates are co-bucketed only, so the join
  * shuffles on the bucket key instead of building a cross product.
  *
  * Determinism: similarities are computed in double and rounded to 6
  * decimals before ranking, with vec_id as tiebreak — engine-level
  * float-accumulation differences (≪1e-9) cannot reorder ranks.
  */
object SimilarityOps {

  private def withV(df: DataFrame): DataFrame =
    df.withColumn("v", expr("transform(embedding, x -> cast(x as double))"))

  /** Sign-bucket key: sign bits of dims 1-4 (shared by v2 and d5 — the
    * oracles encode the same definition). */
  private val signBucketExpr =
    """(if(element_at(embedding,1) > 0F, 8, 0) +
      | if(element_at(embedding,2) > 0F, 4, 0) +
      | if(element_at(embedding,3) > 0F, 2, 0) +
      | if(element_at(embedding,4) > 0F, 1, 0))""".stripMargin

  /** Native codegen'd cosine (graft.functions.expressions.CosineSim) —
    * bit-identical to the HOF form, one fused primitive loop. */
  private val simExpr = "round(cosine_sim(va, vb), 6)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force cosine top-5 for query vectors vec_id < 20. The query
    // side is broadcast; the corpus side streams — at 100 TB this is the
    // "small query batch vs big corpus" shape.
    "v1_ann_bruteforce" -> ((s, dir) => {
      graft.GraftFunctions.register(s)
      val e = withV(load(s, dir, "embeddings"))
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("v").as("va"))
      val c = e.select(col("vec_id").as("n_id"), col("v").as("vb"))
      val scored = c.join(broadcast(q), col("q_id") =!= col("n_id"))
        .withColumn("r", expr(simExpr))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("r").desc, col("n_id"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("q_id"), col("rk"), col("n_id"), col("r"))
        .orderBy(col("q_id"), col("rk"))
    }),

    // Embedding-cosine near-duplicate detection: the corpus unioned
    // with re-keyed scaled copies (x*1.01 — same direction, so each
    // copy is an exact near-dup of its source and lands in the same
    // sign bucket by construction); candidates from the bucket join,
    // verified by round(cosine,6) ≥ 0.999. The raw corpus has no
    // near-dup pairs (max cosine < 0.6), so the 500 copy-pairs are
    // exactly the answer.
    "d5_embedding_neardup" -> ((s, dir) => {
      graft.GraftFunctions.register(s)
      val base = load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val scaled = base.select((col("vec_id") + 100000).as("vec_id"),
        expr("transform(embedding, x -> x * cast(1.01 as float))")
          .as("embedding"))
      val all = base.union(scaled)
        .repartition(col("vec_id"))
        .withColumn("bucket", expr(signBucketExpr))
        .withColumn("v", expr("transform(embedding, x -> cast(x as double))"))
      val a = all.select(col("bucket"), col("vec_id").as("vec_a"),
        col("v").as("va"))
      val b = all.select(col("bucket"), col("vec_id").as("vec_b"),
        col("v").as("vb"))
      a.join(b, Seq("bucket"))
        .filter(col("vec_a") < col("vec_b"))
        .withColumn("r", expr("round(cosine_sim(va, vb), 6)"))
        .filter(col("r") >= 0.999)
        .select(col("vec_a"), col("vec_b"), col("r"))
        .orderBy(col("vec_a"), col("vec_b"))
    }),

    // IVF-style ANN: a deterministic coarse quantizer (the first 16
    // vectors act as centroids — in production these come from a k-means
    // fit), every vector assigned to its nearest centroid, queries probe
    // only their own cluster. The assignment is a broadcast join against
    // the tiny centroid set; the probe is an equi-join on cluster id —
    // both shuffle-light at any corpus size.
    "v3_ann_ivf" -> ((s, dir) => {
      graft.GraftFunctions.register(s)
      val e = withV(load(s, dir, "embeddings"))
        .select(col("vec_id"), col("v"))
      val cent = e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cid"), col("v").as("cv"))
      val simToCent = e.join(broadcast(cent))
        .withColumn("r", expr("round(cosine_sim(v, cv), 6)"))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("r").desc, col("cid"))
      val assign = simToCent.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("vec_id"), col("cid"), col("v"))
      val q = assign.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("cid"), col("v").as("va"))
      val c = assign.select(col("vec_id").as("n_id"), col("cid"),
        col("v").as("vb"))
      val scored = c.join(broadcast(q), Seq("cid"))
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("r", expr("round(cosine_sim(va, vb), 6)"))
      val wq = Window.partitionBy(col("q_id"))
        .orderBy(col("r").desc, col("n_id"))
      scored.withColumn("rk", row_number().over(wq))
        .filter(col("rk") <= 3)
        .select(col("q_id"), col("rk"), col("n_id"), col("r"))
        .orderBy(col("q_id"), col("rk"))
    }),

    // Sign-bucket LSH: bucket = sign bits of dims 1-4; top-3 within the
    // query's bucket. The equi-join on bucket replaces the cross join —
    // this is the partition-local candidate generation that survives
    // scale-up (IVF-style, with buckets as the shuffle key).
    "v2_ann_bucketed" -> ((s, dir) => {
      graft.GraftFunctions.register(s)
      val e = withV(load(s, dir, "embeddings"))
        .withColumn("bucket", expr(signBucketExpr))
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("bucket"), col("v").as("va"))
      val c = e.select(col("vec_id").as("n_id"), col("bucket"),
        col("v").as("vb"))
      val scored = c.join(broadcast(q), Seq("bucket"))
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("r", expr(simExpr))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("r").desc, col("n_id"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("q_id"), col("rk"), col("n_id"), col("r"))
        .orderBy(col("q_id"), col("rk"))
    })
  )

  val oracle: Map[String, String] = Map(
    "v3_ann_ivf" ->
      """WITH e AS (SELECT vec_id,
        |             [CAST(x AS DOUBLE) for x in embedding] AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, v,
        |        sqrt(list_sum([x*x for x in v])) AS nrm FROM e),
        |cent AS (SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM n
        |         WHERE vec_id < 16),
        |assign AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT n.vec_id, cent.cid,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY round(list_sum([n.v[i]*cent.cv[i]
        |                   for i in range(1,65)])/(n.nrm*cent.cnrm), 6)
        |          DESC, cent.cid) AS rk
        |    FROM n CROSS JOIN cent) t
        |  WHERE rk = 1),
        |p AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |        round(list_sum([qa.v[i]*ca.v[i] for i in range(1,65)])
        |              / (qa.nrm * ca.nrm), 6) AS r
        |      FROM assign q JOIN assign c ON q.cid = c.cid
        |      JOIN n qa ON qa.vec_id = q.vec_id
        |      JOIN n ca ON ca.vec_id = c.vec_id
        |      WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id)
        |SELECT q_id, rk, n_id, r FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |    ORDER BY r DESC, n_id) AS rk FROM p) s
        |WHERE rk <= 3 ORDER BY q_id, rk""".stripMargin,

    "d5_embedding_neardup" ->
      """WITH allv AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000,
        |         [CAST(x * CAST(1.01 AS FLOAT) AS FLOAT) for x in embedding]
        |  FROM embeddings),
        |e AS (SELECT vec_id, embedding,
        |        [CAST(x AS DOUBLE) for x in embedding] AS v,
        |        (CASE WHEN embedding[1] > 0 THEN 8 ELSE 0 END
        |         + CASE WHEN embedding[2] > 0 THEN 4 ELSE 0 END
        |         + CASE WHEN embedding[3] > 0 THEN 2 ELSE 0 END
        |         + CASE WHEN embedding[4] > 0 THEN 1 ELSE 0 END) AS bucket
        |      FROM allv),
        |n AS (SELECT vec_id, bucket, v,
        |        sqrt(list_sum([x*x for x in v])) AS nrm FROM e),
        |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |        round(list_sum([a.v[i]*b.v[i] for i in range(1,65)])
        |              / (a.nrm * b.nrm), 6) AS r
        |      FROM n a JOIN n b ON a.bucket = b.bucket
        |      WHERE a.vec_id < b.vec_id)
        |SELECT vec_a, vec_b, r FROM p WHERE r >= 0.999
        |ORDER BY vec_a, vec_b""".stripMargin,

    "v1_ann_bruteforce" ->
      """WITH e AS (SELECT vec_id,
        |             [CAST(x AS DOUBLE) for x in embedding] AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, v,
        |        sqrt(list_sum([x*x for x in v])) AS nrm FROM e),
        |p AS (SELECT q.vec_id AS q_id, t.vec_id AS n_id,
        |        round(list_sum([q.v[i]*t.v[i] for i in range(1,65)])
        |              / (q.nrm * t.nrm), 6) AS r
        |      FROM n q, n t WHERE q.vec_id < 20 AND t.vec_id <> q.vec_id)
        |SELECT q_id, rk, n_id, r FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |    ORDER BY r DESC, n_id) AS rk FROM p) s
        |WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,

    "v2_ann_bucketed" ->
      """WITH e AS (SELECT vec_id, embedding,
        |             [CAST(x AS DOUBLE) for x in embedding] AS v,
        |             (CASE WHEN embedding[1] > 0 THEN 8 ELSE 0 END
        |              + CASE WHEN embedding[2] > 0 THEN 4 ELSE 0 END
        |              + CASE WHEN embedding[3] > 0 THEN 2 ELSE 0 END
        |              + CASE WHEN embedding[4] > 0 THEN 1 ELSE 0 END)
        |               AS bucket
        |           FROM embeddings),
        |n AS (SELECT vec_id, bucket, v,
        |        sqrt(list_sum([x*x for x in v])) AS nrm FROM e),
        |p AS (SELECT q.vec_id AS q_id, t.vec_id AS n_id,
        |        round(list_sum([q.v[i]*t.v[i] for i in range(1,65)])
        |              / (q.nrm * t.nrm), 6) AS r
        |      FROM n q JOIN n t ON q.bucket = t.bucket
        |      WHERE q.vec_id < 20 AND t.vec_id <> q.vec_id)
        |SELECT q_id, rk, n_id, r FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |    ORDER BY r DESC, n_id) AS rk FROM p) s
        |WHERE rk <= 3 ORDER BY q_id, rk""".stripMargin
  )
}
