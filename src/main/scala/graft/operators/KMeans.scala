package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over a vector column — the real fit
  * behind an IVF coarse quantizer (v3 uses deterministic stand-in
  * centroids so its oracle stays SQL-replicable; production IVF builds
  * its quantizer with this).
  *
  * Scale design: the model (k × d doubles) is the ONLY driver-side
  * state — the same contract as Spark ML's KMeans, where per-iteration
  * centroids are collected and re-broadcast. Each iteration is
  *  - assignment: one narrow projection — the centroid set rides along
  *    as a typed literal (one ArrayData reference, safe at any k·d),
  *    each row loops over k centroids inline (no join, no fan-out, no
  *    shuffle);
  *  - update: posexplode to (cid, dim, x) then ONE partial+final hash
  *    aggregate — map-side combine reduces each partition to ≤ k·d
  *    partial sums before the shuffle, so the wire carries k·d rows
  *    per partition regardless of corpus size.
  * Iterations are driver-sequenced but each pass is a full-cluster
  * scan; nothing per-row ever reaches the driver.
  *
  * Determinism: init = vectors of the k smallest ids; distances in
  * double; argmin ties break to the lowest centroid index
  * (array_position returns the first minimum); empty clusters keep
  * their previous centroid.
  */
object KMeans {

  /** Squared-L2 distances from `v` to each centroid, as an array col.
    * The centroid matrix travels as ONE typed literal — a single
    * ArrayData object in the generated code's references array, not a
    * rendered SQL expression. At production IVF sizes (k=4096, d=768 ≈
    * 3M doubles) a rendered `array(array(...))` literal would be tens
    * of MB of SQL and blow the codegen/constant-pool limits; the typed
    * literal stays O(1) in the generated source regardless of k·d and
    * ships to executors inside the serialized plan exactly once. */
  private def distsTo(cents: Array[Array[Double]]): Column = {
    val centLit = typedLit(cents.map(_.toSeq).toSeq)
    transform(centLit, c =>
      aggregate(zip_with(col("v"), c, (x, y) => (x - y) * (x - y)),
        lit(0.0), (a, b) => a + b))
  }

  /** Nearest-centroid id for the `v` column. */
  private def cidFor(cents: Array[Array[Double]]): Column = {
    val d = distsTo(cents)
    (array_position(d, array_min(d)) - 1).cast("int")
  }

  /** Fit k centroids. `df` must expose `idCol` (unique, orderable —
    * seeds the deterministic init) and `vecCol` (array<float|double>).
    */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int): Array[Array[Double]] = {
    val d = df.select(col(idCol).as("id"),
        expr(s"transform($vecCol, x -> cast(x as double))").as("v"))
      .persist()
    var cents: Array[Array[Double]] = d.orderBy(col("id")).limit(k)
      .select(col("v")).collect()
      .map(_.getSeq[Double](0).toArray)
    for (_ <- 1 to iters) {
      // cid is materialized in its OWN projection below the generator:
      // a Generate node re-evaluates same-projection expressions once
      // per OUTPUT row, which would run the k·d-op interpreted HOF
      // distance d times per vector (64× here — the t16 bug class;
      // measured 35 s/run on a 2 000-vector fit before the split, and
      // CollapseProject cannot merge across the Generate boundary)
      val sums = d.select(cidFor(cents).as("cid"), col("v"))
        .select(col("cid"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cid"), col("dim"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone())
      sums.groupBy(_.getInt(0)).foreach { case (cid, rows) =>
        rows.foreach { r =>
          next(cid)(r.getInt(1)) = r.getDouble(2) / r.getLong(3)
        }
      }
      cents = next
    }
    d.unpersist()
    cents
  }

  /** Assign every row its nearest-centroid id (the IVF cluster key). */
  def assign(df: DataFrame, vecCol: String,
      cents: Array[Array[Double]]): DataFrame =
    df.withColumn("v",
        expr(s"transform($vecCol, x -> cast(x as double))"))
      .withColumn("cid", cidFor(cents))
      .drop("v")
}
