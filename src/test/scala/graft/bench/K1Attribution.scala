package graft.bench

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.catalog.JdbcCatalog

/** Cost attribution for `k1_jdbc_roundtrip` (VERDICT r08 ask #7):
  * split the ~2.5 s bench time into its phases — Spark-side batch
  * prep, parquet→Derby base load, staged MERGE upsert, partitioned
  * JDBC scan back — and time the same final-state computation done
  * purely in Spark over parquet as the reference point. If the
  * JDBC-free equivalent is a small fraction, the cost is the embedded
  * single-JVM database (expected), not the plan.
  *
  * Run: `sbt "Test/runMain graft.bench.K1Attribution [sfDir]"`.
  * Results land in BENCH_NOTES.md by hand.
  */
object K1Attribution {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def batchOf(base: DataFrame): DataFrame = {
      val changed = base.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1.0)
      val same = base.filter(col("o_orderkey") % 10 === 1)
      val fresh = base.filter(col("o_orderkey") % 10 === 2)
        .withColumn("o_orderkey", col("o_orderkey") + 1000000)
      changed.union(same).union(fresh)
    }

    // 3 trials, report each phase's min (same rationale as Bench)
    val trials = (1 to 3).map { t =>
      val base = load(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), col("o_orderpriority"))
      val url = s"jdbc:derby:memory:k1attr$t;create=true"
      val colTypes = Map("o_orderpriority" -> "VARCHAR(32)")

      val (_, tPrep) = time { batchOf(base).queryExecution.toRdd.count() }
      val (_, tLoad) = time {
        JdbcCatalog.write(base, url, "GRAFT_ORDERS",
          SaveMode.Overwrite, colTypes)
      }
      val (_, tMerge) = time {
        JdbcCatalog.stagedUpsert(spark, url, "GRAFT_ORDERS",
          batchOf(base), "o_orderkey", colTypes = colTypes)
      }
      val (_, tScan) = time {
        JdbcCatalog.scan(spark, url, "GRAFT_ORDERS",
          partition = Some(("o_orderkey", 0L, 2000000L, 8)))
          .orderBy(col("o_orderkey"))
          .queryExecution.toRdd.count()
      }

      // pure-Spark reference: same final state via full outer join of
      // batch over base, materialized sorted — what the round trip
      // would cost with parquet instead of a database in the loop
      val (_, tSparkOnly) = time {
        val l = base.alias("l")
        val r = batchOf(base).alias("r")
        l.join(r, Seq("o_orderkey"), "full_outer")
          .select(col("o_orderkey"),
            coalesce(col("r.o_custkey"), col("l.o_custkey"))
              .as("o_custkey"),
            coalesce(col("r.o_totalprice"), col("l.o_totalprice"))
              .as("o_totalprice"),
            coalesce(col("r.o_orderpriority"), col("l.o_orderpriority"))
              .as("o_orderpriority"))
          .orderBy(col("o_orderkey"))
          .queryExecution.toRdd.count()
      }
      Map("prep" -> tPrep, "derby_load" -> tLoad, "merge" -> tMerge,
        "jdbc_scan" -> tScan, "spark_only_equiv" -> tSparkOnly)
    }

    val phases = Seq("prep", "derby_load", "merge", "jdbc_scan",
      "spark_only_equiv")
    phases.foreach { p =>
      val best = trials.map(_(p)).min
      println(f"$p%-18s min ${best}%6.3f s  " +
        f"(trials: ${trials.map(t => f"${t(p)}%.3f").mkString(", ")})")
    }
    spark.stop()
  }
}
