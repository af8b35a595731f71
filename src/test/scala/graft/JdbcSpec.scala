package graft

import org.apache.spark.sql.{Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.JdbcCatalog

/** JDBC catalog path (S8/K1/K2/K3) against embedded in-memory Derby:
  * partitioned scan, append, and the staged MERGE upsert — including
  * the float-tolerance keep, the exclude-list, and the idempotence
  * property (re-merging the same batch affects 0 rows).
  */
class JdbcSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val url = "jdbc:derby:memory:graft_spec;create=true"
  private val types = Map("name" -> "VARCHAR(64)")

  private def seed(table: String): Unit = {
    val db = Seq(
      (1L, "alice", 2.0000001, "2024-01-01"),
      (2L, "bob", 10.0, "2024-01-02"),
      (3L, "carol", 30.0, "2024-01-03")
    ).toDF("id", "name", "price", "day")
    JdbcCatalog.write(db, url, table, SaveMode.Overwrite, types)
  }

  test("round trip: write then scan returns the same rows") {
    seed("RT")
    val back = JdbcCatalog.scan(spark, url, "RT")
    assert(back.columns.sorted.toSeq == Seq("day", "id", "name", "price"))
    assert(back.orderBy("id").collect().map(r => (r.getLong(0),
      r.getString(1))).toSeq == Seq(1L -> "alice", 2L -> "bob", 3L -> "carol"))
  }

  test("filters push into the JDBC source query (not evaluated in Spark)") {
    seed("t_push")
    val df = JdbcCatalog.scan(spark, url, "t_push").filter(col("id") > 1L)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters:") &&
      "(?i)GreaterThan\\(\"?id\"?,1\\)".r.findFirstIn(p).nonEmpty,
      s"id > 1 not pushed to the JDBC scan:\n${p.take(1500)}")
    assert(df.count() == 2)
  }

  test("partitioned scan splits the key range across N partitions") {
    seed("PART")
    val scanned = JdbcCatalog.scan(spark, url, "PART",
      partition = Some(("id", 0L, 4L, 4)))
    assert(scanned.rdd.getNumPartitions == 4)
    assert(scanned.count() == 3)
  }

  test("append adds rows without touching existing ones") {
    seed("APP")
    val more = Seq((4L, "dave", 40.0, "2024-01-04"))
      .toDF("id", "name", "price", "day")
    JdbcCatalog.write(more, url, "APP", SaveMode.Append)
    assert(JdbcCatalog.scan(spark, url, "APP").count() == 4)
  }

  test("staged upsert: insert-new, update-changed, keep within float tolerance") {
    seed("UP")
    val batch = Seq(
      (1L, "alice", 2.0000002, "2024-01-01"), // round(x*1e5) equal -> kept
      (2L, "bob", 11.5, "2024-01-02"),        // price changed -> updated
      (3L, "carol", 30.0, "2024-01-03"),      // identical -> kept
      (9L, "zoe", 90.0, "2024-01-09")         // new key -> inserted
    ).toDF("id", "name", "price", "day")
    val affected = JdbcCatalog.stagedUpsert(spark, url, "UP", batch, "id",
      colTypes = types)
    assert(affected == 2) // one update + one insert
    val out = JdbcCatalog.scan(spark, url, "UP").orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 9L))
    // the sub-tolerance row kept the DB value, not the batch's
    assert(out(0).getDouble(2) == 2.0000001)
    assert(out(1).getDouble(2) == 11.5)
    // idempotence: the same batch again touches nothing
    assert(JdbcCatalog.stagedUpsert(spark, url, "UP", batch, "id",
      colTypes = types) == 0)
  }

  test("exclude-list: a change only in an excluded column is kept") {
    seed("EXC")
    val batch = Seq((2L, "bob", 10.0, "2099-12-31"))
      .toDF("id", "name", "price", "day")
    val affected = JdbcCatalog.stagedUpsert(spark, url, "EXC", batch, "id",
      exclude = Seq("day"), colTypes = types)
    assert(affected == 0)
    val day = JdbcCatalog.scan(spark, url, "EXC")
      .filter(col("id") === 2).select("day").as[String].head()
    assert(day == "2024-01-02") // DB value survives
  }

  test("null-aware change detection updates null->value and value->null") {
    val schema = StructType(Seq(StructField("id", LongType, false),
      StructField("name", StringType, true)))
    val db = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, null), Row(2L, "kept")), schema)
    JdbcCatalog.write(db, url, "NULLS", SaveMode.Overwrite, types)
    val batch = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, "filled"), Row(2L, null)), schema)
    assert(JdbcCatalog.stagedUpsert(spark, url, "NULLS", batch, "id",
      colTypes = types) == 2)
    val out = JdbcCatalog.scan(spark, url, "NULLS").orderBy("id")
      .collect().map(r => Option(r.getString(1)))
    assert(out.toSeq == Seq(Some("filled"), None))
  }

  test("mysql dialect emits UPDATE..JOIN + INSERT..NOT EXISTS with " +
      "change guards (Cenir_DB.py:956-1024 semantics)") {
    val schema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("name", StringType, true),
      StructField("price", DoubleType, true),
      StructField("day", StringType, true)))
    val sqls = JdbcCatalog.upsertSqls("jdbc:mysql://host/db", "EXAMS",
      "EXAMS_STAGE", schema, "id", exclude = Seq("day"))
    // two deterministic statements — no ODKU, no session-variable
    // latch (MySQL documents ODKU assignment order and in-statement
    // user-variable evaluation order as undefined)
    assert(sqls.size == 2)
    val Seq(update, insert) = sqls
    assert(!update.contains("@graft_chg") && !insert.contains("@graft_chg"))
    assert(!insert.contains("ON DUPLICATE KEY UPDATE"))
    // update arm: pre-update WHERE over target vs stage, all non-key
    // columns SET (excluded ones too — MERGE-arm parity)
    assert(update.startsWith("UPDATE EXAMS JOIN EXAMS_STAGE"))
    assert(update.contains("ON EXAMS.`id` = EXAMS_STAGE.`id`"))
    assert(update.contains("EXAMS.`name` = EXAMS_STAGE.`name`"))
    assert(update.contains("EXAMS.`day` = EXAMS_STAGE.`day`"))
    // the double column compares under the reference's 1e5 tolerance
    assert(update.contains("FLOOR(EXAMS.`price` * 100000 + 0.5) <> " +
      "FLOOR(EXAMS_STAGE.`price` * 100000 + 0.5)"))
    // excluded column: never part of the change predicate, still SET
    assert(!update.contains("EXAMS_STAGE.`day` IS NOT NULL"))
    // null-aware inequality present for the compared string column
    assert(update.contains(
      "(EXAMS.`name` IS NULL AND EXAMS_STAGE.`name` IS NOT NULL)"))
    // insert arm: only rows whose key is absent from the target
    assert(insert.startsWith(
      "INSERT INTO EXAMS (`id`, `name`, `price`, `day`)"))
    assert(insert.contains("WHERE NOT EXISTS (SELECT 1 FROM EXAMS"))
    assert(insert.contains("EXAMS.`id` = EXAMS_STAGE.`id`"))
  }

  test("mysql dialect with nothing comparable degrades to insert-only") {
    val schema = StructType(Seq(StructField("id", LongType, false)))
    val sqls = JdbcCatalog.upsertSqls("jdbc:mysql://host/db", "T",
      "T_STAGE", schema, "id", Nil)
    assert(sqls.size == 1) // no update arm at all — the "do nothing"
    assert(sqls.head.startsWith("INSERT INTO T (`id`)"))
    assert(sqls.head.contains("WHERE NOT EXISTS"))
  }

  test("ansi dialect emission is unchanged by the dialect branch") {
    val schema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("name", StringType, true)))
    val Seq(sql) = JdbcCatalog.upsertSqls("jdbc:derby:memory:x", "T",
      "T_STAGE", schema, "id", Nil)
    assert(sql.startsWith("MERGE INTO T t USING T_STAGE s"))
    assert(sql.contains("WHEN MATCHED AND") &&
      sql.contains("WHEN NOT MATCHED THEN INSERT"))
    assert(sql.contains("\"name\" = s.\"name\""))
  }
}
