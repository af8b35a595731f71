package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** word_trigram_hash64 must be SET-equivalent to the HOF trigram
  * pipeline it replaced: same distinct-trigram count per doc, and the
  * same Jaccard for every pair (hash identity ⇔ string identity
  * modulo 64-bit collisions). Split-on-single-space edge cases —
  * double spaces (empty words), leading/trailing spaces, short docs,
  * multi-byte UTF-8 — are exactly where the byte-span trick could go
  * wrong, so they're all here. */
class WordTrigramSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",
    "a b c",            // exactly one trigram
    "a b",              // fewer than 3 words -> empty
    "",                 // empty string
    "one  two three four",      // double space -> empty word
    " leading space here now",  // leading space -> empty first word
    "trailing space here now ", // trailing space -> empty last word
    "répé títí ñaña répé títí ñaña", // multi-byte UTF-8, repeats
    "x x x x x x")      // all-identical trigrams -> 1 distinct

  test("distinct-trigram count matches the HOF string pipeline on " +
      "every edge case") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = texts.zipWithIndex.map(_.swap).toDF("id", "text")
      .withColumn("w", split(col("text"), " "))
      .withColumn("hof", expr(
        """case when size(w) >= 3 then
          |  array_distinct(transform(sequence(1, size(w)-2), i ->
          |    concat_ws(' ', element_at(w,i), element_at(w,i+1),
          |              element_at(w,i+2))))
          |else cast(array() as array<string>) end""".stripMargin))
      .withColumn("fast", expr("word_trigram_hash64(text)"))
    val bad = df.filter(size(col("fast")) =!= size(col("hof")))
      .select("id", "text").collect()
    assert(bad.isEmpty, s"count mismatch on: ${bad.mkString(", ")}")
    // sorted ascending, as sorted_intersect_count requires
    // (sequence(1, 0) DESCENDS in Spark — guard the size<2 arrays)
    assert(df.filter(size(col("fast")) >= 2 && expr(
      "exists(sequence(1, size(fast)-1), i -> fast[i] <= fast[i-1])"))
      .count() == 0)
  }

  test("pairwise Jaccard equals the string-set Jaccard") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val docs = texts.zipWithIndex.map(_.swap).toDF("id", "text")
      .withColumn("w", split(col("text"), " "))
      .withColumn("hof", expr(
        """case when size(w) >= 3 then
          |  array_distinct(transform(sequence(1, size(w)-2), i ->
          |    concat_ws(' ', element_at(w,i), element_at(w,i+1),
          |              element_at(w,i+2))))
          |else cast(array() as array<string>) end""".stripMargin))
      .withColumn("fast", expr("word_trigram_hash64(text)"))
      .filter(size(col("fast")) > 0)
    val pairs = docs.alias("a").crossJoin(docs.alias("b"))
      .filter(col("a.id") < col("b.id"))
      .select(
        expr("sorted_intersect_count(a.fast, b.fast)").as("ih"),
        size(array_intersect(col("a.hof"), col("b.hof"))).as("is"),
        (size(col("a.fast")) + size(col("b.fast"))).as("nh"),
        (size(col("a.hof")) + size(col("b.hof"))).as("ns"))
    assert(pairs.filter(col("ih") =!= col("is") ||
      col("nh") =!= col("ns")).count() == 0,
      "hash-set Jaccard diverged from string-set Jaccard")
  }
}
