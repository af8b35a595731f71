package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextOps

/** Boundary semantics for the two round-8 text operators: the Gopher
  * rule thresholds (t24) and the overlapping-chunk emission contract
  * (t25). The DuckDB oracle checks both corpus-wide; this spec pins the
  * hand-reasoned edges: rule boundaries inclusive/exclusive, tail-chunk
  * suppression, and full token coverage under suppression. */
class ChunkGopherSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  private def words(n: Int, prefix: String = "tok") =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("t24: word-count window is inclusive at both published bounds") {
    // 48 filler + 'the'/'a' = 50 words exactly; all alpha; stopwords ok
    val at50 = "the a " + words(48)
    val at49 = "the a " + words(47)
    val got = TextOps.gopherRules(docs(1L -> at50, 2L -> at49))
      .select("doc_id", "ok_words", "keep")
      .as[(Long, Boolean, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 && got(1L)._3, "50 words must pass the window")
    assert(!got(2L)._2 && !got(2L)._3, "49 words must fail the window")
  }

  test("t24: mean word length and alpha-fraction rules bite") {
    // 50 single-char words → mean 1.0 < 3 → ok_mean false
    val short = ("the a " + Seq.fill(48)("x").mkString(" "))
    // 50 words, 11 numeric → alpha_frac 39/50 = 0.78 ≤ 0.8
    val numeric = "the a " + words(37) + " " +
      (1 to 11).map(_.toString).mkString(" ")
    val got = TextOps.gopherRules(docs(1L -> short, 2L -> numeric))
      .select("doc_id", "ok_mean", "ok_alpha")
      .as[(Long, Boolean, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(!got(1L)._2, "mean word length 1.0 must fail [3,10]")
    assert(!got(2L)._3, "alpha fraction 0.78 must fail > 0.8")
  }

  test("t24: stopword rule counts DISTINCT required stopwords") {
    // 'the' repeated is one distinct stopword → fails n_stop >= 2
    val oneStop = "the the the " + words(47)
    val got = TextOps.gopherRules(docs(1L -> oneStop))
      .select("n_stop", "ok_stop").as[(Int, Boolean)].head()
    assert(got == ((1, false)))
  }

  test("t25: tail window emitted only when more than the overlap remains") {
    // stride 24, size 32, overlap 8. n=34: start 25 has 34-25=9 > 8 → 2
    // chunks; n=30: start 25 has 5 ≤ 8 → suppressed, 1 chunk covers all
    val two = TextOps.ragChunks(docs(1L -> words(34)))
      .orderBy("chunk_id")
      .select("start_tok", "n_tokens").as[(Int, Int)].collect()
    assert(two.toSeq == Seq((1, 32), (25, 10)))
    val one = TextOps.ragChunks(docs(1L -> words(30)))
      .select("start_tok", "n_tokens").as[(Int, Int)].collect()
    assert(one.toSeq == Seq((1, 30)))
  }

  test("t25: every token is covered by some chunk at every length 1..80") {
    val d = docs((1L to 80L).map(n => n -> words(n.toInt)): _*)
    val cover = TextOps.ragChunks(d)
      .groupBy("doc_id")
      .agg(max(col("start_tok") + col("n_tokens") - 1).as("covered"),
        min("start_tok").as("first"))
      .as[(Long, Int, Int)].collect()
    cover.foreach { case (n, covered, first) =>
      assert(first == 1, s"doc of $n tokens: first chunk not at 1")
      assert(covered == n, s"doc of $n tokens: covered only $covered")
    }
  }

  test("t25: chunk hash is the md5 of the joined slice (spot check)") {
    val text = words(10)
    val h = TextOps.ragChunks(docs(1L -> text))
      .select("chunk_hash").as[String].head()
    val want = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    assert(h == want)
  }
}
