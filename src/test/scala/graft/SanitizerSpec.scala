package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Byte-parity goldens for the sanitizer chains (SURVEY §2.8; reference
  * semantics do_common.py:238-329). Each case is (input, expected) and
  * must match exactly — the DuckDB oracle replays the same chain. */
class SanitizerSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private type ColFn = org.apache.spark.sql.Column => org.apache.spark.sql.Column

  private def run(f: ColFn, s: String): String =
    Seq(s).toDF("s").select(f(col("s")).as("r")).head.getString(0)

  private val alphaNumStr: ColFn = graft.functions.Sanitizers.alphaNumStr
  private val alphaNumStrMin: ColFn = graft.functions.Sanitizers.alphaNumStrMin
  private val cleanStr: ColFn = graft.functions.Sanitizers.cleanStr

  test("alphaNumStr golden cases") {
    val cases = Seq(
      "Pâtient é/è ô" -> "Patient_e_e_o",
      "hello world"   -> "hello_world",
      "a//b"          -> "a_b",
      "__x__"         -> "x",
      "µ-calcification" -> "m_calcification",
      "résumé.txt"    -> "resume_txt",
      "Ångström"      -> "ngstrom", // unmapped accent dropped as non-ASCII
      "a b  c"        -> "a_b_c",
      ""              -> "")
    cases.foreach { case (in, want) =>
      assert(run(alphaNumStr, in) == want, s"alphaNumStr($in)")
    }
  }

  test("alphaNumStrMin keeps spaces and punctuation") {
    assert(run(alphaNumStrMin, "Pâtient é, ô/x") == "Patient e, o_x")
    assert(run(alphaNumStrMin, "日本語abc") == "abc")
  }

  test("cleanStr replaces caret and space") {
    assert(run(cleanStr, "a^b c") == "a_b_c")
    assert(run(cleanStr, "naïve^x") == "nave_x")
  }

  test("sanitizers are idempotent (f(f(s)) == f(s))") {
    val inputs = Seq("Pâtient é/è ô", "a//b", "__x__", "x y z", "")
    inputs.foreach { s =>
      val once = run(alphaNumStr, s)
      assert(run(alphaNumStr, once) == once)
    }
  }
}
