package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Value-exactness contract of the native chunk_ascii_stats (r18
  * optimization): the fused byte loop must produce THE SAME three
  * integers as the interpreted chain it replaced in m3/m4's
  * chunkFeatures —
  *
  *   ca        = regexp_replace(c, '[^ -~]', '')
  *   sum_bytes = if(length(ca)=0, 0, aggregate(transform(
  *                 sequence(1, length(ca)),
  *                 i -> ascii(substring(ca, i, 1))), 0, (a,b)->a+b))
  *   n_space   = length(c) - length(replace(c, ' ', ''))
  *   n_upper   = length(regexp_replace(c, '[^A-Z]', ''))
  *
  * — including on non-ASCII, empty, all-non-printable and
  * boundary-character (0x1F/0x20/0x7E/0x7F) inputs, through the
  * codegen path (DataFrame select). All-int arithmetic, so equality
  * is plain ==. */
class ChunkAsciiStatsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val oldChain = Seq(
    """if(length(ca) = 0, 0,
      |   aggregate(transform(sequence(1, length(ca)),
      |               i -> ascii(substring(ca, i, 1))),
      |             0, (a, b) -> a + b))""".stripMargin,
    "length(c) - length(replace(c, ' ', ''))",
    "length(regexp_replace(c, '[^A-Z]', ''))")

  test("chunk_ascii_stats ≡ the regex+HOF chain on adversarial inputs") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(0x18c5)
    val fixed = Seq(
      "", " ", "~", "", "", "AZaz09  ", "ZZZ",
      "héllo wörld", "é世界", "mixed ÿ A Z \t\n~",
      "😀 emoji A", "ALL UPPER CASE WITH SPACES",
      (0x00 to 0x7f).map(_.toChar).mkString)
    val randoms = (1 to 200).map { _ =>
      val n = rnd.nextInt(80)
      (1 to n).map { _ =>
        rnd.nextInt(4) match {
          case 0 => (0x20 + rnd.nextInt(0x5f)).toChar // printable
          case 1 => ('A' + rnd.nextInt(26)).toChar
          case 2 => rnd.nextInt(0x20).toChar          // control
          case _ => (0x80 + rnd.nextInt(0x2000)).toChar // multibyte
        }
      }.mkString
    }
    val df = (fixed ++ randoms).zipWithIndex.map(_.swap).toDF("id", "c")
      .withColumn("ca", expr("regexp_replace(c, '[^ -~]', '')"))
      .select(col("id"), col("c"),
        expr("chunk_ascii_stats(c)").as("st"),
        expr(oldChain(0)).as("h_sum"),
        expr(oldChain(1)).as("h_space"),
        expr(oldChain(2)).as("h_upper"))
    val bad = df.collect().filter { r =>
      val st = r.getStruct(2)
      st.getInt(0) != r.getInt(3) || st.getInt(1) != r.getInt(4) ||
        st.getInt(2) != r.getInt(5)
    }
    assert(bad.isEmpty,
      s"chunk_ascii_stats diverged on ${bad.length} rows, e.g. " +
        bad.take(3).map(r => s"'${r.getString(1)}' -> ${r.getStruct(2)} " +
          s"vs (${r.getInt(3)}, ${r.getInt(4)}, ${r.getInt(5)})")
          .mkString("; "))
  }

  test("null input yields null struct") {
    GraftFunctions.register(spark)
    val r = Seq(Option.empty[String]).toDF("c")
      .select(expr("chunk_ascii_stats(c)")).collect()
    assert(r.length == 1 && r(0).isNullAt(0))
  }
}
