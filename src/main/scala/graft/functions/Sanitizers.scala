package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** String sanitizers — the reference's byte-parity normalization layer
  * (alpha_num_str do_common.py:238-287, alpha_num_str_min
  * do_common.py:289-329, clean_str Exam_info.py:1660-1666), re-expressed
  * as pure Column chains (translate + regexp_replace) so they stay
  * inside whole-stage codegen — no UDF.
  *
  * Chain order matters for parity and is golden-tested in SanitizerSpec:
  * accent fold → '/'→'_' → drop non-ASCII → (full only) non-word→'_' →
  * collapse runs of '_' → trim edge '_'.
  */
object Sanitizers {

  private val accentsFrom = "éèêëàâäôöîïûüùçµ"
  private val accentsTo   = "eeeeaaaooiiuuucm"

  /** Full sanitizer: filesystem/identifier-safe ASCII. */
  def alphaNumStr(c: Column): Column = {
    val folded = translate(c, accentsFrom, accentsTo)
    val slashed = regexp_replace(folded, "/", "_")
    val ascii = regexp_replace(slashed, "[^\\x00-\\x7F]", "")
    val word = regexp_replace(ascii, "[^A-Za-z0-9_]", "_")
    val collapsed = regexp_replace(word, "_+", "_")
    regexp_replace(collapsed, "^_|_$", "")
  }

  /** Minimal sanitizer (SQL-literal variant): no non-word substitution,
    * keeps spaces/punctuation, only folds accents and drops non-ASCII. */
  def alphaNumStrMin(c: Column): Column = {
    val folded = translate(c, accentsFrom, accentsTo)
    val slashed = regexp_replace(folded, "/", "_")
    regexp_replace(slashed, "[^\\x00-\\x7F]", "")
  }

  /** clean_str: ascii-ignore + '^'/' ' → '_'. */
  def cleanStr(c: Column): Column =
    translate(regexp_replace(c, "[^\\x00-\\x7F]", ""), "^ ", "__")
}
