package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text-normalization and shingling primitives used by both the
  * dedup/fingerprint operators and their DuckDB oracles. Everything is a
  * built-in `Column` expression (codegen'd, no UDFs), and every construct
  * has an exact DuckDB twin (the `o*` fragments) so the same bytes hash
  * on both engines.
  */
object TextFeatures {

  /** Canonical text form: lowercase, trimmed, whitespace collapsed. */
  def norm(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Words of the normalized text (single-space split). */
  def words(text: Column): Column = split(norm(text), " ")

  /** Word 3-gram shingles of the normalized text. Callers must filter to
    * `size(words) >= 3` (Spark `sequence` would run backwards otherwise).
    */
  def shingles(w: Column): Column =
    transform(
      sequence(lit(0), size(w) - 3),
      i => concat_ws(" ",
        element_at(w, i + 1), element_at(w, i + 2), element_at(w, i + 3)))

  // ---- DuckDB twins (SQL fragments over a column expression `t`) ----
  def oNorm(t: String): String =
    s"lower(trim(regexp_replace($t, '\\s+', ' ', 'g')))"
  def oWords(t: String): String = s"string_split(${oNorm(t)}, ' ')"
  /** Over a words-list expression `w`. */
  def oShingles(w: String): String =
    s"list_transform(range(len($w) - 2), i -> ($w)[i+1] || ' ' || ($w)[i+2] || ' ' || ($w)[i+3])"
}
