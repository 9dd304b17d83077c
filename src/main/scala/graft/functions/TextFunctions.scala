package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text primitives for the dedup / text-analysis operators.
  *
  * Everything here is built from codegen'd Catalyst functions
  * (regexp_replace, split, higher-order transform/filter/aggregate) —
  * no UDFs — and has an exact DuckDB mirror (SURVEY.md §3): DuckDB
  * needs the 'g' flag on regexp_replace, Spark replaces all matches by
  * default; Spark element_at and DuckDB l[i] are both 1-based.
  */
object TextFunctions {

  /** Lowercase, collapse non-alphanumerics to single spaces, trim. */
  def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  /** Non-empty whitespace tokens of the normalized text. */
  def tokens(c: Column): Column =
    filter(split(normText(c), " "), x => x =!= "")

  /** Distinct word 3-gram shingles (empty array when < 3 tokens).
    * Guarded because Spark's sequence(1, 0) counts DOWN, not empty.
    */
  def shingles3(toks: Column): Column =
    when(size(toks) >= 3,
      array_distinct(transform(sequence(lit(1), size(toks) - 2), i =>
        concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))))
      .otherwise(array().cast("array<string>"))

  /** Portable seeded 60-bit hash (same value as the DuckDB expression
    * CAST('0x'||substr(md5(seed||':'||s),1,15) AS BIGINT)).
    */
  def seededHash(seed: Column, s: Column): Column =
    conv(substring(md5(concat(seed.cast("string"), lit(":"), s).cast("binary")), 1, 15), 16, 10)
      .cast("long")

  /** MinHash signature: for each of `perms` seeded hash functions, the
    * minimum hash over the shingle set. One pass over the array per
    * perm, all inside whole-stage codegen.
    */
  def minhashSignature(sh: Column, perms: Int): Column =
    transform(sequence(lit(0), lit(perms - 1)), i =>
      array_min(transform(sh, s => seededHash(i, s))))

  /** SimHash over the token multiset using the low `bits` bits of the
    * portable hash: bit j is set when the +1/-1 vote of all token
    * hashes at bit j is positive. The per-bit loop is unrolled at plan
    * build time (shiftright needs a literal shift), yielding one wide
    * codegen'd expression.
    */
  def simhash(toks: Column, bits: Int): Column = {
    val hashes = transform(toks, s => seededHash(lit(0), s))
    (0 until bits).map { j =>
      when(aggregate(hashes, lit(0L),
        (acc, h) => acc + (shiftright(h, j).bitwiseAND(1) * 2 - 1)) > 0,
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }
}
