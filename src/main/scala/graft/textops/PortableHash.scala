package graft.textops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable hashing for ORACLE MODE (VERDICT r3 next #2).
  *
  * The scale paths hash with xxhash64 / XXH64 — fast, but with no DuckDB
  * twin, so the three hash-native driver queries (q_minhash_pairs,
  * q_simhash_pairs, q_lsh_topk) shipped `no_oracle`. This module defines
  * a pure-ARITHMETIC hash family — character polynomials mod a 31-bit
  * prime, multiply-shift slot derivation, polynomial band combination —
  * where every intermediate stays below 2⁵² so Spark BIGINT, DuckDB
  * BIGINT and IEEE doubles all compute the identical value. Same design
  * as the r3 fingerprint oracle (`TextStats.fingerprint`,
  * `DocQueries.qTextAnalysisSql`), generalized.
  *
  * Contract: ASCII token corpora (Spark `ascii` = DuckDB `unicode` for
  * ASCII; the synthetic corpus is verified ASCII-only). The xxhash64
  * family remains the default everywhere — portable mode is an opt-in
  * flag on each operator.
  */
object PortableHash {

  /** Same 31-bit prime as `TextStats.fingerprint`: products of a hash
    * value with any multiplier below 2²¹ stay under 2⁵² (double-exact,
    * BIGINT-exact). */
  val P: Long = 2147483629L

  /** ASCII gate for portable mode (ADVICE r4): the NATIVE portable
    * expressions (MinHashSignature / SimHashSignature, portable family)
    * hash each string's UTF-8 BYTES in a tight loop, while [[charPoly]]
    * and the DuckDB twins hash per-character CODEPOINTS — identical on
    * ASCII, silently divergent on anything else. Rather than let a
    * non-ASCII corpus produce wrong-but-plausible signatures in oracle
    * mode, fail loudly: passes the text through when
    * `octet_length = char_length` (pure-ASCII ⇔ every char is one byte),
    * raises otherwise. Cost: two codegen'd length calls per row. */
  def assertAscii(t: Column): Column =
    when(t.isNull || octet_length(t) === length(t), t)
      .otherwise(raise_error(concat(
        lit("portable hash mode is ASCII-only (native loops hash UTF-8 " +
          "bytes; the DuckDB oracle family hashes codepoints — values " +
          "would silently diverge). Non-ASCII text: "),
        substring(t, 1, 48))))

  /** Rolling polynomial over a string's character codes mod [[P]].
    * DuckDB twin:
    * `list_reduce(list_prepend(0, list_transform(range(1, length(s)+1),
    *   i -> unicode(s[i]))), (a, c) -> (a * <mult> + c) % 2147483629)`. */
  def charPoly(s: Column, mult: Long = 131L): Column = {
    require(mult > 0 && mult < (1L << 21), s"multiplier $mult out of exact range")
    aggregate(transform(split(s, ""), ch => ascii(ch).cast("long")), lit(0L),
      (acc, c) => pmod(acc * mult + c, lit(P)))
  }

  /** Polynomial combination of a long-array slice with an integer seed —
    * the portable band hash: fold starting at `init`, step
    * `(acc * 1000003 + v) mod P`. DuckDB twin: `list_reduce(
    * list_prepend(CAST(<init> AS BIGINT), <slice>), (a, v) ->
    * (a * 1000003 + v) % 2147483629)`. */
  def polyCombine(arr: Column, init: Column): Column =
    aggregate(arr, init.cast("long"),
      (acc, v) => pmod(acc * 1000003L + v, lit(P)))

  /** Deterministic ±1 hyperplane sign for (table, plane, dim) — the
    * portable replacement for the xxhash64-parity formula. Max argument
    * ≈ 70k · 2654435761 < 2⁴⁸: exact everywhere. Evaluated driver-side
    * (plain Scala) when building plane literals; the DuckDB twin is the
    * same arithmetic inline. */
  def planeSign(table: Int, plane: Int, dim: Int): Double = {
    val x = (table.toLong * 8191L + plane.toLong * 131L + dim.toLong * 7L + 1L) *
      2654435761L
    if (x % P % 2 == 0) 1.0 else -1.0
  }
}
