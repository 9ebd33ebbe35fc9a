package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the training-data pipeline operators
  * (language-ID, quality scoring, token counting, fingerprinting, MinHash
  * shingles). Everything is deterministic column arithmetic so results are
  * reproducible across engines (the DuckDB oracles mirror each formula)
  * and across cluster sizes.
  */
object TextFunctions {

  /** Whitespace tokenization (single-space convention of the corpus). */
  def tokens(text: Column): Column = split(text, " ")

  def distinctTokens(text: Column): Column = array_distinct(tokens(text))

  /** Deterministic 60-bit hash of a string: the top 15 hex digits of its
    * md5, as a positive long. Portable: md5 is identical everywhere
    * (DuckDB: CAST('0x'||substr(md5(x),1,15) AS BIGINT)). */
  def md5Long60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** MinHash parameters: k universal-hash functions over Z_p,
    * p = 2^31 - 1; a_k, b_k from a fixed LCG so both engines can
    * regenerate them as literal arithmetic. */
  val MinhashP = 2147483647L
  def minhashA(k: Int): Long = (1103515245L * (k + 1) + 12345L) % MinhashP
  def minhashB(k: Int): Long = (1103515245L * (k + 101) + 12345L) % MinhashP

  /** Evaluate `e` exactly once and feed the value to `f`, by binding it
    * to a higher-order-function lambda variable. Without this, Catalyst's
    * CollapseProject inlines single-use projected columns back into their
    * consumer, re-evaluating an expensive subexpression (here: the md5
    * token-hash pass) once per reference — 16× for MinHash, 60× for
    * SimHash. HOF lambda arguments are evaluated before the lambda body,
    * so this pins evaluation count to 1 regardless of plan rewrites. */
  def bindOnce(e: Column, f: Column => Column): Column =
    element_at(transform(array(e), f), 1)

  /** md5 hashes of the distinct tokens. */
  def tokenHashes(text: Column): Column =
    transform(distinctTokens(text), t => md5Long60(t))

  /** 16-function MinHash signature from pre-computed token hashes.
    * h_k(doc) = min over tokens of ((a_k * (H mod p) + b_k) mod p).
    * Products stay < 2^62 (no overflow). Native codegen kernel
    * ([[graft.plans.MinhashSignature]]); the HOF formulation below is
    * kept as [[minhashFromHashesHof]] — both compute the identical
    * value (unit-tested against each other). */
  def minhashFromHashes(hs: Column, k: Int = 16): Column =
    graft.plans.MinhashSignature(hs, k)

  def minhashFromHashesHof(hs: Column, k: Int = 16): Column =
    bindOnce(transform(hs, _ % MinhashP), hp =>
      array((0 until k).map { i =>
        array_min(transform(hp, h => (lit(minhashA(i)) * h + lit(minhashB(i))) % MinhashP))
      }: _*))

  def minhashSignature(text: Column, k: Int = 16): Column =
    minhashFromHashes(tokenHashes(text), k)

  /** 60-bit SimHash over the distinct-token set: bit b is set iff the
    * (+1/-1) vote over tokens' H-bit b is positive. Bit b of h is
    * extracted as (h div 2^b) mod 2 — pure long arithmetic, identical in
    * DuckDB as (h >> b) & 1. */
  def simhash60(text: Column): Column = simhashFromHashes(tokenHashes(text))

  /** Native codegen implementation ([[graft.plans.SimHash60]]); the HOF
    * formulation below is kept as [[simhashFromHashesHof]] — both compute
    * the identical value (unit-tested against each other). */
  def simhashFromHashes(hs: Column): Column = graft.plans.SimHash60(hs)

  def simhashFromHashesHof(hs: Column): Column =
    bindOnce(hs, hsv => {
      val pow2 = array((0 until 60).map(b => lit(1L << b)): _*)
      aggregate(sequence(lit(0), lit(59)), lit(0L), (acc, b) => {
        val p = element_at(pow2, b + 1)
        val net = aggregate(hsv, lit(0L), (a2, h) =>
          a2 + when(KeyAlgebra.ldiv(h, p) % 2L === 1L, lit(1L)).otherwise(lit(-1L)))
        acc + when(net > 0L, p).otherwise(lit(0L))
      })
    })
}
