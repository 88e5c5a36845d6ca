package graft.stats

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** 96-bit trigram signatures for text-field statistics — the last line
  * of dp3's per-field summary surface (reference:
  * server/util/trigram/trigram.go:34-77 builds a 12-byte bitset from
  * padded character trigrams, one 32-bit hash per trigram;
  * server/nodestore/statistics.go:237,359 stores one per text field;
  * server/executor/statfilter.go:112-131 uses signature containment to
  * skip chunks on string equality).
  *
  * Bits derive from md5 instead of the reference's murmur3 so the
  * signature is reproducible in ANY engine (the repo's cross-engine
  * hashing rule — the DuckDB oracle recomputes it bit-for-bit). The
  * contract is the reference's, not the hash: a value observed in the
  * bucket implies its bits are all set (no false negatives); absence of
  * any query bit proves the bucket clean.
  *
  * Scale shape: the signature is stored as [[Words]] 48-bit LONG words
  * and aggregated with the BUILT-IN `bit_or` — a primitive-buffer
  * `HashAggregate` inside whole-stage codegen, never an object
  * aggregate. (The first cut used a typed Aggregator over bit arrays:
  * ObjectHashAggregate + encoder traffic made the probe query ~5x
  * slower than the equivalent sketch tiers. A bitset is two longs;
  * Spark already knows how to OR longs.) Rollups OR the words instead
  * of rescanning text — the DDSketch merge discipline applied to a
  * bitset. 48-bit words keep every shift far from the sign bit on any
  * engine (DuckDB replicates `1::BIGINT << (bit % 48)` exactly).
  */
object Trigram {

  /** Signature width: the reference's NewSignature(12) = 12 bytes. */
  val Bits = 96

  /** Padded character trigrams of a text value: "  s " sliding 3-char
    * window (reference ComputeTrigrams, trigram.go:61-77); empty and
    * null texts yield no trigrams, like AddString over "". The window
    * is character-based on both engines (Spark substr ≡ DuckDB
    * substring), a single consistent definition. */
  def trigramsOf(text: Column): Column = {
    val pad = concat(lit("  "), text, lit(" "))
    when(text.isNotNull && length(text) > 0,
      array_distinct(transform(sequence(lit(1), length(pad) - 2),
        i => pad.substr(i, lit(3)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Bit position of one trigram: first 8 md5 hex digits (a 32-bit
    * value, mirroring the reference's 32-bit murmur) mod [[Bits]]. */
  def bitOf(trgm: Column): Column =
    pmod(conv(substring(md5(trgm), 1, 8), 16, 10).cast("long"),
      lit(Bits.toLong)).cast("int")

  /** Distinct signature bit positions of a text value, sorted — the
    * builtin reference formulation [[maskOf]] folds into words; the
    * hot path uses [[masksOf]] instead. */
  def bitsOf(text: Column): Column =
    array_sort(array_distinct(transform(trigramsOf(text), t => bitOf(t))))

  /** [[bitsOf]] evaluated driver-side for a literal — the statfilter
    * compiles the query string's signature once at plan time
    * (statfilter.go:112-114). Identical to the Spark expression: same
    * padding, same md5 prefix, same modulus. */
  def bitsOfString(s: String): Seq[Int] = {
    val md = MessageDigest.getInstance("MD5")
    trigramsOfString(s).map { t =>
      val hex = md.digest(t.getBytes("UTF-8")).take(4)
        .map(b => f"${b & 0xff}%02x").mkString
      (java.lang.Long.parseLong(hex, 16) % Bits).toInt
    }.distinct.sorted
  }

  private[stats] def trigramsOfString(s: String): Seq[String] =
    if (s.isEmpty) Seq.empty
    else {
      val pad = "  " + s + " "
      (0 to pad.length - 3).map(i => pad.substring(i, i + 3))
    }

  /** Signature word layout: 96 bits = 2 words x 48 bits, bit b lives
    * in word b/48 at position b%48. */
  val Words = 2
  val WordBits = 48

  /** BOTH signature words of a text value as array<long>, via the
    * native codegen'd expression ([[graft.functions.TrigramMasks]]) —
    * one md5 pass, no interpreted lambdas. This is the hot path the
    * stat tiers aggregate with `bit_or`. */
  def masksOf(text: Column): Column =
    graft.functions.TextFunctions.trgmMasks(text)

  /** Per-row signature word `w` from a bit array ([[bitsOf]] output):
    * OR of 2^(b - 48w) over this word's bits. The builtin reference
    * formulation of [[masksOf]] — interpreted (higher-order functions
    * have no codegen), kept as the executable spec the native
    * expression is pinned against. The power-of-two comes from `pow`
    * (exact in doubles up to 2^52, and 47 is the largest exponent
    * here). */
  def maskOf(bits: Column, w: Int): Column = {
    val lo = w * WordBits
    aggregate(
      filter(bits, b => b >= lit(lo) && b < lit(lo + WordBits)),
      lit(0L),
      (acc, b) => acc.bitwiseOR(
        pow(lit(2.0), (b - lit(lo)).cast("double")).cast("long")))
  }

  /** [[maskOf]] words evaluated driver-side for a literal — the query
    * side of the containment check. */
  def masksOfString(s: String): Seq[Long] = {
    val masks = new Array[Long](Words)
    bitsOfString(s).foreach { b =>
      masks(b / WordBits) |= 1L << (b % WordBits)
    }
    masks.toSeq
  }
}
