package graft.stats

import java.security.MessageDigest

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
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
  * Scale shape: per-row bit arrays come from codegen'd builtins; the
  * signature aggregate carries 2 longs of state, map-side combined —
  * kilobytes per bucket at 100 TB, and exactly mergeable, so rollup
  * tiers OR signatures instead of rescanning text (the DDSketch
  * discipline applied to a bitset).
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
    * per-row input to [[sigAgg]] and a valid signature on its own. */
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

  /** Associative signature aggregate: ORs per-row bit arrays into the
    * 96-bit set. Output (sorted distinct positions) is valid input, so
    * the SAME aggregator serves base tiers AND rollups — merging two
    * buckets' signatures is a bitset union, never a text rescan. */
  final class SigAgg extends Aggregator[Seq[Int], Array[Long], Seq[Int]] {
    override def zero: Array[Long] = new Array[Long](Bits / 64 + 1)
    override def reduce(b: Array[Long], bits: Seq[Int]): Array[Long] = {
      if (bits != null) bits.foreach { i =>
        require(i >= 0 && i < Bits, s"trigram bit out of range: $i")
        b(i >> 6) |= 1L << (i & 63)
      }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Seq[Int] =
      (0 until Bits).filter(i => (b(i >> 6) & (1L << (i & 63))) != 0L)
    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Int]] =
      ExpressionEncoder[Seq[Int]]()
  }

  val sigAgg = udaf(new SigAgg)
}
