package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bit-parallel Levenshtein distance (Myers 1999 / Hyyrö 2001) — the
  * per-pair hot loop of the edit-confirmed near-dup join
  * ([[graft.ops.ext.Dedup.editConfirmedPairs]], q108: the suite's most
  * expensive query, whose scaladoc notes the confirm dominates).
  *
  * Spark's builtin 3-arg `levenshtein` is the BANDED dynamic program:
  * O((2·maxDist+1) · n) DP cells per pair, each a byte compare + two
  * array reads + three mins — ≈ 2,100 branchy cell steps for the q108
  * shape (64-char prefixes, maxDist 16). Myers' formulation computes the
  * SAME distance in O(n) word steps when the shorter string fits one
  * 64-bit word — 64 iterations of ~15 branchless bit operations — by
  * encoding each DP column's delta vector in two machine words.
  *
  * Exact-parity contract with the builtin (spec-held in
  * LevenshteinKernelSpec against `UTF8String.levenshteinDistance`):
  *  - UNITS are the builtin's: "characters" delimited by
  *    `UTF8String.numBytesForFirstByte` lead-byte walks (code points for
  *    valid UTF-8; invalid lead/continuation bytes advance 1–6 bytes
  *    exactly like the builtin's walk — both sides of the parity run the
  *    identical byte-walk, so invalid UTF-8 agrees too);
  *  - char EQUALITY is byte-slice equality. The builtin compares
  *    `num_bytes(text char)` raw bytes; since a char's byte length is a
  *    function of its lead byte, equal lead bytes imply equal lengths and
  *    the comparison is equivalent to whole-slice equality — here each
  *    slice packs (its own length, its ≤6 bytes) into one long key;
  *  - bounded form: -1 past the bound, with the builtin's pre-checks in
  *    the builtin's ORDER (empty-side rule BEFORE the |n−m| cutoff, so a
  *    negative bound still returns the empty side's length check first);
  *    a negative bound therefore always yields -1 for non-null inputs;
  *  - nulls propagate (BinaryExpression nullSafeEval), like the builtin.
  *
  * The ONE documented divergence: a string whose final char's lead byte
  * claims more bytes than remain (a TRUNCATED multi-byte tail). The
  * builtin's `arrayEquals` reads the claimed length without clamping —
  * an out-of-bounds Unsafe read whose result is undefined — while this
  * kernel clamps the slice at the string end. Parity is asserted for
  * every input whose walk stays in bounds (all valid UTF-8, and invalid
  * bytes anywhere but a claiming tail).
  *
  * Shape: pattern = the SHORTER string (≤ 64 chars → one-word Myers;
  * longer patterns fall back to the builtin — correctness everywhere,
  * the speed claim only where the engine needs it: q108's 64-char
  * prefixes). Equal byte strings short-circuit to 0 (near-dup candidate
  * pairs share boilerplate prefixes constantly). The ASCII fast path
  * indexes the pattern mask table by lead byte directly; the general
  * path probes a 128-slot open-addressed (packed char → mask) table.
  * All scratch is thread-local — zero per-row allocation.
  */
case class LevenshteinBoundedExpr(
    left: Expression, right: Expression, threshold: Option[Int])
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType, StringType)

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any = threshold match {
    case Some(t) => LevenshteinKernel.distanceBounded(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], t)
    case None => LevenshteinKernel.distance(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    threshold match {
      case Some(t) => defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.LevenshteinKernel.distanceBounded($a, $b, $t)")
      case None => defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.LevenshteinKernel.distance($a, $b)")
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_levenshtein"
}

object LevenshteinBoundedExpr {
  /** `graft_levenshtein($"a", $"b")` — full distance, builtin-equal. */
  def graft_levenshtein(a: Column, b: Column): Column =
    GraftColumnBridge.column(LevenshteinBoundedExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b), None))

  /** `graft_levenshtein($"a", $"b", maxDist)` — -1 past the bound,
    * builtin-3-arg-equal. */
  def graft_levenshtein(a: Column, b: Column, maxDist: Int): Column =
    GraftColumnBridge.column(LevenshteinBoundedExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b),
      Some(maxDist)))
}

object LevenshteinKernel {

  /** Thread-confined scratch: the ASCII direct-index mask table and the
    * general-path open-addressed (key, mask) table. 3 KiB per task
    * thread, allocated once. */
  private final class Scratch {
    val ascii = new Array[Long](128)
    val keys = new Array[Long](128)
    val masks = new Array[Long](128)
  }
  private val scratch = new ThreadLocal[Scratch] {
    override def initialValue(): Scratch = new Scratch
  }

  /** Full distance — equals `a.levenshteinDistance(b)`. */
  def distance(a: UTF8String, b: UTF8String): Int =
    compute(a, b, Int.MaxValue, bounded = false)

  /** Bounded distance — equals `a.levenshteinDistance(b, threshold)`:
    * the distance when ≤ threshold, -1 past it. */
  def distanceBounded(a: UTF8String, b: UTF8String, threshold: Int): Int =
    compute(a, b, threshold, bounded = true)

  private def compute(aIn: UTF8String, bIn: UTF8String, th: Int,
      bounded: Boolean): Int = {
    var a = aIn
    var b = bIn
    var n = a.numChars()
    var m = b.numChars()
    // the builtin's pre-check ORDER: empty sides first, then the length
    // cutoff — so th < 0 answers the empty rule before the cutoff
    if (n == 0) return if (!bounded || m <= th) m else -1
    if (m == 0) return if (!bounded || n <= th) n else -1
    if (n > m) { val t = a; a = b; b = t; val tn = n; n = m; m = tn }
    if (bounded && m - n > th) return -1
    // equal bytes = distance 0 (and 0 ≤ th here: th < 0 implied m−n > th
    // above) — near-dup candidates share identical prefixes constantly
    if (a.numBytes() == b.numBytes() && a.equals(b)) return 0
    if (n > 64)
      return if (bounded) aIn.levenshteinDistance(bIn, th)
      else aIn.levenshteinDistance(bIn)
    val d = myers(a, n, b)
    if (bounded && d > th) -1 else d
  }

  /** One-word Myers over pattern s (n ≤ 64 chars) and text t. The text
    * loop advances by the SAME `numBytesForFirstByte` walk `numChars`
    * counts with, so it runs exactly numChars(t) iterations. */
  private def myers(s: UTF8String, n: Int, t: UTF8String): Int = {
    val sb = s.numBytes()
    var ascii = true
    var i = 0
    while (ascii && i < sb) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    val sc = scratch.get()
    if (ascii) myersAscii(s, n, t, sc) else myersGeneral(s, n, t, sc)
  }

  private def myersAscii(s: UTF8String, n: Int, t: UTF8String,
      sc: Scratch): Int = {
    val peq = sc.ascii
    java.util.Arrays.fill(peq, 0L)
    var i = 0
    while (i < n) { peq(s.getByte(i)) |= 1L << i; i += 1 }
    var pv = -1L
    var mv = 0L
    var score = n
    val last = 1L << (n - 1)
    val tb = t.numBytes()
    var jb = 0
    while (jb < tb) {
      val lead = t.getByte(jb)
      // an ASCII pattern char can never equal a multi-byte or invalid-
      // high text char: lead bytes differ
      val eq = if ((lead & 0x80) == 0) peq(lead) else 0L
      val xv = eq | mv
      val xh = (((eq & pv) + pv) ^ pv) | eq
      var ph = mv | ~(xh | pv)
      var mh = pv & xh
      if ((ph & last) != 0L) score += 1
      if ((mh & last) != 0L) score -= 1
      ph = (ph << 1) | 1L
      mh = mh << 1
      pv = mh | ~(xv | ph)
      mv = ph & xv
      jb += UTF8String.numBytesForFirstByte(lead)
    }
    score
  }

  private def myersGeneral(s: UTF8String, n: Int, t: UTF8String,
      sc: Scratch): Int = {
    val keys = sc.keys
    val masks = sc.masks
    java.util.Arrays.fill(keys, 0L)
    val sb = s.numBytes()
    var i = 0
    var ib = 0
    while (i < n) {
      val len = UTF8String.numBytesForFirstByte(s.getByte(ib))
      val key = pack(s, ib, len, sb)
      val slot = insert(keys, key)
      if (keys(slot) == 0L) { keys(slot) = key; masks(slot) = 0L }
      masks(slot) |= 1L << i
      ib += len
      i += 1
    }
    var pv = -1L
    var mv = 0L
    var score = n
    val last = 1L << (n - 1)
    val tb = t.numBytes()
    var jb = 0
    while (jb < tb) {
      val len = UTF8String.numBytesForFirstByte(t.getByte(jb))
      val key = pack(t, jb, len, tb)
      val slot = insert(keys, key)
      val eq = if (keys(slot) == key) masks(slot) else 0L
      val xv = eq | mv
      val xh = (((eq & pv) + pv) ^ pv) | eq
      var ph = mv | ~(xh | pv)
      var mh = pv & xh
      if ((ph & last) != 0L) score += 1
      if ((mh & last) != 0L) score -= 1
      ph = (ph << 1) | 1L
      mh = mh << 1
      pv = mh | ~(xv | ph)
      mv = ph & xv
      jb += len
    }
    score
  }

  /** Packed char key: (claimed length << 56) | up-to-6 bytes little-
    * endian, CLAMPED at the string end (the one documented divergence
    * from the builtin's unclamped read — see the expression scaladoc).
    * A key of a real char is never 0 (length ≥ 1 occupies bit 56+). */
  private def pack(u: UTF8String, off: Int, len: Int, total: Int): Long = {
    val end = math.min(off + len, total)
    var k = len.toLong << 56
    var p = off
    var shift = 0
    while (p < end) {
      k |= (u.getByte(p) & 0xFFL) << shift
      shift += 8
      p += 1
    }
    k
  }

  /** Open-addressed probe over the 128-slot table (≤ 64 live entries →
    * load ≤ 0.5): the slot holding `key`, or the first empty slot. */
  private def insert(keys: Array[Long], key: Long): Int = {
    var slot = ((key * -7046029254386353131L) >>> 57).toInt
    while (keys(slot) != 0L && keys(slot) != key) slot = (slot + 1) & 127
    slot
  }
}
