package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document unigram-rarity fold against a COLLECTED top-V model —
  * `struct<rsum: bigint, ntok: bigint>` in ONE byte walk: the sum over the
  * document's whitespace tokens of the model's precomputed per-token
  * rarity (out-of-vocabulary tokens take `oov` = `scale * n_total`, the
  * maximum), plus the token count.
  *
  * This is the scoring half of [[graft.ops.ext.TextStats.unigramRarity]]
  * with the model side hoisted to a driver-collected literal (the
  * MODEL-BOUNDED rule: the top-V vocabulary is ≤ `topV` rows by
  * construction — q170's typedLit precedent). The interpreted shape it
  * replaces re-exploded the whole corpus a second time, broadcast-joined
  * the top-V counts onto every token row, partial-aggregated by doc id,
  * and joined the sums back — this kernel computes the identical integer
  * per row in the same projection as the other scan signals, so the
  * rarity-enabled quality gate costs ONE model job + ONE fused scan
  * instead of four source-gated corpus passes (round-21 measurement).
  *
  * Exactness contract: tokenization is the shared
  * [[TokenHash.forEachToken]] split contract (`split(trim(text), "\s+")`
  * byte-for-byte, U+FFFD normalization, the `[""]` empty-text quirk);
  * per-token values are the model's driver-side `(scale * n_total) div c`
  * longs (non-negative `/` = Spark `div`); the row sum uses
  * `Math.addExact`, so overflow throws like the ANSI `sum` aggregate it
  * replaces. Null text yields a null struct (the old shape's "no rarity
  * row" — callers coalesce, exactly as they coalesced the left join).
  *
  * The model ships with the expression (≤ topV entries); each executor
  * builds the open-addressed probe table once per expression instance
  * (transient lazy), and rows pay one FNV hash + byte-slice probe per
  * token — no join, no exchange, no second corpus pass. */
case class TokenRarityExpr(child: Expression, model: Map[String, Long], oov: Long)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)

  override def dataType: DataType = StructType(Seq(
    StructField("rsum", LongType, nullable = false),
    StructField("ntok", LongType, nullable = false)))

  @transient private lazy val table: TokenRarity.Table =
    new TokenRarity.Table(model, oov)

  override protected def nullSafeEval(input: Any): Any =
    table.score(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rarityTable", table,
      classOf[TokenRarity.Table].getName)
    defineCodeGen(ctx, ev, c => s"$ref.score($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_token_rarity"
}

object TokenRarityExpr {
  /** Column-level entry point: `token_rarity($"text", model, oov)`. */
  def token_rarity(c: Column, model: Map[String, Long], oov: Long): Column =
    GraftColumnBridge.column(
      TokenRarityExpr(GraftColumnBridge.expression(c), model, oov))
}

object TokenRarity {

  /** Serializable probe table over the collected model: compact key-byte /
    * value arrays cross the wire; the open-addressed index (power-of-two
    * cap, load ≤ 0.5, FNV-1a hash + byte equality — the
    * [[TokenHash]] StatsScratch recipe) is rebuilt lazily per JVM. */
  final class Table(model: Map[String, Long], val oov: Long)
      extends Serializable {

    // UTF-8 bytes of each model token: driver strings are valid UTF-16,
    // so getBytes matches the kernel's U+FFFD-normalized byte stream
    private val keyBytes: Array[Array[Byte]] =
      model.keysIterator.map(_.getBytes("UTF-8")).toArray
    private val values: Array[Long] = model.valuesIterator.toArray

    private def fnv(bytes: Array[Byte], from: Int, until: Int): Int = {
      var h = 0x811c9dc5
      var i = from
      while (i < until) { h = (h ^ (bytes(i) & 0xff)) * 0x01000193; i += 1 }
      h
    }

    // slot -> index into keyBytes/values, -1 empty
    @transient private lazy val (cap: Int, slots: Array[Int], hashes: Array[Int]) = {
      var c = 16
      while (c < keyBytes.length * 2) c <<= 1
      val sl = new Array[Int](c)
      java.util.Arrays.fill(sl, -1)
      val hs = new Array[Int](c)
      var i = 0
      while (i < keyBytes.length) {
        val kb = keyBytes(i)
        val h = fnv(kb, 0, kb.length)
        var s = h & (c - 1)
        // model keys are distinct by construction (a Map); probe to the
        // first free slot
        while (sl(s) >= 0) s = (s + 1) & (c - 1)
        sl(s) = i
        hs(s) = h
        i += 1
      }
      (c, sl, hs)
    }

    private def lookup(bytes: Array[Byte], from: Int, until: Int): Long = {
      val h = fnv(bytes, from, until)
      var s = h & (cap - 1)
      while (slots(s) >= 0) {
        if (hashes(s) == h) {
          val kb = keyBytes(slots(s))
          if (kb.length == until - from) {
            var i = 0
            while (i < kb.length && kb(i) == bytes(from + i)) i += 1
            if (i == kb.length) return values(slots(s))
          }
        }
        s = (s + 1) & (cap - 1)
      }
      oov
    }

    def score(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
      val bytes = TokenHash.normalizedBytes(text)
      var rsum = 0L
      var ntok = 0L
      TokenHash.forEachToken(bytes) { (from, until) =>
        ntok += 1L
        rsum = Math.addExact(rsum, lookup(bytes, from, until))
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](rsum, ntok))
    }
  }
}
