package graft.ops.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * All operators are pure native-expression DataFrame code (no UDFs): the
  * per-document signature math runs inside whole-stage codegen over the
  * token array of each row — no explode, no per-token shuffle.
  *
  * Scale design (100 TB of documents):
  *  - signatures are computed map-side; the only shuffles are the final
  *    group-by / self-join on *short* keys (hash / band signature), never on
  *    document text.
  *  - LSH banding turns the quadratic all-pairs problem into a per-bucket
  *    join: candidate pairs are generated only for documents agreeing on at
  *    least one band. Degenerate buckets (e.g. empty documents) are the
  *    classic skew hazard — cap or salt them (see [[lshCandidatePairs]]).
  *  - exact dedup hashes the text (fixed-width key) instead of grouping by
  *    the full text column, so the shuffle moves 32-byte keys, not bodies.
  */
object Dedup {

  /** Whitespace tokens of a text column. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Character n-gram shingles: the classic MinHash input unit for
    * near-dup detection that must survive tokenization differences. */
  def shingles(text: Column, n: Int): Column =
    transform(sequence(lit(1), length(text) - (n - 1)),
      i => text.substr(i, lit(n)))

  /** Exact-duplicate groups: one row per distinct content hash with the
    * surviving (minimum) id and the duplicate count. */
  def exactDupGroups(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    df.groupBy(md5(textCol).as("content_hash"))
      .agg(min(idCol).as("keeper"), count(lit(1)).as("n_docs"))

  /** One MinHash value: the minimum over tokens of a seeded deterministic
    * hash. The "hash family" is md5 of `seed:token`, compared
    * lexicographically on the hex string — deterministic across engines and
    * platforms (no JVM hashCode). */
  def minhash(tokensCol: Column, seed: Int): Column =
    array_min(transform(tokensCol, w => md5(concat(lit(s"$seed:"), w))))

  /** Two MinHash values from ONE md5 per element: the 64-bit hex halves of
    * a single digest act as two independent hash functions, and both minima
    * are tracked in a single fold — one interpreted pass, one md5 per
    * element (HOFs don't codegen; see [[simhash]]). Returns
    * `struct<a: string, b: string>`. */
  def minhashPair(elements: Column): Column = {
    val hashes = transform(elements, x => md5(x))
    aggregate(hashes,
      struct(lit("~").as("a"), lit("~").as("b")), // '~' sorts after hex digits
      (acc, h) => struct(
        least(acc.getField("a"), substring(h, 1, 16)).as("a"),
        least(acc.getField("b"), substring(h, 17, 16)).as("b")))
  }

  /** MinHash signature columns `mh0..mh{n-1}` for each document. */
  def withMinhashSignature(df: DataFrame, textCol: Column, numHashes: Int): DataFrame = {
    val toks = tokens(textCol)
    (0 until numHashes).foldLeft(df) { (acc, i) =>
      acc.withColumn(s"mh$i", minhash(toks, i))
    }
  }

  /** LSH banding: documents whose signature agrees on a whole band (here:
    * hashes [bandStart, bandStart+bandSize)) are candidate duplicates.
    *
    * The self-join shuffles only `(band_key, id)` pairs. `id1 < id2`
    * dedups the symmetric pairs. At scale, add `.groupBy(band).count` first
    * and filter out pathological buckets (all-identical boilerplate) before
    * joining — the classic LSH skew guard.
    */
  def lshCandidatePairs(
      signatures: DataFrame,
      idCol: String,
      bandCols: Seq[String]): DataFrame =
    lshCandidatePairsMultiBand(signatures, idCol, Seq(bandCols))

  /** Multi-band LSH: a pair is a candidate if it agrees on ANY band. With a
    * single band each document sits in exactly one bucket, so pairs are
    * unique by construction and the cross-band `distinct` (a full shuffle
    * of the pair set — the most expensive step) is skipped. */
  def lshCandidatePairsMultiBand(
      signatures: DataFrame,
      idCol: String,
      bands: Seq[Seq[String]]): DataFrame = {
    val perBand = bands.map { bandCols =>
      val key = md5(concat_ws("|", bandCols.map(col): _*))
      val l = signatures.select(key.as("band"), col(idCol).as("id_a"))
      val r = signatures.select(key.as("band"), col(idCol).as("id_b"))
      l.join(r, Seq("band"))
        .where(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
    }
    val all = perBand.reduce(_.unionByName(_))
    if (bands.size > 1) all.distinct() else all
  }

  /** 32-bit SimHash from token hashes: per bit position, the majority vote
    * of all token hashes' bits, weighted +1/-1.
    *
    * `conv(md5-prefix, 16, 10)` gives a deterministic unsigned 32-bit token
    * hash identical across engines.
    *
    * Perf note: higher-order array functions are *interpreted* (not
    * codegen'd), so the naive form — 32 independent per-bit aggregates —
    * re-evaluates the md5 token-hash array 32 times. This version folds the
    * token array ONCE with a 32-wide vote-array accumulator (`zip_with`
    * against constant bit masks), then reduces votes to the signature —
    * md5 runs once per token, a ~10x win measured at sf0.1. */
  def simhash(tokensCol: Column, bits: Int = 32): Column = {
    val masks = array((0 until bits).map(j => lit(1L << j)): _*)
    val hashes = transform(tokensCol, w => conv(substring(md5(w), 1, 8), 16, 10).cast("long"))
    val votes = aggregate(
      hashes,
      array_repeat(lit(0L), bits),
      (acc, h) => zip_with(acc, masks,
        (a, m) => a + when(h.bitwiseAND(m) =!= 0, 1L).otherwise(-1L)))
    aggregate(
      zip_with(votes, masks, (v, m) => when(v > 0, m).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
  }

  /** Token-set Jaccard similarity of two text columns: |A ∩ B| / |A ∪ B|
    * over distinct tokens. Integer set sizes divided as doubles —
    * bit-identical across engines. */
  def jaccard(tokensA: Column, tokensB: Column): Column =
    jaccardPreDistinct(array_distinct(tokensA), array_distinct(tokensB))

  /** [[jaccard]] for inputs already deduplicated — the form to use in pair
    * joins: distinct the token arrays once per *document* (below the join),
    * not once per pair, and derive |A ∪ B| as |A| + |B| - |A ∩ B| instead
    * of materializing the union array per pair. */
  def jaccardPreDistinct(setA: Column, setB: Column): Column = {
    val inter = size(array_intersect(setA, setB))
    inter.cast("double") / (size(setA) + size(setB) - inter).cast("double")
  }
}
