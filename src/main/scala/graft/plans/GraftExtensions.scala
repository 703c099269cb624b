package graft.plans

import graft.functions.{CleanTextExpr, DotProductExpr, ExtractDataTypeExpr, MisraGriesAgg, NgramRepExpr, SrpBucketExpr, TopKByKeyAgg, ShingleMinhashExpr, SimhashExpr, SortedIntersectCountExpr, TokenHashSetExpr, TokenMinhashExpr, TokenNgramHashExpr, WinnowFingerprintExpr}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** SparkSessionExtensions installer: makes graft's native expressions
  * available as SQL functions.
  *
  * Activate with either
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Evaluate a foldable integral argument (any of TINYINT..BIGINT) to an
    * Int, with clear errors for non-literals and NULL literals (a foldable
    * `CAST(NULL AS INT)` would otherwise unbox to a misleading 0). */
  private def intLiteral(e: Expression, what: String): Int = {
    val integral = e.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (!e.foldable || !integral)
      throw new IllegalArgumentException(s"$what must be an integer literal, got $e")
    e.eval() match {
      case null => throw new IllegalArgumentException(s"$what must not be null")
      case v: Number =>
        val l = v.longValue
        if (l < Int.MinValue || l > Int.MaxValue)
          throw new IllegalArgumentException(s"$what out of int range: $l")
        l.toInt
    }
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_extract_datatype"),
      new ExpressionInfo(
        classOf[ExtractDataTypeExpr].getName,
        null,
        "graft_extract_datatype",
        "graft_extract_datatype(o) - splits an RDF object into struct<v, t>",
        ""),
      (children: Seq[Expression]) =>
        ExtractDataTypeExpr(children.head)))

    ext.injectFunction((
      new FunctionIdentifier("graft_shingle_minhash"),
      new ExpressionInfo(
        classOf[ShingleMinhashExpr].getName,
        null,
        "graft_shingle_minhash",
        "graft_shingle_minhash(text, n) - MinHash pair struct<a, b> over n-char shingles",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_shingle_minhash(text, n) takes 2 arguments")
        ShingleMinhashExpr(children.head, intLiteral(children(1), "shingle size"))
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_token_minhash"),
      new ExpressionInfo(
        classOf[TokenMinhashExpr].getName,
        null,
        "graft_token_minhash",
        "graft_token_minhash(text, n) - array of n 32-hex MinHash values over whitespace tokens",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_token_minhash(text, n) takes 2 arguments")
        TokenMinhashExpr(children.head, intLiteral(children(1), "numHashes"))
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(
        classOf[SimhashExpr].getName,
        null,
        "graft_simhash",
        "graft_simhash(text[, bits]) - SimHash fingerprint of whitespace tokens",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 1 || children.size == 2,
          "graft_simhash(text[, bits]) takes 1 or 2 arguments")
        val bits = if (children.size == 2) intLiteral(children(1), "bits") else 32
        SimhashExpr(children.head, bits)
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_token_hash_set"),
      new ExpressionInfo(
        classOf[TokenHashSetExpr].getName,
        null,
        "graft_token_hash_set",
        "graft_token_hash_set(text) - distinct unsigned-32 token hashes, first-occurrence order",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_token_hash_set(text) takes 1 argument")
        TokenHashSetExpr(children.head)
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_trim_spans"),
      new ExpressionInfo(
        classOf[graft.functions.TrimSpansExpr].getName,
        null,
        "graft_trim_spans",
        "graft_trim_spans(text, spans) - tokens outside [span_start, span_end] position ranges, space-joined",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_trim_spans(text, spans) takes 2 arguments")
        graft.functions.TrimSpansExpr(children.head, children(1))
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_clean_text"),
      new ExpressionInfo(
        classOf[CleanTextExpr].getName,
        null,
        "graft_clean_text",
        "graft_clean_text(s) - Unicode NFC + control-character strip",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_clean_text(s) takes 1 argument")
        CleanTextExpr(children.head)
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_sorted_intersect_count"),
      new ExpressionInfo(
        classOf[SortedIntersectCountExpr].getName,
        null,
        "graft_sorted_intersect_count",
        "graft_sorted_intersect_count(a, b) - intersection size of two sorted long arrays",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_sorted_intersect_count(a, b) takes 2 arguments")
        SortedIntersectCountExpr(children.head, children(1))
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_token_ngram_hashes"),
      new ExpressionInfo(
        classOf[TokenNgramHashExpr].getName,
        null,
        "graft_token_ngram_hashes",
        "graft_token_ngram_hashes(text, n) - 60-bit hashes of whitespace-token n-grams",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_token_ngram_hashes(text, n) takes 2 arguments")
        TokenNgramHashExpr(children.head, intLiteral(children(1), "n"))
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_token_count"),
      new ExpressionInfo(
        classOf[graft.functions.TokenCountExpr].getName,
        null,
        "graft_token_count",
        "graft_token_count(text) - whitespace token count (split semantics)",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_token_count(text) takes 1 argument")
        graft.functions.TokenCountExpr(children.head)
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_alpha_count"),
      new ExpressionInfo(
        classOf[graft.functions.AlphaCountExpr].getName,
        null,
        "graft_alpha_count",
        "graft_alpha_count(s) - count of ASCII letters",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_alpha_count(s) takes 1 argument")
        graft.functions.AlphaCountExpr(children.head)
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(
        classOf[DotProductExpr].getName,
        null,
        "graft_dot",
        "graft_dot(a, b) - double dot product of two numeric arrays",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_dot(a, b) takes 2 arguments")
        DotProductExpr(children.head, children(1))
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_srp_bucket"),
      new ExpressionInfo(
        classOf[SrpBucketExpr].getName,
        null,
        "graft_srp_bucket",
        "graft_srp_bucket(vec, planes) - signed-random-projection bucket id " +
          "(null vec buckets to null here; the Scala entry point coalesces to 0)",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_srp_bucket(vec, planes) takes 2 arguments")
        SrpBucketExpr(children.head, intLiteral(children(1), "planes"))
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(
        classOf[WinnowFingerprintExpr].getName,
        null,
        "graft_winnow",
        "graft_winnow(text, k, w) - sorted distinct winnowing fingerprint hashes",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 3, "graft_winnow(text, k, w) takes 3 arguments")
        WinnowFingerprintExpr(children.head,
          intLiteral(children(1), "shingle size k"),
          intLiteral(children(2), "window size w"))
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_mg_candidates"),
      new ExpressionInfo(
        classOf[MisraGriesAgg].getName,
        null,
        "graft_mg_candidates",
        "graft_mg_candidates(token, k) - aggregate: Misra-Gries heavy-hitter " +
          "candidate tokens (superset of freq > 1/(k+1); exact-confirm downstream)",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_mg_candidates(token, k) takes 2 arguments")
        // the analyzer wraps a bare AggregateFunction in AggregateExpression
        MisraGriesAgg(children.head, intLiteral(children(1), "counter budget k"))
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_topk_by_key"),
      new ExpressionInfo(
        classOf[TopKByKeyAgg].getName,
        null,
        "graft_topk_by_key",
        "graft_topk_by_key(key, id, payload, k) - aggregate: exact k smallest " +
          "(key, id) entries with payload, as sorted array<struct<skey,id,weight>>",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 4, "graft_topk_by_key(key, id, payload, k) takes 4 arguments")
        TopKByKeyAgg(children(0), children(1), children(2), intLiteral(children(3), "k"))
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_ngram_rep"),
      new ExpressionInfo(
        classOf[NgramRepExpr].getName,
        null,
        "graft_ngram_rep",
        "graft_ngram_rep(text, n) - struct<top, dup>: top/duplicated n-gram " +
          "character fractions in ppm",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_ngram_rep(text, n) takes 2 arguments")
        NgramRepExpr(children.head, intLiteral(children(1), "n"))
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_token_stats"),
      new ExpressionInfo(
        classOf[graft.functions.TokenStatsExpr].getName,
        null,
        "graft_token_stats",
        "graft_token_stats(text) - struct<ntok, ndist, top>: whitespace " +
          "token count, distinct count, max token multiplicity",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_token_stats(text) takes 1 argument")
        graft.functions.TokenStatsExpr(children.head)
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_levenshtein"),
      new ExpressionInfo(
        classOf[graft.functions.LevenshteinBoundedExpr].getName,
        null,
        "graft_levenshtein",
        "graft_levenshtein(a, b[, maxDist]) - bit-parallel Myers levenshtein, " +
          "builtin-equal; with maxDist, -1 past the bound",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 2 || children.size == 3,
          "graft_levenshtein(a, b[, maxDist]) takes 2 or 3 arguments")
        val th = if (children.size == 3)
          Some(intLiteral(children(2), "maxDist")) else None
        graft.functions.LevenshteinBoundedExpr(children.head, children(1), th)
      }))
  }
}
