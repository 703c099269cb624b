package graft.ops.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: token counting, quality
  * scoring, language identification, and document fingerprinting.
  *
  * Everything is per-row native-expression math over the token array —
  * map-side only, no shuffle, full whole-stage codegen. At 100 TB these
  * operators are scan-bound, which is the best possible shape.
  */
object TextStats {

  /** Single shared tokenizer (see [[Dedup.tokens]] for the empty-text
    * quirk contract) — one definition so dedup and text-stats can never
    * tokenize differently. */
  def tokens(text: Column): Column = Dedup.tokens(text)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: runs of letters, runs of digits, and single
    * punctuation characters each count as one token (a cheap, deterministic
    * approximation of byte-pair-encoded token counts for budget planning).
    * Formulated as three `regexp_extract_all` counts — lookaround-free, so
    * the same regexes run on RE2-based engines. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+"), lit(0))) +
      size(regexp_extract_all(text, lit("[0-9]+"), lit(0))) +
      size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0)))

  /** Quality metrics: chars, tokens, avg token length, stopword ratio,
    * alphabetic ratio. Ratios are double divisions of exact ints —
    * bit-identical across engines. */
  def withQuality(df: DataFrame, textCol: Column, stopwords: Seq[String]): DataFrame = {
    val toks = tokens(textCol)
    val nTok = size(toks)
    val nStop = size(filter(toks, t => t.isin(stopwords: _*)))
    val nChar = length(textCol)
    val nAlpha = length(regexp_replace(textCol, "[^A-Za-z]", ""))
    // true mean token length: total non-whitespace chars / token count
    val nNonWs = length(regexp_replace(textCol, "\\s", ""))
    df.withColumn("n_chars_m", nChar.cast("long"))
      .withColumn("n_tokens", nTok.cast("long"))
      .withColumn("avg_token_len", nNonWs.cast("double") / nTok.cast("double"))
      .withColumn("stopword_ratio", nStop.cast("double") / nTok.cast("double"))
      .withColumn("alpha_ratio", nAlpha.cast("double") / nChar.cast("double"))
  }

  /** Per-language marker vocabularies for the n-gram/stopword language-ID
    * heuristic. Deliberately tiny — language ID at corpus scale is a
    * scan-bound scoring pass; swap in real profiles without changing the
    * plan shape. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "fr" -> Seq("le", "la", "de", "et", "est"))

  /** Score one marker set: the number of tokens in the set. */
  def markerScore(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers: _*)))

  /** Language-ID heuristic: argmax marker score, ties broken by marker-list
    * order, `und` when no marker hits. Pure `when` chain — one codegen
    * pass, no shuffle. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scored = langMarkers.map { case (code, markers) => (code, markerScore(toks, markers)) }
    // language i wins iff its score is strictly greater than every earlier
    // score and >= every later score (ties go to the earlier entry)
    scored.zipWithIndex.foldRight(lit("und"): Column) { case (((code, score), i), els) =>
      val beatsEarlier = scored.take(i).map { case (_, s) => score > s }
      val tiesLater = scored.drop(i + 1).map { case (_, s) => score >= s }
      val wins = (beatsEarlier ++ tiesLater :+ (score > 0)).reduce(_ && _)
      when(wins, code).otherwise(els)
    }
  }

  /** Order-independent document fingerprint: md5 of the sorted distinct
    * token list. Stable under token reordering — a bag-of-words content
    * address for fuzzy-dedup bookkeeping. */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Winnowing fingerprint set (sorted distinct window-min shingle
    * hashes): the substring-matching complement to [[fingerprint]] — any
    * two documents sharing >= w+k-1 consecutive characters share a value.
    * Codegen'd kernel; see [[graft.functions.WinnowFingerprintExpr]]. */
  def winnowFingerprint(text: Column, k: Int = 5, w: Int = 8): Column =
    graft.functions.WinnowFingerprintExpr.winnow(text, k, w)
}
