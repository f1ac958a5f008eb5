package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * column expressions over the token array — one scan, no shuffle.
  */
object TextAnalysis {

  /** Tiny per-language stopword inventories for the n-gram/stopword
    * heuristic. Real deployments plug fastText-style models in via the
    * same Column seam; the heuristic is the dependency-free baseline. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "nicht", "mit", "ist", "ein", "zu"),
    "es" -> Seq("el", "la", "los", "de", "que", "y", "es", "un", "en", "no"),
    "fr" -> Seq("le", "la", "les", "et", "des", "un", "est", "que", "dans"))

  /** Count of tokens that appear in `words` (occurrences, not
    * distinct). */
  def stopwordHits(toks: Column, words: Seq[String]): Column = {
    val w = array(words.map(lit): _*)
    size(filter(toks, t => array_contains(w, t)))
  }

  /** Language-ID heuristic: argmax of stopword hit counts with a
    * fixed preference order (en > de > es > fr), 'und' (undetermined)
    * when no stopword hits at all. Deterministic — the same CASE
    * chain runs in the oracle. */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val s = Seq("en", "de", "es", "fr").map(l => l -> stopwordHits(toks, stopwords(l))).toMap
    when(s("en") >= s("de") && s("en") >= s("es") && s("en") >= s("fr") && s("en") > 0, "en")
      .when(s("de") >= s("es") && s("de") >= s("fr") && s("de") > 0, "de")
      .when(s("es") >= s("fr") && s("es") > 0, "es")
      .when(s("fr") > 0, "fr")
      .otherwise("und")
  }

  /** Quality components: every count exact-integer, every ratio a
    * single int/int double division — bit-identical across engines. */
  def qualityComponents(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nChars = length(text)
    val nToks = size(toks)
    val punct = regexp_count(text, lit("[.,!?;:]"))
    val digits = regexp_count(text, lit("[0-9]"))
    val stops = stopwordHits(tokens(lower(text)), stopwords("en"))
    Seq(
      "n_chars" -> nChars,
      "n_tokens" -> nToks,
      "punct_ratio" -> when(nChars === 0, 0.0)
        .otherwise(punct.cast("double") / nChars.cast("double")),
      "digit_ratio" -> when(nChars === 0, 0.0)
        .otherwise(digits.cast("double") / nChars.cast("double")),
      "stopword_ratio" -> when(nToks === 0, 0.0)
        .otherwise(stops.cast("double") / nToks.cast("double")),
      "mean_token_len" -> when(nToks === 0, 0.0)
        .otherwise(aggregate(toks, lit(0L), (acc, t) => acc + length(t))
          .cast("double") / nToks.cast("double")))
  }

  /** Composite quality score in [0,1]: rewards reasonable length and
    * stopword density, penalizes digit soup. Weighted per-row double
    * math only. */
  def qualityScore(text: Column): Column = {
    val c = qualityComponents(text).toMap
    val lengthTerm = least(c("n_tokens").cast("double") / 100.0, lit(1.0))
    lit(0.4) * lengthTerm +
      lit(0.3) * least(c("stopword_ratio") * 5.0, lit(1.0)) +
      lit(0.3) * (lit(1.0) - least(c("digit_ratio") * 10.0, lit(1.0)))
  }

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: alpha runs capped at 4 chars count per
    * cap, digit runs count per 3, other non-space chars 1 each —
    * a cheap regex proxy for BPE token budgeting. */
  def tokenCountBpe(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]{1,4}|[0-9]{1,3}|[^A-Za-z0-9\\s]"))

  /** Normalized md5 fingerprint (exact-dedup key). */
  def docFingerprint(text: Column): Column = fingerprint(text)

  /** Order-sensitive rolling fingerprint over tokens. */
  def docRollingFingerprint(text: Column): Column =
    rollingFingerprint(tokens(text))
}
