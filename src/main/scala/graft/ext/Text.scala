package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting.
  *
  * All pure `Column` expressions (codegen'd, no UDFs) so they run
  * inside whole-stage codegen over a 100 TB `documents` scan. North-star
  * extension beyond the reference's surface (SURVEY.md §1.1 note).
  */
object Text {

  /** Whitespace tokens of the trimmed text. Empty text → [""] — callers
    * guard with `nullif`-style checks where it matters.
    */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish regex token count: alphanumeric runs or single non-space
    * symbols — a deterministic proxy for subword tokenizers. RE2-safe
    * pattern (no lookaround) so the oracle can mirror it.
    */
  def regexTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  def avgTokenLength(c: Column): Column = {
    val t = tokens(c)
    aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") / size(t)
  }

  /** Fraction of characters that are not alphanumeric/space. */
  def punctRatio(c: Column): Column =
    (length(c) - length(regexp_replace(c, "[^A-Za-z0-9 ]", ""))).cast("double") /
      greatest(length(c), lit(1)).cast("double")

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(c: Column, stopwords: Seq[String] = defaultStopwords): Column = {
    val t = tokens(c)
    val stops = array(stopwords.map(lit): _*)
    size(filter(t, x => array_contains(stops, x))).cast("double") /
      greatest(size(t), lit(1)).cast("double")
  }

  /** Composite quality score in [0,1]: length band + low punctuation +
    * moderate stopword presence — the shape of heuristic quality
    * filters used for web-scale corpus cleaning.
    */
  def qualityScore(c: Column, stopwords: Seq[String] = defaultStopwords): Column = {
    val nTok = tokenCount(c).cast("double")
    val lengthScore = least(nTok / 50.0, lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(c) * 5.0, lit(1.0))
    val stopScore = least(stopwordRatio(c, stopwords) * 5.0, lit(1.0))
    round((lengthScore + punctScore + stopScore) / 3.0, 4)
  }

  /** Language-ID marker words, chosen per supported language. Scores =
    * marker-token hits; argmax with alphabetical tie-break. N-gram/
    * marker heuristics are the standard cheap language ID at corpus
    * scale (fastText-class models plug in the same way).
    */
  val defaultLangMarkers: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "nicht"),
    "en" -> Seq("the", "and", "of", "is", "a"),
    "es" -> Seq("el", "la", "los", "que", "de"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  def langScore(c: Column, markers: Seq[String]): Column = {
    val t = tokens(lower(c))
    val m = array(markers.map(lit): _*)
    size(filter(t, x => array_contains(m, x)))
  }

  /** Predicted language: highest marker score, ties broken by
    * alphabetical language code (deterministic, oracle-expressible as a
    * CASE chain in priority order).
    */
  def langId(c: Column, markers: Map[String, Seq[String]] = defaultLangMarkers): Column = {
    val ordered = markers.toSeq.sortBy(_._1)
    val scores = ordered.map { case (lang, ms) => lang -> langScore(c, ms) }
    val maxScore = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("unknown")) { case ((lang, s), acc) =>
      when(s === maxScore && maxScore > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Document fingerprint: hash of the case/whitespace-normalized text.
    * Content-addressed identity for exact dedup across shards — md5 so
    * the fingerprint is portable across engines.
    */
  def fingerprint(c: Column): Column =
    md5(regexp_replace(lower(trim(c)), "\\s+", " "))
}
