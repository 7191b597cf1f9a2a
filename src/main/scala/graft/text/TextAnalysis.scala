package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * language ID (stopword-hit heuristic), quality scoring, token counting
  * (whitespace + BPE-ish regex), and document fingerprinting.
  *
  * All operators are pure column expressions over the `documents` table —
  * codegen'd, shuffle-free, embarrassingly parallel: at 100 TB each is a
  * single map-only pass that scales linearly with executors.
  */
object TextAnalysis {

  /** Normalized whitespace tokens (empties dropped). */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => t =!= "")

  private val stop: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to"),
    "de" -> Seq("der", "die", "und", "das", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "y", "las", "una"))

  private def hits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Heuristic language ID: count stopword hits per language, argmax with
    * a fixed priority order (en > de > fr > es > unknown) on ties/zero.
    * Deterministic and ANSI-SQL-expressible so the DuckDB oracle can
    * replicate it exactly.
    */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = tokens(col(textCol))
    val en = hits(t, stop("en")); val de = hits(t, stop("de"))
    val fr = hits(t, stop("fr")); val es = hits(t, stop("es"))
    val best = greatest(en, de, fr, es)
    df.select(
      col(idCol),
      en.as("en_hits"), de.as("de_hits"), fr.as("fr_hits"), es.as("es_hits"),
      when(best === 0, "und")
        .when(en === best, "en").when(de === best, "de")
        .when(fr === best, "fr").otherwise("es").as("pred_lang"))
  }

  /** Quality metrics: token count, char length, mean token length,
    * punctuation ratio, stopword ratio, and a coarse quality bucket.
    */
  def quality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val txt = col(textCol)
    val t = tokens(txt)
    val nTok = size(t)
    val nChar = length(txt)
    val nPunct = length(regexp_replace(txt, "[^.,!?;:]", ""))
    val nStop = hits(t, stop.values.flatten.toSeq.distinct.sorted)
    df.select(
      col(idCol),
      nTok.as("n_tokens"),
      nChar.as("len_chars"),
      round(nChar.cast("double") / greatest(nTok, lit(1)), 3).as("chars_per_token"),
      round(nPunct.cast("double") / greatest(nChar, lit(1)), 4).as("punct_ratio"),
      round(nStop.cast("double") / greatest(nTok, lit(1)), 4).as("stopword_ratio"),
      when(nTok < 5, "too_short")
        .when(nPunct.cast("double") / greatest(nChar, lit(1)) > lit(0.2), "punct_heavy")
        .otherwise("ok").as("quality_bucket"))
  }

  /** Token counting two ways: whitespace tokens and a BPE-ish regex
    * tokenizer (letter runs / digit runs / single symbols) — the usual
    * pretraining-corpus "token budget" estimators.
    */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val txt = col(textCol)
    df.select(
      col(idCol),
      size(tokens(txt)).as("ws_tokens"),
      size(regexp_extract_all(txt, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
        .as("bpe_tokens"))
  }

  /** Content fingerprint: md5 of whitespace-normalized, lowercased text —
    * the canonical-form key used for exact dedup at corpus scale.
    */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      md5(regexp_replace(lower(trim(col(textCol))), "\\s+", " ")).as("fingerprint"))

  /** Rolling polynomial hash over tokens (Rabin-Karp style). Modulus
    * 1e9+7 keeps every intermediate ≪ Long.Max (ANSI-overflow-safe:
    * acc < 1e9, token term < 2^31, acc·131 + term < 1.4e11). Not
    * ANSI-SQL-expressible in the oracle (xxhash64; driver records a
    * rows-only check); used as the shift-tolerant fingerprint variant.
    */
  def rollingHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val m = 1000000007L
    val t = tokens(col(textCol))
    val h = aggregate(
      t,
      lit(104729L),
      (acc, tok) => pmod(acc * lit(131L) + pmod(xxhash64(tok), lit(m)), lit(m)))
    df.select(col(idCol), h.as("rolling_hash"))
  }
}
