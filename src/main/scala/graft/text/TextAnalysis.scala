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

  /** Character-n-gram language ID: per-language trigram profiles are
    * TRAINED IN-PLAN from a labeled corpus (top `profileSize` trigrams
    * per language by frequency), then each document is scored by how
    * many of its trigrams hit each profile, weighted by the trigram's
    * profile rank. Everything is relational — explode + groupBy + join —
    * so both training and inference scale with executors; the profile is
    * tiny (langs × profileSize) and broadcasts.
    *
    * Output: id, pred_lang, best_score. Ties break on language name.
    */
  def langIdNgram(df: DataFrame, idCol: String, textCol: String,
                  labelCol: String, n: Int = 3,
                  profileSize: Int = 200): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // substring with a column start position needs the SQL form
    val tri = df.select(col(idCol).as("id"), col(labelCol).as("lang"),
        lower(trim(col(textCol))).as("t"))
      .filter(length(col("t")) >= n)
      .select(col("id"), col("lang"),
        explode(expr(s"transform(sequence(1, length(t) - ${n - 1}), i -> substring(t, i, $n))"))
          .as("gram"))
    // unlabeled docs must not train a NULL-language profile
    val profile = tri.filter(col("lang").isNotNull)
      .groupBy("lang", "gram").agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("lang").orderBy(col("cnt").desc, col("gram").asc)))
      .filter(col("rnk") <= profileSize)
      .select(col("lang").as("p_lang"), col("gram"),
        (lit(profileSize + 1) - col("rnk")).as("weight"))
    // broadcast-join BEFORE distinct: the dedup shuffle then carries only
    // profile-hit grams (tiny) instead of every (doc, trigram) pair —
    // profile rows are unique per (lang, gram), so the reorder is exact
    val scores = tri.select("id", "gram")
      .join(broadcast(profile), Seq("gram"))
      .select("id", "gram", "p_lang", "weight").distinct()
      .groupBy("id", "p_lang").agg(sum("weight").as("score"))
    val w = Window.partitionBy("id").orderBy(col("score").desc, col("p_lang").asc)
    val best = scores.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("id"), col("p_lang").as("pred_lang"), col("score").as("best_score"))
    // every document gets a prediction: zero-profile-hit (or too-short)
    // docs classify as 'und' — a dedup/filter pipeline must not silently
    // drop them
    df.select(col(idCol).as("id")).distinct()
      .join(best, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("pred_lang"), lit("und")).as("pred_lang"),
        coalesce(col("best_score"), lit(0L)).as("best_score"))
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
