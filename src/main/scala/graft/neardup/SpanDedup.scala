package graft.neardup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact duplicated-SPAN removal — the acting counterpart of
  * [[NearDup.dupGramProfile]]'s measurement ("Deduplicating Training
  * Data Makes Language Models Better", Lee et al. 2022: substrings
  * repeated verbatim across a corpus are memorization fuel; the paper's
  * ExactSubstr dedup cuts every repeated span, not whole documents).
  * A token position is COVERED when any word k-gram starting within the
  * previous k positions occurs more than once in the corpus (counting
  * every occurrence, so in-document repetition counts too — same rule
  * as the suffix-array scan); covered tokens are removed from every
  * document and the survivors are rejoined in order.
  *
  * Two deliberate deviations from the paper's suffix-array spelling,
  * both for distributability (documented, not accidental):
  *
  *  - Fixed gram width k instead of "any substring ≥ 50 tokens": a
  *    span of ≥ k repeated tokens is exactly a run of ≥ 1 repeated
  *    k-grams, so coverage by duplicated k-grams equals the paper's
  *    criterion at threshold k. A suffix array finds VARIABLE-length
  *    matches but needs a global sort of every suffix; the k-gram
  *    relational form is three linear exchanges and shuffles only
  *    fixed-width keys.
  *  - Every copy is cut (no "keep one" winner): the repeated span is
  *    boilerplate in all its hosts — the same every-copy rule as
  *    [[ParaDedup.removeBoilerplate]], and the choice that keeps the
  *    operator a pure per-position predicate (a keep-one rule would
  *    need a global winner election per overlapping gram chain, which
  *    no longer decomposes relationally).
  *
  * Scale shape: gram-frequency aggregate (map-side combinable — a
  * million-page boilerplate gram partially reduces in every task),
  * frequency join back on the gram key (AQE-splittable), covered
  * positions exploded from dup starts (bounded by k · dup-gram
  * occurrences), and one per-doc rebuild — all linear, no suffix array
  * materialized, nothing quadratic in corpus size. Output text is in
  * the normalized token space (lowercased, whitespace-collapsed), the
  * same space every downstream gram/tokenizer operator reads.
  *
  * The gram identity shuffled through the aggregate and the frequency
  * join is NOT the k-word string but its 60-bit portable md5 base
  * ([[NearDup.portableBase]] — 8 fixed bytes instead of ~60 text bytes
  * at k=8 realistic English): the gram string is built and hashed
  * map-side inside the explode projection and never leaves the task.
  * Round 14 measured the string-keyed spelling as the engine's binding
  * single-node resource (the v2-5M corpus builds died filling ~75 GB
  * of shuffle scratch with ~2.5B ~60-byte gram rows); the fingerprint
  * cuts that byte mass ~5×. Collisions (birthday bound ~n²/2^61: ~3
  * expected at 2.5B distinct grams) can only mark a unique gram as
  * duplicated — the same accepted trade as [[ParaDedup]]'s md5 pkey —
  * and the DuckDB oracle replays the identical hash, so cross-engine
  * equality is unaffected by construction.
  */
object SpanDedup {

  /** Per-document span-removal report, TOTAL over the input (`idCol`
    * must be a key): (doc_id, n_tokens, n_removed, text_clean) —
    * `n_removed` counts covered token positions, `text_clean` is the
    * surviving tokens rejoined by `glue` in original order ('' when
    * everything was cut; docs shorter than k tokens pass through
    * whole, normalized).
    */
  def removeDuplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                            k: Int = 8, glue: String = " "): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      graft.text.TextAnalysis.tokens(col(textCol)).as("t"))
    // positioned (non-distinct) gram frame: (id, gpos, gk) — unlike
    // NearDup.shingles, every occurrence keeps its start position; the
    // gram string collapses to its 60-bit portable base INSIDE the
    // projection, so the shuffle rows are fixed-width
    val grams = toks.filter(size(col("t")) >= k)
      .select(col("id"), explode(transform(
        sequence(lit(1), size(col("t")) - (k - 1)),
        i => struct(i.as("gpos"),
          concat_ws(" ", slice(col("t"), i, lit(k))).as("gram")))).as("g"))
      .select(col("id"), col("g.gpos"),
        NearDup.portableBase(col("g.gram")).as("gk"))
    // corpus-wide occurrence count (NOT distinct-doc df): >= 2 marks a
    // verbatim repeat anywhere, in-document repeats included
    val dup = grams.groupBy("gk").agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= 2)
    // covered token positions: each dup start g covers [g, g+k-1] —
    // bounded by k rows per dup-gram occurrence. collect_set both
    // DEDUPLICATES and aggregates the per-doc covered set in one
    // exchange (a separate distinct + count + anti-join spelling was
    // the r14 shape — see the rebuild note below)
    val covSet = grams.join(dup, Seq("gk"))
      .select(col("id"), explode(
        sequence(col("gpos"), col("gpos") + (k - 1))).as("p"))
      .groupBy("id").agg(collect_set(col("p")).as("cov"))
    // Rebuild by ARRAY complement, not by re-exploding tokens: the r14
    // spelling posexploded every token into (id, p, tok) rows and ran
    // them through an anti-join plus an ordered collect_list — three
    // corpus-token-sized exchanges carrying token strings (measured as
    // the residual spill mass once the gram keys were fingerprinted:
    // ~1e9 rows at 5M realistic docs). Here the covered set rides ONE
    // fixed-width (id, int-array) aggregate, joins the token frame on
    // the doc key, and the survivor text is rebuilt map-side:
    // array_except(sequence(1, n), cov) keeps ascending order (the
    // left array's), element_at recovers each surviving token. The
    // token text therefore crosses exactly one exchange (the id join),
    // as a whole array per doc.
    val out = toks
      .join(covSet, Seq("id"), "left")
      .select(col("id").as("doc_id"),
        size(col("t")).cast("long").as("n_tokens"),
        // n_removed is branched on cov's nullness, NOT on
        // coalesce(size(cov), 0): size(NULL) is NULL only under ANSI
        // semantics (Spark 4 default) — with legacy sizeOfNull it is -1,
        // which coalesce would pass through, silently reporting -1 for
        // every clean doc. The when-branch is total under both settings.
        when(col("cov").isNull, lit(0L))
          .otherwise(size(col("cov")).cast("long")).as("n_removed"),
        when(col("cov").isNull, concat_ws(glue, col("t")))
          .otherwise(concat_ws(glue,
            transform(
              array_except(sequence(lit(1), size(col("t"))), col("cov")),
              p => element_at(col("t"), p))))
          .as("text_clean"))
    out
  }
}
