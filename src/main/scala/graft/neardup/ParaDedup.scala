package graft.neardup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Paragraph-level exact deduplication (the CCNet/RefinedWeb recipe):
  * split every document into paragraphs, keep each distinct paragraph
  * ONLY in the document where it first appears (smallest (doc_id,
  * position)), drop every later occurrence, and reassemble the
  * survivors in their original order. This is the boilerplate killer of
  * web-corpus curation — headers, footers and nav text repeat across
  * millions of pages, and document-level dedup (x01/x03) never sees
  * them because the surrounding text differs.
  *
  * The reference engine has no sub-document operator; this belongs to
  * the training-data extension surface (SURVEY §2-ext), alongside
  * exact/minhash/semantic dedup.
  *
  * Scale design: the keep/drop decision is an aggregate-then-join on
  * the paragraph's md5, NOT a `row_number() OVER (PARTITION BY para)`
  * window. `min(struct(id, pos))` is map-side combinable, so a
  * boilerplate paragraph occurring on millions of pages partially
  * reduces inside every map task; the window formulation would sort the
  * whole mega-key in one reducer, and AQE splits skewed JOIN keys but
  * not skewed window partitions. The winners aggregate and the
  * winners join share the pkey hash-partitioning (one exchange is
  * reused), and shuffle rows carry the fixed 8-byte 60-bit md5 base —
  * the paragraph text itself is only shuffled once, into the final
  * per-document rebuild. Three linear exchanges total, no driver-side
  * state.
  */
object ParaDedup {

  /** The exploded paragraph frame: (id, pos, para, pkey). `textCol` is
    * split on the `sep` regex; whitespace-only segments are dropped but
    * `pos` keeps the ORIGINAL split index, so reassembly preserves the
    * survivors' relative order. `pkey` = the 60-bit portable md5 base
    * of the paragraph ([[NearDup.portableBase]] — 8 fixed bytes where
    * the r14 spelling shuffled the 32-hex md5 string): dedup identity
    * is a hash of the exact paragraph bytes — collisions (birthday
    * bound ~n²/2^61 over distinct paragraphs) are the accepted trade of
    * every production paragraph-dedup (CCNet keys on a SHA-1 prefix),
    * and the oracle replays the identical hash.
    */
  def paragraphs(df: DataFrame, idCol: String, textCol: String,
                 sep: String = "\n"): DataFrame =
    df.select(col(idCol).as("id"),
        posexplode(split(col(textCol), sep)).as(Seq("pos", "para")))
      .filter(trim(col("para")) =!= "")
      .withColumn("pkey", NearDup.portableBase(col("para")))

  /** Per-document dedup report + rebuilt text, TOTAL over the input
    * (`idCol` must be a key): doc_id, n_para (non-empty paragraphs in),
    * n_kept (first-occurrence survivors), text_dedup (survivors joined
    * by `glue` in original order; '' when nothing survives — including
    * documents whose every paragraph first appeared elsewhere).
    */
  def dedupParagraphs(df: DataFrame, idCol: String, textCol: String,
                      sep: String = "\n", glue: String = "\n"): DataFrame = {
    val paras = paragraphs(df, idCol, textCol, sep)
    // first occurrence per paragraph: map-side-combinable min, joined
    // back on pkey alone so the aggregate's exchange is reusable and a
    // skewed paragraph key stays an AQE-splittable JOIN key
    val winners = paras.groupBy("pkey")
      .agg(min(struct(col("id"), col("pos"))).as("w"))
    val flagged = paras.join(winners, Seq("pkey"))
      .withColumn("kept",
        col("id") === col("w.id") && col("pos") === col("w.pos"))
    rebuild(df, idCol, flagged, "text_dedup", glue)
  }

  /** Boilerplate paragraph removal (the C4/RefinedWeb cross-document
    * rule, the other half of [[dedupParagraphs]]'s keep-first policy):
    * a paragraph appearing in MORE than `maxDocFreq` distinct documents
    * is dropped from EVERY document — the first copy too, because a nav
    * header on a million pages is noise in all of them, not content in
    * the first. Paragraphs at or under the threshold are kept wherever
    * they occur (within-document repeats of a rare paragraph survive:
    * the frequency is per-document, not per-occurrence).
    *
    * Scale: same three linear exchanges as [[dedupParagraphs]], with
    * the winners aggregate replaced by a per-pkey distinct-id count —
    * `count(DISTINCT id)` over (pkey, id) partially deduplicates
    * map-side, so the million-page header reduces inside every task.
    */
  def removeBoilerplate(df: DataFrame, idCol: String, textCol: String,
                        maxDocFreq: Int = 1, sep: String = "\n",
                        glue: String = "\n"): DataFrame = {
    val paras = paragraphs(df, idCol, textCol, sep)
    val dfreq = paras.groupBy("pkey")
      .agg(countDistinct(col("id")).as("df"))
    val flagged = paras.join(dfreq, Seq("pkey"))
      .withColumn("kept", col("df") <= maxDocFreq)
    rebuild(df, idCol, flagged, "text_clean", glue)
  }

  /** Shared per-document reassembly: count paragraphs in/kept and glue
    * the survivors back in original `pos` order, LEFT-joined to the
    * full input so paragraph-less documents stay in the output.
    */
  private def rebuild(df: DataFrame, idCol: String, flagged: DataFrame,
                      outCol: String, glue: String): DataFrame = {
    val perDoc = flagged.groupBy("id")
      .agg(count(lit(1)).as("n_para"),
        count(when(col("kept"), 1)).as("n_kept"),
        concat_ws(glue, transform(
          array_sort(collect_list(when(col("kept"),
            struct(col("pos"), col("para"))))),
          s => s.getField("para"))).as(outCol))
    df.select(col(idCol).as("doc_id"))
      .join(perDoc.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_para"), lit(0L)).as("n_para"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col(outCol), lit("")).as(outCol))
  }
}
