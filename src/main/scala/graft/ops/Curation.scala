package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** End-to-end corpus curation: the composed pipeline a training-data job
  * actually runs — quality gate → deterministic sampling → exact dedup →
  * per-source cap — built entirely from the individually-oracled operators
  * (TextOps / Sampling / Dedup), so the composite is deterministic and
  * SQL-replayable end-to-end.
  *
  * Stage order is chosen for scale, not narration:
  *  1. quality gate + hash sample FIRST — both are pure codegen'd filters
  *     (zero shuffle), so every row they kill never reaches a shuffle.
  *     Sampling commutes with exact dedup EXACTLY: duplicates share the
  *     text the hash decides on, so "sample then dedup" keeps the same
  *     survivors as "dedup then sample" — we take the cheap order for free;
  *  2. exact dedup — one fingerprint-key shuffle, WindowGroupLimit top-1;
  *  3. per-source cap LAST — caps apply to the cleaned, deduped corpus
  *     (capping raw rows would let duplicates consume a domain's budget).
  */
object Curation {

  /** @param minTokens      inclusive whitespace-token floor (quality gate)
    * @param maxDupLineFrac inclusive ceiling on duplicate-line fraction
    * @param sampleRate     content-hash keep rate (1.0 = keep all)
    * @param capPerSource   max surviving rows per `sourceCol` value
    */
  def curate(docs: DataFrame, idCol: String, textCol: String, sourceCol: String,
             minTokens: Int, maxDupLineFrac: Double, sampleRate: Double,
             capPerSource: Int, salt: String = ""): DataFrame = {
    val text: Column = F.col(textCol)
    val gated = TextOps.withRepetition(docs, textCol)
      .filter(TextOps.tokenCount(text) >= minTokens &&
        F.col("dup_line_fraction") <= maxDupLineFrac)
      .drop("dup_line_fraction", "dup_bigram_fraction")
    val sampled = Sampling.hashSample(gated, text, sampleRate, salt)
    val deduped = Dedup.exact(sampled, idCol, textCol).drop("fp")
    Sampling.capPerGroup(deduped, F.col(sourceCol), text, capPerSource, salt)
  }
}
