package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the data-versioning primitive behind
  * "what changed between yesterday's crawl and today's": per-document
  * added / removed / changed / unchanged status from two snapshots,
  * and the per-source churn manifest a dataset release note reports.
  *
  * Scale shape: each snapshot collapses to an (id, fingerprint)
  * projection in one map pass — the TEXT never shuffles, only 8-byte
  * fingerprints move — then ONE full-outer equi-join on the id and a
  * manifest hash-aggregate. Fingerprints are the portable 60-bit
  * [[TextAnalysis.tokenHash]], so any engine derives the identical
  * diff from the same snapshots.
  */
object Diff {

  /** Per-document diff status between two snapshots sharing an id
    * column: `added` (only in new), `removed` (only in old),
    * `changed` (both, fingerprints differ), `unchanged`. Carries
    * whichever side's metadata column `metaCol` is present (new side
    * wins for changed rows — the release-note convention). */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                 textCol: String, metaCol: String): DataFrame = {
    // presence is a dedicated flag, NOT fingerprint nullability: a
    // row PRESENT in a snapshot with null text has a null fp, and
    // keying status on the fp would misreport it as added/removed;
    // fp comparison is null-safe (<=>) so both-sides-null-text is
    // 'unchanged' and null-vs-text is 'changed'
    def fp(df: DataFrame, side: String) = df.select(
      col(idCol),
      TextAnalysis.tokenHash(col(textCol)).as(s"fp_$side"),
      col(metaCol).as(s"meta_$side"),
      lit(true).as(s"p_$side"))
    val j = fp(oldDf, "old").join(fp(newDf, "new"), Seq(idCol), "full_outer")
    j.select(
      col(idCol),
      when(col("p_old").isNull, lit("added"))
        .when(col("p_new").isNull, lit("removed"))
        .when(col("fp_old") <=> col("fp_new"), lit("unchanged"))
        .otherwise(lit("changed")).as("status"),
      coalesce(col("meta_new"), col("meta_old")).as(metaCol),
      col("fp_old"), col("fp_new"))
  }

  /** Per-`metaCol` (e.g. source) release manifest: counts by status
    * plus an id checksum per status so the exact membership of each
    * class — not just its size — is pinned. One hash aggregate over
    * the diff. */
  def diffManifest(diff: DataFrame, idCol: String,
                   metaCol: String): DataFrame =
    diff.groupBy(col(metaCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("status") === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when(col("status") === "removed", 1L).otherwise(0L))
          .as("n_removed"),
        sum(when(col("status") === "changed", 1L).otherwise(0L))
          .as("n_changed"),
        sum(when(col("status") === "unchanged", 1L).otherwise(0L))
          .as("n_unchanged"),
        sum(when(col("status") === "added", col(idCol)).otherwise(0L))
          .as("added_ids"),
        sum(when(col("status") === "removed", col(idCol)).otherwise(0L))
          .as("removed_ids"),
        sum(when(col("status") === "changed", col(idCol)).otherwise(0L))
          .as("changed_ids"))
}
