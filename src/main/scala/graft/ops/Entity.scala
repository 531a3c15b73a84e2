package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage / dirty-key dedup): resolve
  * records whose KEY strings differ by small typos into entities,
  * without ever going all-pairs — the structured-record sibling of
  * the text dedup family, for the "same customer entered twice"
  * shape every large warehouse carries.
  *
  * Blocking is the deletion-1 neighborhood (the FastSS scheme,
  * Bocek et al. 2007): each record emits its key plus every
  * single-character deletion of it (L+1 short strings for an L-char
  * key). Two keys within Levenshtein distance 1 ALWAYS share a
  * neighborhood member — equal keys share the key itself, a
  * deletion pair shares the shorter key, a substitution pair shares
  * the both-sides deletion of the differing position — so blocking
  * recall at τ = 1 is exactly 100%, with no LSH tuning and no
  * quadratic risk: block keys are near-unique strings, so bucket
  * sizes stay O(true-match group), independent of corpus size.
  *
  * Scale shape: one explode (L+1 rows per record, each a few-byte
  * string + an 8-byte rid), one hash-shuffle self-join on (block
  * columns, neighborhood key), DISTINCT pair dedup, then the
  * verify join touches only candidate pairs (codegen'd
  * `levenshtein` on the two names). The transitive closure is
  * [[Dedup.connectedComponents]] (alternating large-star/small-star
  * on 8-byte id pairs). Full names never ride the blocking shuffle —
  * only neighborhood keys do. */
object Entity {

  /** The deletion-1 neighborhood of `key` as an array column:
    * the key itself plus every single-character deletion, in
    * position order. */
  def deletionKeys(key: Column): Column =
    concat(array(key),
      transform(sequence(lit(1), length(key)), i =>
        concat(key.substr(lit(1), i - 1),
          key.substr(i + 1, length(key)))))

  /** Candidate pairs (id_a < id_b) whose keys share a deletion-1
    * neighborhood member AND agree exactly on every `blockCols`
    * column — the cheap structured-equality prior (nation, segment,
    * zip…) that keeps buckets small and candidates plausible. */
  def candidatePairs(df: DataFrame, idCol: String, keyCol: String,
                     blockCols: Seq[String]): DataFrame = {
    // explicit null filter + KnownNotNull: the exploded key serves
    // as a join key, and a nullable kernel input would re-run the
    // neighborhood build in an inferred pushed-down IsNotNull
    // filter (the PlanAudit r11 pattern)
    val keyed = df.where(col(keyCol).isNotNull)
      .select((col(idCol) +: blockCols.map(col)) :+
        explode(deletionKeys(
          PlanHints.knownNotNull(col(keyCol)))).as("__bk"): _*)
    val joinCols = blockCols :+ "__bk"
    val a = keyed.toDF(keyed.columns.map {
      case c if c == idCol => "__ida" case c => c }: _*)
    val b = keyed.select(col(idCol).as("__idb") +:
      joinCols.map(col): _*)
    a.join(b, joinCols)
      .where(col("__ida") < col("__idb"))
      .select(col("__ida").as("id_a"), col("__idb").as("id_b"))
      .distinct()
  }

  /** Resolve records into entities: deletion-neighborhood blocking,
    * `levenshtein(name_a, name_b) <= tau` verification (τ must be ≤
    * 1 for the blocking recall guarantee; larger τ still verifies
    * but only over distance-1-blocked candidates), transitive
    * closure, entity id = min record id of the component. Every
    * record appears in the output — unmatched records are their own
    * entity. Returns the input plus an `entity` column. */
  def resolve(df: DataFrame, idCol: String, keyCol: String,
              nameCol: String, blockCols: Seq[String],
              tau: Int = 1): DataFrame = {
    val cand = candidatePairs(df, idCol, keyCol, blockCols)
    val names = df.select(col(idCol), col(nameCol))
    val verified = cand
      .join(names.select(col(idCol).as("id_a"),
        col(nameCol).as("__na")), "id_a")
      .join(names.select(col(idCol).as("id_b"),
        col(nameCol).as("__nb")), "id_b")
      .where(levenshtein(col("__na"), col("__nb")) <= tau)
      .select("id_a", "id_b")
    val comp = Dedup.connectedComponents(verified, "id_a", "id_b")
    df.join(comp.select(col("node").as(idCol), col("component")),
        Seq(idCol), "left")
      .withColumn("entity",
        coalesce(col("component"), col(idCol).cast("long")))
      .drop("component")
  }

  /** Deletion-neighborhood index of a RESOLVED archive — build (and
    * persist) once, then steady-state arrivals probe it via
    * [[resolveAgainst]] without the archive ever self-joining again
    * (the incremental-dedup discipline): one row per (record,
    * neighborhood key) carrying the block columns, the record's name
    * (for the verify), and its entity label. */
  def archiveIndex(resolved: DataFrame, keyCol: String,
                   nameCol: String, blockCols: Seq[String]): DataFrame =
    resolved.where(col(keyCol).isNotNull)
      .select(blockCols.map(col) ++ Seq(
        explode(deletionKeys(
          PlanHints.knownNotNull(col(keyCol)))).as("__bk"),
        col(nameCol).as("__arch_name"),
        col("entity").as("__arch_entity")): _*)

  /** Resolve arrivals against an [[archiveIndex]] ONLY: entity = the
    * minimum verified archive entity, else the arrival's own id.
    * Each arrival's label depends on itself and the static index
    * alone — no arrival-arrival linking — so the assignment is
    * batch-split invariant and runs unchanged on a streaming frame
    * (explode → stream-static left join → keyed aggregate; arrivals
    * that link only to EACH OTHER stay distinct entities until the
    * next archive rebuild, the standard steady-state trade
    * documented by the incremental dedup family). `keep` columns
    * ride the grouping key (single-row grain per id, so grouping by
    * them is free) — there is no join-back, which is what keeps the
    * same plan legal under streaming. */
  def resolveAgainst(index: DataFrame, arrivals: DataFrame,
                     idCol: String, keyCol: String, nameCol: String,
                     blockCols: Seq[String], tau: Int = 1,
                     keep: Seq[String] = Nil): DataFrame = {
    val keyed = arrivals.where(col(keyCol).isNotNull)
      .select((col(idCol) +: (blockCols ++ keep).distinct.map(col)) ++ Seq(
        col(nameCol),
        explode(deletionKeys(
          PlanHints.knownNotNull(col(keyCol)))).as("__bk")): _*)
    val probed = keyed.join(index, blockCols :+ "__bk", "left")
      .withColumn("__hit",
        when(levenshtein(col(nameCol), col("__arch_name")) <= tau,
          col("__arch_entity")))
      .groupBy(col(idCol) +: keep.map(col): _*)
      .agg(min(col("__hit")).as("__m"))
      .withColumn("entity",
        coalesce(col("__m"), col(idCol).cast("long")))
      .drop("__m")
    // null-key arrivals can't probe the index but must still appear
    // in the output as their own entity — the batch resolve()
    // contract (its left join + coalesce path labels them id). A
    // stateless filter+project union keeps the plan streaming-legal.
    val nullKey = arrivals.where(col(keyCol).isNull)
      .select((col(idCol) +: keep.map(col)) :+
        col(idCol).cast("long").as("entity"): _*)
    probed.unionByName(nullKey)
  }
}
