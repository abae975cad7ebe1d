package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus snapshot diff — the dataset-versioning primitive: given two
 * versions of a keyed corpus, classify every id as added / removed /
 * changed / unchanged. This is the audit step between crawl refreshes
 * (what did the new crawl actually change?) and the input to incremental
 * reprocessing (only `added` + `changed` need re-embedding, re-scoring,
 * re-deduping — see Dedup's incremental family).
 *
 * Shape at scale: each side reduces to (id, content-hash) in its scan's
 * project — the wide content columns never shuffle, only 2 narrow
 * columns per side enter the full-outer join's exchange. One shuffle
 * per side, hash-partitioned on the id; no collect, no window.
 *
 * The content hash is md5 over the content columns joined with a '|'
 * separator (the engine-portable construction the fingerprint and
 * election operators already use). concat_ws drops a NULL column AND
 * its separator (identically in DuckDB), so NULL -> '' IS a change
 * ("|x" vs "x"), but ('a', NULL) collides with ('a|b' sliced to 'a',
 * NULL-ing b … i.e. separator characters inside values can alias a
 * NULL-drop); feed an explicit presence marker column where that
 * residual distinction matters.
 */
object Snapshot {

  /**
   * Diff `newDf` against `oldDf` keyed by `idCol`: one row per id present
   * in either version — (id, status, old_hash, new_hash) with status in
   * {added, removed, changed, unchanged}. `contentCols` define version
   * identity; ids must be unique per side (enforce upstream with
   * Dedup.exact — a duplicated id would multiply join rows).
   */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "contentCols must be non-empty")
    def hashed(df: DataFrame, hc: String) = df.select(col(idCol),
      md5(concat_ws("|", contentCols.map(c => col(c).cast("string")): _*)).as(hc))
    val o = hashed(oldDf, "old_hash")
    val n = hashed(newDf, "new_hash")
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("old_hash").isNull, lit("added"))
          .when(col("new_hash").isNull, lit("removed"))
          .when(col("old_hash") === col("new_hash"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        col("old_hash"), col("new_hash"))
  }

  /**
   * Apply a [[diff]] to reconstruct the next snapshot — the other half of
   * the versioning loop: `applyChanges(old, diff(old, new), new) == new`
   * row-for-row (the roundtrip law, spec-asserted and oracle-gated).
   * `changes` supplies the full rows for `added` + `changed` ids (in
   * practice the new crawl — extra ids in it are ignored); `removed` ids
   * simply don't survive. This is what an incremental pipeline SHIPS: the
   * reprocessed added/changed rows merged over the untouched majority,
   * without rewriting (or even rereading the content of) unchanged rows.
   *
   * Shape at scale: two key-partitioned semi-joins against the narrow
   * (id, status) diff — the wide content columns of each side shuffle
   * only within their own join, and the union is a no-shuffle
   * concatenation. No window, no collect.
   */
  def applyChanges(oldDf: DataFrame, diffDf: DataFrame, changes: DataFrame,
      idCol: String): DataFrame = {
    val keep = diffDf.filter(col("status") === "unchanged").select(col(idCol))
    val upsert = diffDf.filter(col("status") === "added" ||
      col("status") === "changed").select(col(idCol))
    oldDf.join(keep, Seq(idCol), "leftsemi")
      .unionByName(changes.join(upsert, Seq(idCol), "leftsemi"))
  }

  /**
   * SCD Type 2 history construction — the third leg of the versioning
   * family ([[diff]] compares two snapshots, [[applyChanges]] ships one;
   * this builds the FULL effective-dated history from an append-only
   * change log). Given per-entity observations (id, ts, attrs…), emit one
   * row per DISTINCT consecutive version with `effective_from` /
   * `effective_to` validity bounds ([from, to) half-open, `to` NULL on
   * the current version), a 1-based `version` ordinal, and `is_current`.
   *
   * No-op observations — a row whose content hash equals the entity's
   * previous observation — are suppressed (the standard "don't close and
   * reopen an identical version" SCD2 rule), so the history length is the
   * number of actual state CHANGES, not the number of log rows.
   *
   * Determinism: rows are ordered per entity by (tsCol, tieCols…); pass
   * tie columns whenever tsCol alone is not unique per id (equal-ts
   * duplicates would otherwise make lag/lead order nondeterministic).
   *
   * Shape at scale: both windows (the dedup lag and the validity lead)
   * partition by the SAME entity key, so Catalyst plans exactly ONE
   * Exchange and one sort — the history of each entity builds inside its
   * own partition, and entity count (not log length) drives parallelism.
   * No collect, no global sort.
   */
  def scd2(df: DataFrame, idCol: String, tsCol: String,
      contentCols: Seq[String], tieCols: Seq[String] = Nil): DataFrame = {
    require(contentCols.nonEmpty, "contentCols must be non-empty")
    val ord = (col(tsCol) +: tieCols.map(col)): Seq[Column]
    val w = Window.partitionBy(col(idCol)).orderBy(ord: _*)
    val hashed = df
      .select((Seq(idCol, tsCol) ++ contentCols ++ tieCols).distinct.map(col): _*)
      .withColumn("_vh",
        md5(concat_ws("|", contentCols.map(c => col(c).cast("string")): _*)))
    val changesOnly = hashed
      .withColumn("_ph", lag(col("_vh"), 1).over(w))
      .filter(col("_ph").isNull || col("_ph") =!= col("_vh"))
    changesOnly
      .withColumn("effective_from", col(tsCol))
      .withColumn("effective_to", lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w))
      .withColumn("is_current", col("effective_to").isNull)
      .drop("_vh", "_ph", tsCol)
  }

  /**
   * Point-in-time lookup over a [[scd2]] history: the rows valid AT
   * `ts` — effective_from <= ts < effective_to (current versions have
   * NULL effective_to and match any ts >= from). A narrow filter over
   * the history scan: with the history stored partitioned/z-ordered on
   * effective_from this is the partition-prunable "what did the corpus
   * look like on date D" audit query.
   */
  def asOf(history: DataFrame, ts: Column): DataFrame =
    history.filter(col("effective_from") <= ts &&
      (col("effective_to").isNull || ts < col("effective_to")))
}
