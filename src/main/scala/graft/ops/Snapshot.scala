package graft.ops

import org.apache.spark.sql.DataFrame
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
}
