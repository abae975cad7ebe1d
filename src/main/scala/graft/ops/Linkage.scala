package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Blocked fuzzy record linkage — approximate entity matching at corpus
 * scale. The naive form (every left row against every right row with an
 * edit-distance predicate) is a cartesian product: Catalyst can only
 * plan a non-equi string predicate as BroadcastNestedLoopJoin, which is
 * O(n·m) compute and a broadcast of a whole side. The standard fix
 * (Christen, "Data Matching", Ch. 4) is BLOCKING: rows only compare
 * within an equi-join block key, so the join shuffles hash-partitioned
 * like any other equi-join and per-block work is bounded by the block
 * size.
 *
 * Two further prunes keep the verified pair count honest at scale, both
 * provably lossless for Levenshtein distance:
 *  - length filter: |len(a) - len(b)| <= maxDist (deleting/inserting is
 *    one edit each, so distance >= length gap) — applied as a join-side
 *    predicate, it prunes before the expensive DP kernel runs;
 *  - the `levenshtein(a, b, threshold)` form, which abandons the DP
 *    early once the running minimum exceeds the threshold (O(maxDist·n)
 *    per pair instead of O(n·m)).
 */
object Linkage {

  /**
   * Self-linkage: candidate duplicate-entity pairs within `df`, compared
   * only inside equal `blockCols` values, keeping pairs with
   * Levenshtein(strCol_a, strCol_b) <= maxDist. Emits (id_a, id_b,
   * block cols, dist) with id_a < id_b — each unordered pair once.
   *
   * One hash-partition shuffle on the block key; the id_a < id_b
   * predicate halves the verified pairs. Block-size skew is the caller's
   * lever (block on more columns, or feed hot blocks through
   * [[Dedup]] banding instead — edit-distance blocks are the record-
   * linkage tool for SHORT entity strings, not documents).
   */
  def fuzzySelfJoin(
      df: DataFrame, blockCols: Seq[String], strCol: String, idCol: String,
      maxDist: Int): DataFrame = {
    require(blockCols.nonEmpty,
      "blocking columns are required: an unblocked fuzzy join is a cartesian product")
    require(maxDist >= 0, "maxDist must be non-negative")
    val left = df.select(
      (blockCols.map(col) :+ col(idCol).as("id_a") :+ col(strCol).as("_sa")): _*)
    val right = df.select(
      (blockCols.map(col) :+ col(idCol).as("id_b") :+ col(strCol).as("_sb")): _*)
    val joined = left.join(right,
      blockCols.map(c => left(c) === right(c))
        .reduce(_ && _)
        && col("id_a") < col("id_b")
        && abs(length(col("_sa")) - length(col("_sb"))) <= maxDist)
    // thresholded form returns -1 ABOVE the bound (that's the early-abandon
    // signal, not a distance) — keep only 0 <= dist <= maxDist
    val dist = levenshtein(col("_sa"), col("_sb"), math.max(maxDist, 1))
    joined
      .select((col("id_a") +: col("id_b") +: blockCols.map(left(_))) :+
        dist.as("dist"): _*)
      .where(col("dist").between(0, maxDist))
  }

  /**
   * Two-table linkage (e.g. a new batch against a master entity table):
   * every left row paired with the right rows in its block within
   * `maxDist` edits, plus a best-match rank (1 = closest, ties by right
   * id) so `rank = 1` is the classic deterministic-linkage assignment.
   * The rank window partitions by the LEFT id — state per key is the
   * match list, never the corpus.
   */
  def fuzzyJoin(
      left: DataFrame, right: DataFrame, blockCols: Seq[String],
      leftStr: String, rightStr: String, leftId: String, rightId: String,
      maxDist: Int): DataFrame = {
    require(blockCols.nonEmpty,
      "blocking columns are required: an unblocked fuzzy join is a cartesian product")
    require(maxDist >= 0, "maxDist must be non-negative")
    val l = left.select(
      (blockCols.map(col) :+ col(leftId).as("id_l") :+ col(leftStr).as("_sl")): _*)
    val r = right.select(
      (blockCols.map(col) :+ col(rightId).as("id_r") :+ col(rightStr).as("_sr")): _*)
    val joined = l.join(r,
      blockCols.map(c => l(c) === r(c)).reduce(_ && _)
        && abs(length(col("_sl")) - length(col("_sr"))) <= maxDist)
      .withColumn("dist", levenshtein(col("_sl"), col("_sr"), math.max(maxDist, 1)))
      .where(col("dist").between(0, maxDist))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_l")).orderBy(col("dist"), col("id_r"))
    joined
      .withColumn("match_rank", row_number().over(w))
      .select((col("id_l") +: col("id_r") +: blockCols.map(l(_))) ++
        Seq(col("dist"), col("match_rank")): _*)
  }
}
