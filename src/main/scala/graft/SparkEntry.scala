package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Driver contract (SURVEY.md §2/§7): one entry per implemented capability,
 * with DuckDB-equivalent oracle SQL wherever the semantics are
 * SQL-expressible. Column names and float rounding are kept identical on
 * both sides; every query ends in a deterministic total order.
 *
 * The gate definitions live in per-family files (graft/queries/Queries*.scala,
 * helpers in QShared) — this object only aggregates them, so the public
 * driver surface is unchanged while an edit to one family's query or
 * oracle text can never touch another family's.
 */
object SparkEntry {

  /** Flagship: EBW poststratification on sf=0.001 orders. */
  def entry(spark: SparkSession): DataFrame =
    queries("ebw_poststrat")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesEbw.queries ++
    QueriesGraph.queries ++
    QueriesText.queries ++
    QueriesDedup.queries ++
    QueriesAnn.queries ++
    QueriesMm.queries ++
    QueriesProfile.queries ++
    QueriesOps.queries ++
    QueriesCore.queries

  def oracleSql: Map[String, String] =
    QueriesEbw.oracles ++
    QueriesGraph.oracles ++
    QueriesText.oracles ++
    QueriesDedup.oracles ++
    QueriesAnn.oracles ++
    QueriesMm.oracles ++
    QueriesProfile.oracles ++
    QueriesOps.oracles ++
    QueriesCore.oracles
}
