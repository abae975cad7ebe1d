package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Declarative data-quality expectations — the ingest contract check that
 * runs between landing a crawl/extract and admitting it to the pipeline
 * (the Great-Expectations / dbt-test / Deequ niche, expressed as plain
 * Catalyst aggregations). Every check emits the same report row —
 * (rule, n_violations, n_rows, violation_frac, passed) — so a suite of
 * heterogeneous checks unions into one audit frame a scheduler can gate
 * on (`passed = false` blocks the load).
 *
 * Scale shapes, per check kind:
 *  - row rules: ALL rules evaluate in ONE full-scan aggregation — k
 *    rules cost one pass and a k-value partial-agg shuffle, never k
 *    scans. The 1-row result unpivots to report rows (the
 *    describeNumeric pattern, Profile.scala).
 *  - unique key: one key-partitioned aggregation (map-side combined) +
 *    a 1-row rollup; surplus rows (n - distinct groups) are the
 *    violation count, so NULL-keyed rows group and count like any key.
 *  - foreign key: one LEFT ANTI join (broadcast when the parent's key
 *    projection is small, AQE decides) + a 1-row count; NULL child keys
 *    pass (the SQL MATCH SIMPLE convention).
 * Nothing collects; every check is a plan fragment until the report
 * frame itself is acted on.
 */
object Validate {

  private def reportRow(rule: String, viol: Column, total: Column): Column =
    struct(lit(rule).as("rule"), viol.cast("long").as("n_violations"),
      total.cast("long").as("n_rows"),
      // 0/0 on an empty frame reports 0.0, not NULL: an empty input has
      // no violations, and a NULL frac would read as "unknown" downstream
      round(coalesce(viol.cast("double") / total.cast("double"), lit(0.0)),
        4).as("violation_frac"),
      (viol === 0L).as("passed"))

  private def unpack(df: DataFrame, rows: Column): DataFrame =
    df.select(explode(rows).as("_r")).select(
      col("_r.rule").as("rule"), col("_r.n_violations").as("n_violations"),
      col("_r.n_rows").as("n_rows"),
      col("_r.violation_frac").as("violation_frac"),
      col("_r.passed").as("passed"))

  /**
   * Row-level rules, each a (name, violation predicate) pair — a row
   * VIOLATES the rule when the predicate is true (NULL predicate = no
   * violation, so write explicit isNull rules for presence checks).
   * All rules evaluate in one aggregation over one scan.
   */
  def rowRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "rules must be non-empty")
    require(rules.map(_._1).distinct.size == rules.size,
      "rule names must be unique")
    val aggs = count(lit(1)).as("_n") +: rules.zipWithIndex.map {
      case ((_, p), i) =>
        coalesce(sum(when(p, 1L).otherwise(0L)), lit(0L)).as(s"_v$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    unpack(one, array(rules.zipWithIndex.map { case ((nm, _), i) =>
      reportRow(nm, col(s"_v$i"), col("_n"))
    }: _*))
  }

  /**
   * Key-uniqueness check: `n_violations` = surplus rows (total minus
   * distinct key groups) — 0 iff `keyCols` is a candidate key. NULL keys
   * participate as ordinary group values (two all-NULL keys ARE a
   * duplicate, the GROUP BY convention, identical in DuckDB).
   */
  def uniqueKey(df: DataFrame, keyCols: Seq[String],
      rule: String): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val grouped = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("_c"))
    val one = grouped.agg(
      coalesce(sum(col("_c")), lit(0L)).as("_n"),
      coalesce(sum(col("_c") - 1L), lit(0L)).as("_v"))
    unpack(one, array(reportRow(rule, col("_v"), col("_n"))))
  }

  /**
   * Referential-integrity check: child rows whose non-NULL `childCol`
   * value has no match in `parent(parentCol)` are violations; NULL
   * child keys pass (SQL MATCH SIMPLE). The orphan count comes from a
   * LEFT ANTI join against the parent's key projection.
   */
  def foreignKey(child: DataFrame, childCol: String, parent: DataFrame,
      parentCol: String, rule: String): DataFrame = {
    val orphans = child.filter(col(childCol).isNotNull)
      .join(parent.select(col(parentCol)),
        col(childCol) === col(parentCol), "left_anti")
      .agg(count(lit(1)).as("_v"))
    val total = child.agg(count(lit(1)).as("_n"))
    unpack(orphans.crossJoin(total),
      array(reportRow(rule, col("_v"), col("_n"))))
  }

  /** Union heterogeneous checks into one audit frame. */
  /**
   * Bucket-checksum reconciliation — the migration acceptance test at
   * the scale a row-level diff can't run ([[graft.ops.Snapshot.diff]]
   * classifies every row; this answers "are these two copies of a
   * 100 TB table identical, and if not WHERE" in O(buckets) output):
   * each side hashes every row's chosen-column rendering to a 32-bit
   * md5 prefix, rows bucket by an md5 prefix of the KEY (content-based
   * — survives repartitioning, file order, engine), and each bucket
   * compares (row count, Σ row-hash). A mismatched bucket localizes
   * the damage to keyspace-bucket granularity; re-run with more
   * buckets (or Snapshot.diff on the one bucket's key range) to drill
   * down. Σ of 32-bit hashes over any realistic bucket fits a long
   * with no overflow; collisions need two DIFFERENT corruptions in one
   * bucket summing to the same delta — not the failure mode acceptance
   * tests chase. Missing buckets coalesce to (0, 0): an empty side is
   * a mismatch, not an absent row. Each column renders with an inline
   * null flag ('n' for NULL, 'v' ++ value otherwise) BEFORE the
   * `concat_ws` join — a bare `concat_ws` silently drops NULL elements
   * plus their separator, so (a, NULL, b) and (a, b, NULL) would hash
   * identically: a single-row corruption class the checksum must
   * catch, not mask (the same caveat [[graft.ops.Snapshot]]
   * documents).
   *
   * One scan + one bucket-keyed aggregation PER SIDE (map-side
   * combined to ≤ buckets rows), then a buckets-sized full-outer join.
   * Output: bucket, n_a, n_b, sum_a, sum_b, matches — one row per
   * OCCUPIED bucket, ordered by bucket.
   */
  def reconcile(a: DataFrame, b: DataFrame, keyCol: String,
      cols: Seq[String], buckets: Int = 64): DataFrame = {
    require(buckets >= 1 && buckets <= (1 << 20),
      s"buckets must be in [1, 2^20]: $buckets")
    require(cols.nonEmpty, "reconcile needs at least one content column")
    def side(df: DataFrame, nc: String, sc: String): DataFrame = {
      val key = col(keyCol).cast("string")
      val row = concat_ws("|", cols.map { c =>
        val s = col(c).cast("string")
        concat(when(s.isNull, lit("n")).otherwise(lit("v")),
          coalesce(s, lit("")))
      }: _*)
      df.select(
          pmod(conv(substring(md5(key), 1, 4), 16, 10).cast("long"),
            lit(buckets.toLong)).as("bucket"),
          conv(substring(md5(row), 1, 8), 16, 10).cast("long").as("_h"))
        .groupBy("bucket")
        .agg(count(lit(1)).as(nc), sum(col("_h")).as(sc))
    }
    side(a, "n_a", "sum_a")
      .join(side(b, "n_b", "sum_b"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        coalesce(col("sum_a"), lit(0L)).as("sum_a"),
        coalesce(col("sum_b"), lit(0L)).as("sum_b"))
      .withColumn("matches",
        col("n_a") === col("n_b") && col("sum_a") === col("sum_b"))
  }

  def report(checks: DataFrame*): DataFrame = {
    require(checks.nonEmpty, "at least one check required")
    checks.reduce(_.unionByName(_))
  }
}
