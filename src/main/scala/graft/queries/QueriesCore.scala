package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ebw.{DesignMatrix, EbwOptions, EntropyBalance, GroupedEntropyBalance}
import graft.ops.{Dedup, Similarity, Skew, TextMetrics}
import graft.QShared._

/** relational-engine gates (joins, windows, set ops, SQL front door) — one `queries` entry per gate with its DuckDB oracle in
 * `oracles` (same names, same column aliases, same rounding; the
 * SparkEntry contract). Split out of the SparkEntry monolith so an
 * edit to one family can never touch another family's oracle text. */
private[graft] object QueriesCore {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_unpivot" -> ((s, dir) =>
      // UNPIVOT (melt): wide measure columns to long (metric, v) rows —
      // the inverse of q_pivot, a narrow per-row expansion with a fixed
      // metric list (no shuffle; the orderBy is presentational)
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 100)
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_discount")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "metric", "v")
        .orderBy("l_orderkey", "l_linenumber", "metric")),
    "q_try_cast" -> ((s, dir) =>
      // error-safe ingestion: TRY_CAST over deterministically malformed
      // numerics/dates (doc_id-derived, identical in both engines) —
      // invalid inputs land NULL, never an exception; date results are
      // projected through date_format so both engines compare strings
      // NOTE the int-cast input stays integral-or-garbage: engines
      // legitimately diverge on try_cast('2.5' AS INT) (DuckDB rounds,
      // Spark ANSI rejects), so fractional strings only feed the double
      t(s, dir, "documents")
        .select(col("doc_id"),
          when(col("doc_id") % 2 === 0, col("doc_id").cast("string"))
            .otherwise(concat(lit("x"), col("doc_id").cast("string")))
            .as("si"),
          when(col("doc_id") % 3 === 0,
              concat(col("doc_id").cast("string"), lit(".5")))
            .when(col("doc_id") % 3 === 1,
              concat(lit("x"), col("doc_id").cast("string")))
            .otherwise(col("doc_id").cast("string")).as("sd"),
          when(col("doc_id") % 2 === 0, "1995-03-07")
            .otherwise("1995-13-40").as("dt"))
        .select(col("doc_id"),
          expr("try_cast(si as int)").as("i_v"),
          expr("try_cast(sd as double)").as("d_v"),
          date_format(expr("try_cast(dt as date)"), "yyyy-MM-dd").as("date_v"))
        .orderBy("doc_id")),
    "q_filter_agg" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(sqlFilterAggText)
    }),
    "q_window_frame" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(sqlWindowFrameText)
    }),
    "q_array_funcs" -> ((s, dir) =>
      // array set-function family over overlapping token slices:
      // intersect/union/except/overlap, projected through sort+join to a
      // canonical string because the engines order set results
      // differently — all per-row lambda built-ins, zero shuffle
      t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ", -1).as("tok"))
        .filter(size(col("tok")) >= 15)
        .select(col("doc_id"),
          expr("slice(tok, 1, 10)").as("a"), expr("slice(tok, 6, 10)").as("b"))
        .select(col("doc_id"),
          array_join(sort_array(array_distinct(
            array_intersect(col("a"), col("b")))), ",").as("inter_s"),
          size(array_union(col("a"), col("b"))).cast("long").as("union_n"),
          array_join(sort_array(array_distinct(
            array_except(col("a"), col("b")))), ",").as("except_s"),
          arrays_overlap(col("a"), col("b")).cast("long").as("overlap"))
        .orderBy("doc_id")),
    "q_string_funcs" -> ((s, dir) =>
      // scalar string-function family over part names — all codegen'd
      // intrinsics in the Spark∩DuckDB dialect subset, evaluated in the
      // scan's project
      t(s, dir, "part")
        .filter(col("p_partkey") < 500)
        .select(col("p_partkey"),
          upper(col("p_name")).as("up"),
          lpad(col("p_brand"), 12, "*").as("lp"),
          rpad(col("p_brand"), 12, "-").as("rp"),
          reverse(col("p_type")).as("rev"),
          translate(col("p_type"), "AEIOU", "aeiou").as("tr"),
          expr("split_part(p_type, ' ', 1)").as("first_word"),
          substring(col("p_name"), 1, 5).as("left5"),
          expr("repeat(p_brand, 2)").as("rep2"),
          length(col("p_name")).cast("long").as("name_len"))
        .orderBy("p_partkey")),
    "q_not_in_null" -> ((s, dir) => {
      // ANSI 3VL: NOT IN over a subquery containing NULL is UNKNOWN for
      // every row — the with-null branch must count 0 while NOT EXISTS
      // counts normally; one shared text, both engines
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      t(s, dir, "part").createOrReplaceTempView("part")
      s.sql(sqlNotInText)
    }),
    "q_sql_scalar" -> ((s, dir) => {
      // correlated scalar subqueries via the SQL front door: one aggregate
      // subquery with a NULL-on-empty coalesce, one count subquery (counts
      // over empty groups must read 0, not NULL) — Catalyst plans both as
      // outer joins against grouped one-row-per-key aggregates, so the
      // scan of orders is shared-nothing and shuffle-partitioned, never a
      // per-row re-execution
      t(s, dir, "orders").createOrReplaceTempView("orders")
      t(s, dir, "customer").createOrReplaceTempView("customer")
      s.sql(sqlScalarText)
    }),
    "q_higher_order" -> ((s, dir) => {
      // higher-order array functions (lambda family): filter + transform +
      // aggregate over the token array — all evaluated inside the project
      // (codegen'd, zero shuffle), the array never explodes to rows. Every
      // output is cast to long because DuckDB's list_sum widens to HUGEINT
      // and len() returns BIGINT; the casts pin both engines to int64.
      t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ", -1).as("tok"))
        .select(col("doc_id"),
          expr("size(filter(tok, x -> length(x) > 4))").cast("long")
            .as("n_long"),
          expr("aggregate(filter(tok, x -> length(x) > 4), 0L, " +
            "(acc, x) -> acc + length(x))").as("sum_long_len"),
          expr("array_max(transform(tok, x -> length(x)))").cast("long")
            .as("max_len"),
          expr("size(filter(tok, x -> x rlike '^[0-9]+$'))").cast("long")
            .as("n_numeric"))
        .orderBy("doc_id")
    }),
    "q_datetime" -> ((s, dir) =>
      // datetime function family over the order-date column: truncation,
      // field extraction, day arithmetic, month-end — all codegen'd
      // date-time intrinsics evaluated in the scan's project (zero
      // shuffle). Non-portable encodings avoided by construction: weekday
      // is emitted as ISO Monday=1..7 (Spark weekday()+1 == DuckDB
      // isodow), truncation as a formatted string, arithmetic as day
      // counts from a fixed epoch.
      t(s, dir, "orders")
        .filter(col("o_orderkey") < 500)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          year(col("o_orderdate")).cast("long").as("yr"),
          quarter(col("o_orderdate")).cast("long").as("qtr"),
          month(col("o_orderdate")).cast("long").as("mth"),
          (weekday(col("o_orderdate")) + 1).cast("long").as("isodow"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
            .as("month_start"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd")
            .as("month_end"),
          datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
            .cast("long").as("days_since_95"))
        .orderBy("o_orderkey")),
    "q_array_agg" -> ((s, dir) =>
      // array aggregation: collect_set + sort_array (deterministic via the
      // sort), projected through array_join so both engines compare the
      // same canonical string form
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          array_join(sort_array(collect_set(col("o_orderstatus"))), ",")
            .as("statuses"),
          countDistinct(col("o_orderstatus")).as("n_statuses"))
        .orderBy("o_orderpriority")),
    "q_json_extract" -> ((s, dir) => {
      // JSON parsing (crawl-metadata ingest): the JSON text is built by
      // identical concat in both engines (lang/source are plain ASCII, no
      // escaping), then parsed back with path extraction — nested object
      // path, string field, and numeric casts all gated
      val docs = t(s, dir, "documents")
      val meta = concat(lit("{\"doc\": {\"id\": "),
        col("doc_id").cast("string"), lit(", \"lang\": \""), col("lang"),
        lit("\"}, \"n_chars\": "), col("n_chars").cast("string"), lit("}"))
      docs.select(col("doc_id"), meta.as("meta"))
        .select(col("doc_id"),
          get_json_object(col("meta"), "$.doc.lang").as("lang_j"),
          get_json_object(col("meta"), "$.doc.id").cast("long").as("id_j"),
          get_json_object(col("meta"), "$.n_chars").cast("long").as("nc_j"))
        .orderBy("doc_id")
    }),
    "q_window_range" -> ((s, dir) => {
      // RANGE-frame window: 7-day ROLLING revenue per supplier — a value-
      // distance frame over a numeric day key (the ROWS-frame q_window
      // cannot express "all rows within 6 days"). Daily pre-aggregation
      // keeps one row per (supplier, day); the subset bounds the gate at
      // every SF while exercising the frame semantics fully.
      val daily = t(s, dir, "lineitem")
        .filter(col("l_suppkey") < 10 &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
        .groupBy(col("l_suppkey"), to_date(col("l_shipdate")).as("d"))
        .agg(sum("l_extendedprice").as("rev"))
      val w = Window.partitionBy("l_suppkey")
        .orderBy(datediff(col("d"), lit("1995-01-01").cast("date")))
        .rangeBetween(-6, 0)
      daily.select(col("l_suppkey"),
          date_format(col("d"), "yyyy-MM-dd").as("day"),
          round(sum(col("rev")).over(w), 2).as("rev_7d"))
        .orderBy("l_suppkey", "day")
    }),
    "q_stats_agg" -> ((s, dir) =>
      // statistical aggregates: correlation, sample covariance/stddev —
      // one map-side-combined groupBy, co-moment state per group
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("covar_qp"),
          round(stddev_samp(col("l_quantity")), 4).as("sd_q"),
          round(avg(col("l_quantity")), 4).as("avg_q"))
        .orderBy("l_returnflag")),
    "q_setops" -> ((s, dir) => {
      // INTERSECT / EXCEPT (distinct set semantics in both engines)
      val li = t(s, dir, "lineitem")
      val a = li.filter(col("l_quantity") >= 48).select("l_partkey")
      val b = li.filter(col("l_discount") <= 0.01).select("l_partkey")
      a.intersect(b).select(lit("intersect").as("op"), col("l_partkey"))
        .unionAll(a.except(b).select(lit("except").as("op"), col("l_partkey")))
        .orderBy("op", "l_partkey")
    }),
    "q_sql_exists" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(sqlExistsText)
    }),
    "q_sql_lateral" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(sqlLateralText)
    }),
    "q_window_nav" -> ((s, dir) => {
      // window navigation family: lag/lead over the deterministic per-
      // supplier ship order, rank/dense_rank over a tied value (l_quantity
      // repeats within a supplier, so the two differ), ntile over the total
      // order. The supplier subset bounds the gate at every SF; one window
      // partitioning serves all five functions (a single Window exec pair,
      // no extra Exchange per function).
      val ord = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      val w = Window.partitionBy("l_suppkey").orderBy(ord: _*)
      val wq = Window.partitionBy("l_suppkey").orderBy("l_quantity")
      t(s, dir, "lineitem")
        .filter(col("l_suppkey") < 10)
        .select(col("l_suppkey"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"),
          col("l_orderkey"), col("l_linenumber"),
          lag("l_quantity", 1).over(w).as("prev_qty"),
          lead("l_quantity", 1).over(w).as("next_qty"),
          rank().over(wq).cast("long").as("qty_rank"),
          dense_rank().over(wq).cast("long").as("qty_drank"),
          ntile(4).over(w).cast("long").as("bucket4"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    }),
    "q_full_outer" -> ((s, dir) => {
      // FULL OUTER join (the one join type previously ungated): per-
      // customer URGENT-order rollup vs the BUILDING customer dim. Every
      // customer has *some* order in this testdata, so the left side is
      // restricted to urgent orders to make both null sides real:
      // right-only = BUILDING customers with no urgent orders, left-only =
      // urgent buyers outside BUILDING. Keys coalesced, sides marked,
      // total order.
      val ord = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("total"))
      val cust = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_mktsegment"))
      ord.join(cust, col("o_custkey") === col("c_custkey"), "full_outer")
        .select(
          coalesce(col("o_custkey"), col("c_custkey")).as("custkey"),
          when(col("o_custkey").isNotNull && col("c_custkey").isNotNull, "both")
            .when(col("o_custkey").isNotNull, "orders_only")
            .otherwise("building_only").as("side"),
          col("n_orders"), col("total"), col("c_mktsegment"))
        .orderBy("custkey")
    }),
    "q_setops_all" -> ((s, dir) => {
      // EXCEPT ALL / INTERSECT ALL — the multiset (bag) semantics that
      // q_setops' distinct variants cannot express: duplicate l_partkeys
      // survive with multiplicity min(a,b) / a-b
      val li = t(s, dir, "lineitem")
      val a = li.filter(col("l_quantity") >= 48).select("l_partkey")
      val b = li.filter(col("l_discount") <= 0.01).select("l_partkey")
      a.intersectAll(b).select(lit("intersect_all").as("op"), col("l_partkey"))
        .unionAll(a.exceptAll(b).select(lit("except_all").as("op"), col("l_partkey")))
        .orderBy("op", "l_partkey")
    }),
    "q_grouping_sets" -> ((s, dir) => {
      // GROUPING SETS general form via the SQL front door — shared text
      // with the oracle; the partial-set list is expressible by neither
      // CUBE nor ROLLUP (both already gated)
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(sqlGroupingSetsText)
    }),
    "q_sessionize" -> ((s, dir) => {
      // batch gap-based sessionization with the NATIVE session_window
      // aggregation (one shuffle by user, sort-merge session assembly —
      // the same operator the streaming path uses, here in batch): a
      // session extends while the next event starts within 30 min of the
      // last, and ends at last_event + gap. The DuckDB oracle derives
      // identical sessions from first principles (lag + running break sum)
      eventsTsUs(s, dir)
        .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
        .select(col("user_id"),
          date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(col("sw.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_start")
    }),
    // §2b — query engine
    "q1_pricing" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    "q3_topk" -> ((s, dir) => {
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1996-01-01").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(desc("revenue"), col("o_orderkey"))
        .limit(10)
    }),
    "q_star_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region")
      li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    }),
    "q_window" -> ((s, dir) => {
      val order = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      val w = Window.partitionBy("l_suppkey").orderBy(order: _*)
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("run_qty", sum("l_quantity").over(wRun))
        .filter(col("rn") <= 5)
        .select(col("l_suppkey"), col("rn"), col("l_orderkey"), col("l_linenumber"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"), col("run_qty"))
        .orderBy("l_suppkey", "rn")
    }),
    "q_anti_join" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val urgent = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      cust.join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy("c_custkey")
    }),
    "q_semi_join" -> ((s, dir) => {
      val part = t(s, dir, "part")
      val li = t(s, dir, "lineitem").filter(col("l_quantity") >= 45)
      part.join(li, col("p_partkey") === col("l_partkey"), "left_semi")
        .select(col("p_partkey"), col("p_brand"))
        .orderBy("p_partkey")
    }),
    "q_cube" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("qty"))
        .orderBy("rf", "ls")
    }),
    "q_rollup" -> ((s, dir) => {
      t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
        .orderBy("status", "priority")
    }),
    "q_salted_join" -> ((s, dir) => {
      // the skew-mitigation operator under the oracle gate: salted join
      // must produce exactly the plain-join aggregate
      val li = t(s, dir, "lineitem")
        .select(col("l_suppkey").as("k"), col("l_extendedprice"), col("l_discount"))
      val sup = t(s, dir, "supplier")
        .select(col("s_suppkey").as("k"), col("s_name"))
      Skew.saltedJoin(li, sup, "k", 8)
        .groupBy("s_name")
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"))
        .orderBy("s_name")
    }),
    "q_events_window" -> ((s, dir) => {
      // events.ts normalizes to exact epoch micros whatever physical
      // parquet type shipped (see eventsTsUs), == DuckDB's epoch_us
      eventsTsUs(s, dir)
        .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
        .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("bucket_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("bucket_start", "event_type")
    }),
    "q_map_type" -> ((s, dir) =>
      // MAP-typed columns through the engine: construction from arrays,
      // scalar extraction by key, key-set projection to a canonical
      // string — all inside the scan's project (narrow, codegen'd).
      // DuckDB's map extraction returns a 1-element LIST, so its oracle
      // indexes [1]; Spark's element_at is already scalar.
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 100)
        .withColumn("m", map_from_arrays(
          array(lit("qty"), lit("price")),
          array(col("l_quantity"), col("l_extendedprice"))))
        .select(col("l_orderkey"), col("l_linenumber"),
          element_at(col("m"), "qty").as("qty_v"),
          array_join(map_keys(col("m")), ",").as("keys_s"))
        .orderBy("l_orderkey", "l_linenumber")),
    "q_pivot" -> ((s, dir) =>
      // pivot with an explicit value list: one groupBy, no
      // distinct-values pre-job, fixed output schema
      t(s, dir, "orders")
        .withColumn("yr", year(col("o_orderdate")))
        .groupBy("o_orderpriority")
        .pivot("yr", Seq(1995, 1996, 1997))
        .agg(round(sum("o_totalprice"), 2))
        .select(col("o_orderpriority").as("priority"),
          col("1995").as("rev_1995"), col("1996").as("rev_1996"),
          col("1997").as("rev_1997"))
        .orderBy("priority")),
    "q_approx_quantiles" -> ((s, dir) =>
      // the sketch path the winsorize/quantile docs promise as the
      // beyond-sort swap, gated honestly: approx_percentile in its
      // exact regime (n <= accuracy) must equal DuckDB quantile_disc —
      // at 100 TB the same code runs with bounded accuracy and the
      // documented rank-error envelope
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(expr("approx_percentile(l_extendedprice, " +
          "array(0.25D, 0.5D, 0.75D, 0.9D), 1000000)").as("_q"))
        .select(col("l_returnflag"),
          col("_q")(0).as("p25"), col("_q")(1).as("p50"),
          col("_q")(2).as("p75"), col("_q")(3).as("p90"))
        .orderBy("l_returnflag")),
    "q_pop" -> ((s, dir) => {
      // period-over-period revenue report: daily totals with 1-period
      // and 7-period percent changes (lag windows over the day-keyed
      // rollup — n_days rows, not order rows)
      import org.apache.spark.sql.expressions.Window
      val daily = t(s, dir, "orders")
        .groupBy(expr(
          "unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
          .as("day"))
        .agg(round(sum("o_totalprice"), 4).as("revenue"))
      val w = Window.orderBy("day")
      daily
        .withColumn("pct_1d", round((col("revenue") - lag("revenue", 1).over(w))
          / lag("revenue", 1).over(w), 6))
        .withColumn("pct_7d", round((col("revenue") - lag("revenue", 7).over(w))
          / lag("revenue", 7).over(w), 6))
        .orderBy("day")
    }),
    "q_hopping" -> ((s, dir) => {
      // hopping (sliding) windows: 30-minute aggregates every 10
      // minutes via Spark's native window(size, slide) generator —
      // each event replicates into exactly 3 overlapping buckets; the
      // oracle materializes the identical 3 start offsets arithmetically
      val ev = eventsTsUs(s, dir)
        .withColumn("ts", timestamp_micros(col("ts_us")))
      ev.groupBy(window(col("ts"), "30 minutes", "10 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .select(unix_micros(col("w.start")).as("w_start_us"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("w_start_us", "event_type")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q_sql_scalar" -> sqlScalarText,
    "q_filter_agg" -> sqlFilterAggText,
    "q_not_in_null" -> sqlNotInText,
    "q_window_frame" -> sqlWindowFrameText,
    "q_array_funcs" ->
      """SELECT doc_id,
        |  array_to_string(list_sort(list_distinct(list_intersect(a, b))), ',')
        |    AS inter_s,
        |  len(list_distinct(list_concat(a, b)))::BIGINT AS union_n,
        |  array_to_string(list_sort(list_distinct(
        |    list_filter(a, x -> NOT list_contains(b, x)))), ',') AS except_s,
        |  (CASE WHEN list_has_any(a, b) THEN 1 ELSE 0 END)::BIGINT AS overlap
        |FROM (SELECT doc_id, tok[1:10] AS a, tok[6:15] AS b
        |  FROM (SELECT doc_id, string_split(text, ' ') AS tok FROM documents)
        |  WHERE len(tok) >= 15)
        |ORDER BY doc_id""".stripMargin,
    "q_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS up,
        |  lpad(p_brand, 12, '*') AS lp,
        |  rpad(p_brand, 12, '-') AS rp,
        |  reverse(p_type) AS rev,
        |  translate(p_type, 'AEIOU', 'aeiou') AS tr,
        |  split_part(p_type, ' ', 1) AS first_word,
        |  substr(p_name, 1, 5) AS left5,
        |  repeat(p_brand, 2) AS rep2,
        |  len(p_name)::BIGINT AS name_len
        |FROM part WHERE p_partkey < 500
        |ORDER BY p_partkey""".stripMargin,
    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
        |  l_quantity AS v
        |FROM lineitem WHERE l_orderkey < 100
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
        |FROM lineitem WHERE l_orderkey < 100
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,
    "q_try_cast" ->
      """SELECT doc_id,
        |  try_cast(si AS INTEGER) AS i_v,
        |  try_cast(sd AS DOUBLE) AS d_v,
        |  strftime(try_cast(dt AS DATE), '%Y-%m-%d') AS date_v
        |FROM (SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN doc_id::VARCHAR
        |       ELSE 'x' || doc_id END AS si,
        |  CASE WHEN doc_id % 3 = 0 THEN doc_id || '.5'
        |       WHEN doc_id % 3 = 1 THEN 'x' || doc_id
        |       ELSE doc_id::VARCHAR END AS sd,
        |  CASE WHEN doc_id % 2 = 0 THEN '1995-03-07'
        |       ELSE '1995-13-40' END AS dt
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q_higher_order" ->
      """SELECT doc_id,
        |  len(list_filter(string_split(text, ' '), x -> len(x) > 4))::BIGINT
        |    AS n_long,
        |  coalesce(list_sum(list_transform(
        |    list_filter(string_split(text, ' '), x -> len(x) > 4),
        |    x -> len(x))), 0)::BIGINT AS sum_long_len,
        |  list_max(list_transform(string_split(text, ' '), x -> len(x)))::BIGINT
        |    AS max_len,
        |  len(list_filter(string_split(text, ' '),
        |    x -> regexp_matches(x, '^[0-9]+$')))::BIGINT AS n_numeric
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q_datetime" ->
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |  year(o_orderdate)::BIGINT AS yr,
        |  quarter(o_orderdate)::BIGINT AS qtr,
        |  month(o_orderdate)::BIGINT AS mth,
        |  isodow(o_orderdate)::BIGINT AS isodow,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  strftime(last_day(o_orderdate::DATE), '%Y-%m-%d') AS month_end,
        |  datediff('day', DATE '1995-01-01', o_orderdate::DATE)::BIGINT
        |    AS days_since_95
        |FROM orders WHERE o_orderkey < 500
        |ORDER BY o_orderkey""".stripMargin,
    "q_map_type" ->
      """SELECT l_orderkey, l_linenumber,
        |  m['qty'][1] AS qty_v,
        |  array_to_string(map_keys(m), ',') AS keys_s
        |FROM (SELECT l_orderkey, l_linenumber,
        |  map(['qty', 'price'], [l_quantity, l_extendedprice]) AS m
        |  FROM lineitem WHERE l_orderkey < 100)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_topk" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1996-01-01'
        |GROUP BY o_orderkey, order_date
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    "q_star_join" ->
      """SELECT r_name, n_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q_window" ->
      """SELECT l_suppkey, rn, l_orderkey, l_linenumber, ship_date, run_qty FROM (
        |  SELECT l_suppkey,
        |    row_number() OVER w AS rn,
        |    l_orderkey, l_linenumber,
        |    strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
        |    sum(l_quantity) OVER (PARTITION BY l_suppkey
        |      ORDER BY l_shipdate, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_qty
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber)
        |) WHERE rn <= 5
        |ORDER BY l_suppkey, rn""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q_semi_join" ->
      """SELECT p_partkey, p_brand FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_partkey = p_partkey AND l_quantity >= 45)
        |ORDER BY p_partkey""".stripMargin,
    "q_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q_salted_join" ->
      """SELECT s_name, count(*) AS n_items,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name ORDER BY s_name""".stripMargin,
    "q_events_window" ->
      """SELECT strftime(time_bucket(INTERVAL '5 minutes', ts), '%Y-%m-%d %H:%M:%S')
        |    AS bucket_start,
        |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events
        |GROUP BY bucket_start, event_type
        |ORDER BY bucket_start, event_type""".stripMargin,
    "q_array_agg" ->
      """SELECT o_orderpriority,
        |  array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',')
        |    AS statuses,
        |  count(DISTINCT o_orderstatus) AS n_statuses
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_json_extract" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    '{"doc": {"id": ' || CAST(doc_id AS VARCHAR) || ', "lang": "'
        |      || lang || '"}, "n_chars": ' || CAST(n_chars AS VARCHAR)
        |      || '}' AS meta
        |  FROM documents)
        |SELECT doc_id,
        |  json_extract_string(meta, '$.doc.lang') AS lang_j,
        |  CAST(json_extract_string(meta, '$.doc.id') AS BIGINT) AS id_j,
        |  CAST(json_extract_string(meta, '$.n_chars') AS BIGINT) AS nc_j
        |FROM m ORDER BY doc_id""".stripMargin,
    "q_window_range" ->
      """WITH daily AS (
        |  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS d,
        |    sum(l_extendedprice) AS rev
        |  FROM lineitem
        |  WHERE l_suppkey < 10 AND l_shipdate < TIMESTAMP '1996-01-01'
        |  GROUP BY 1, 2)
        |SELECT l_suppkey, strftime(d, '%Y-%m-%d') AS day,
        |  round(sum(rev) OVER (PARTITION BY l_suppkey
        |    ORDER BY datediff('day', DATE '1995-01-01', d)
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS rev_7d
        |FROM daily ORDER BY l_suppkey, day""".stripMargin,
    "q_stats_agg" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qp,
        |  round(stddev_samp(l_quantity), 4) AS sd_q,
        |  round(avg(l_quantity), 4) AS avg_q
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_setops" ->
      """WITH a AS (SELECT l_partkey FROM lineitem WHERE l_quantity >= 48),
        |b AS (SELECT l_partkey FROM lineitem WHERE l_discount <= 0.01),
        |i AS (SELECT l_partkey FROM a INTERSECT SELECT l_partkey FROM b),
        |e AS (SELECT l_partkey FROM a EXCEPT SELECT l_partkey FROM b)
        |SELECT 'intersect' AS op, l_partkey FROM i
        |UNION ALL
        |SELECT 'except' AS op, l_partkey FROM e
        |ORDER BY op, l_partkey""".stripMargin,
    "q_sql_exists" -> sqlExistsText,
    "q_sql_lateral" -> sqlLateralText,
    "q_grouping_sets" -> sqlGroupingSetsText,
    "q_setops_all" ->
      """SELECT 'intersect_all' AS op, l_partkey FROM (
        |  SELECT l_partkey FROM lineitem WHERE l_quantity >= 48
        |  INTERSECT ALL
        |  SELECT l_partkey FROM lineitem WHERE l_discount <= 0.01)
        |UNION ALL
        |SELECT 'except_all' AS op, l_partkey FROM (
        |  SELECT l_partkey FROM lineitem WHERE l_quantity >= 48
        |  EXCEPT ALL
        |  SELECT l_partkey FROM lineitem WHERE l_discount <= 0.01)
        |ORDER BY op, l_partkey""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM e)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
        |    AS session_end,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "q_window_nav" ->
      """SELECT l_suppkey,
        |  strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
        |  l_orderkey, l_linenumber,
        |  lag(l_quantity) OVER w AS prev_qty,
        |  lead(l_quantity) OVER w AS next_qty,
        |  rank() OVER wq AS qty_rank,
        |  dense_rank() OVER wq AS qty_drank,
        |  ntile(4) OVER w AS bucket4
        |FROM lineitem
        |WHERE l_suppkey < 10
        |WINDOW
        |  w AS (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber),
        |  wq AS (PARTITION BY l_suppkey ORDER BY l_quantity)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
    "q_full_outer" ->
      """WITH o AS (
        |  SELECT o_custkey, count(*) AS n_orders,
        |    round(sum(o_totalprice), 2) AS total
        |  FROM orders WHERE o_orderpriority = '1-URGENT'
        |  GROUP BY o_custkey),
        |c AS (
        |  SELECT c_custkey, c_mktsegment FROM customer
        |  WHERE c_mktsegment = 'BUILDING')
        |SELECT coalesce(o_custkey, c_custkey) AS custkey,
        |  CASE WHEN o_custkey IS NOT NULL AND c_custkey IS NOT NULL THEN 'both'
        |       WHEN o_custkey IS NOT NULL THEN 'orders_only'
        |       ELSE 'building_only' END AS side,
        |  n_orders, total, c_mktsegment
        |FROM o FULL OUTER JOIN c ON o_custkey = c_custkey
        |ORDER BY custkey""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderpriority AS priority,
        |  round(sum(CASE WHEN year(o_orderdate) = 1995 THEN o_totalprice END), 2)
        |    AS rev_1995,
        |  round(sum(CASE WHEN year(o_orderdate) = 1996 THEN o_totalprice END), 2)
        |    AS rev_1996,
        |  round(sum(CASE WHEN year(o_orderdate) = 1997 THEN o_totalprice END), 2)
        |    AS rev_1997
        |FROM orders GROUP BY o_orderpriority ORDER BY priority""".stripMargin,
    "q_approx_quantiles" ->
      """SELECT l_returnflag,
        |  quantile_disc(l_extendedprice, 0.25) AS p25,
        |  quantile_disc(l_extendedprice, 0.50) AS p50,
        |  quantile_disc(l_extendedprice, 0.75) AS p75,
        |  quantile_disc(l_extendedprice, 0.90) AS p90
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_pop" ->
      """WITH daily AS (SELECT
        |    epoch_us(o_orderdate)::BIGINT // 86400000000 AS day,
        |    round(sum(o_totalprice), 4) AS revenue
        |  FROM orders GROUP BY 1)
        |SELECT day, revenue,
        |  round((revenue - lag(revenue, 1) OVER (ORDER BY day))
        |    / lag(revenue, 1) OVER (ORDER BY day), 6) AS pct_1d,
        |  round((revenue - lag(revenue, 7) OVER (ORDER BY day))
        |    / lag(revenue, 7) OVER (ORDER BY day), 6) AS pct_7d
        |FROM daily ORDER BY day""".stripMargin,
    "q_hopping" ->
      """WITH e AS (SELECT epoch_us(ts)::BIGINT AS us, event_type, value
        |  FROM events),
        |x AS (SELECT ((us // 600000000) - i) * 600000000 AS w_start_us,
        |    event_type, value
        |  FROM e CROSS JOIN range(0, 3) t(i))
        |SELECT w_start_us, event_type, count(*)::BIGINT AS n,
        |  round(sum(value), 2) AS sum_value
        |FROM x GROUP BY 1, 2
        |ORDER BY w_start_us, event_type""".stripMargin,
  )
}
