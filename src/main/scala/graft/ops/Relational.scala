package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational OLAP operators over the TPC-H-style star schema
  * (`region nation customer supplier part orders lineitem`).
  *
  * The reference engine has no relational surface, but the charter's
  * analytics engine does: these are the classic warehouse shapes
  * (pricing summary, star join, top-k per group, pivot, cube, windowed
  * running totals, semi/anti joins) expressed Spark-first so Catalyst
  * picks partial aggregation, broadcast sides, and TakeOrdered plans.
  *
  * Float policy: money doubles are quantized per-row to integer cents
  * with IEEE-identical ops on both engines (`floor(x*100+0.5)`), so
  * integer sums are order-independent under partial aggregation and
  * hash-match the DuckDB oracle exactly — same trick as the
  * integer-quantized ln in [[graft.text.TextAnalysis.bigramLmScores]].
  *
  * Scale notes (100 TB): only `nation`/`region` are constant-size and
  * hard-broadcast; `customer`/`supplier` scale linearly with SF, so
  * they stay as shuffle joins and AQE converts them to broadcast when
  * the runtime size allows. Fact-side reductions (pre-aggregating
  * lineitem per order before any join) happen before the wide joins.
  */
object Relational {

  /** Money double → exact integer cents. `floor` of a double is a LONG
    * in Spark; the oracle writes `CAST(floor(x*100.0 + 0.5) AS BIGINT)`
    * — identical IEEE multiply/add/floor on both sides. */
  def cents(c: Column): Column = floor(c * lit(100.0) + lit(0.5)).cast("long")

  /** TPC-H Q1-shaped pricing summary: one pass over lineitem, partial
    * aggregation on the 6-group key. All measures are exact integers. */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("long")).cast("long").as("sum_qty"),
        sum(cents(col("l_extendedprice"))).cast("long").as("base_cents"),
        sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .cast("long").as("disc_cents"),
        sum(cents((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            * (lit(1.0) + col("l_tax"))))
          .cast("long").as("charge_cents"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q5-shaped star join: revenue by supplier nation for one
    * region and order year, where the customer and supplier share a
    * nation. Only the constant-size nation⋈region dim is hard-broadcast;
    * customer/supplier are slim-projected shuffle joins (AQE broadcasts
    * them at small SF, keeps them shuffled at 100 TB where both scale
    * linearly). The year filter lands on orders before the fact join. */
  def nationRevenue(
      lineitem: DataFrame,
      orders: DataFrame,
      customer: DataFrame,
      supplier: DataFrame,
      nation: DataFrame,
      region: DataFrame,
      regionName: String,
      orderYear: Int): DataFrame = {
    val dim = nation
      .join(region, col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === regionName)
      .select(col("n_nationkey"), col("n_name"))
    val o = orders
      .filter(year(col("o_orderdate")) === orderYear)
      .select(col("o_orderkey"), col("o_custkey"))
    lineitem
      .select(
        col("l_orderkey"), col("l_suppkey"),
        cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev_cents"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(supplier.select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(dim), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(col("rev_cents")).cast("long").as("revenue_cents"),
        count(lit(1)).as("n_lineitems"))
      .select(col("n_name").as("nation"), col("revenue_cents"), col("n_lineitems"))
      .orderBy(col("revenue_cents").desc, col("nation"))
  }

  /** Top-k customers by lifetime revenue. Lineitem is pre-aggregated
    * per order BEFORE any join (the ~4× fact reduction), re-aggregated
    * per customer, cut to k rows via orderBy+limit (TakeOrdered — only
    * k rows per partition survive the shuffle), and only then joined to
    * the customer dimension: the k-row side broadcasts for free. */
  def topCustomersByRevenue(
      lineitem: DataFrame,
      orders: DataFrame,
      customer: DataFrame,
      k: Int): DataFrame = {
    val perOrder = lineitem
      .groupBy(col("l_orderkey"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .cast("long").as("rev_cents"))
    val top = perOrder
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(
        sum(col("rev_cents")).cast("long").as("revenue_cents"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("revenue_cents").desc, col("o_custkey"))
      .limit(k)
    top
      .join(customer.select(col("c_custkey"), col("c_name"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("revenue_cents"), col("n_orders"))
      .orderBy(col("revenue_cents").desc, col("c_custkey"))
  }

  private val Priorities = Seq(
    "1-URGENT" -> "p_urgent",
    "2-HIGH" -> "p_high",
    "3-MEDIUM" -> "p_medium",
    "4-NOT SPECIFIED" -> "p_notspec",
    "5-LOW" -> "p_low")

  /** Pivot: order counts as a status × priority matrix. The pivot value
    * list is explicit, so Spark skips the extra values-discovery scan a
    * bare `.pivot(col)` would run — at 100 TB that scan is a full pass. */
  def orderPriorityPivot(orders: DataFrame): DataFrame = {
    val pivoted = orders
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", Priorities.map(_._1))
      .agg(count(lit(1)))
    val cells = Priorities.map { case (v, name) =>
      coalesce(col(s"`$v`"), lit(0L)).as(name)
    }
    pivoted
      .select(col("o_orderstatus") +: cells: _*)
      .orderBy(col("o_orderstatus"))
  }

  /** CUBE over (status, priority): all four grouping sets from one
    * partial-aggregated pass (Spark expands the grouping-set id into
    * the shuffle key; no per-level rescan). */
  def orderStatusCube(orders: DataFrame): DataFrame =
    orders
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(cents(col("o_totalprice"))).cast("long").as("total_cents"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** Top-k parts per brand by retail price — the window-rank shape the
    * library's TopKWindowRewrite turns into a bounded per-group top-k
    * (`row_topk`) instead of a full per-partition sort. */
  def topPartsPerBrand(part: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    part
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("p_brand"), col("rk"), col("p_partkey"),
        cents(col("p_retailprice")).as("price_cents"))
      .orderBy(col("p_brand"), col("rk"))
  }

  /** Per-customer running order totals: an explicit ROWS frame (Spark's
    * default for an ordered window is RANGE, which merges date ties —
    * the oracle pins ROWS on both sides). Partitions are per-customer
    * (~10 rows each), so the window never concentrates data. */
  def customerRunningTotals(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders
      .select(
        col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        sum(cents(col("o_totalprice"))).over(w).cast("long").as("cum_cents"),
        count(lit(1)).over(w).cast("long").as("cum_orders"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Semi/anti join pair: per market segment, how many customers have
    * at least one urgent-priority order (left_semi) vs none (left_anti).
    * Both joins shuffle on custkey against the same slim filtered side;
    * neither materializes order attributes into the output. */
  def urgentCustomerSplit(customer: DataFrame, orders: DataFrame): DataFrame = {
    val urgent = orders
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    val slim = customer.select(col("c_custkey"), col("c_mktsegment"))
    val withU = slim
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_with_urgent"))
    val withoutU = slim
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_without_urgent"))
    withU
      .join(withoutU, Seq("c_mktsegment"), "full_outer")
      .select(
        col("c_mktsegment"),
        coalesce(col("n_with_urgent"), lit(0L)).as("n_with_urgent"),
        coalesce(col("n_without_urgent"), lit(0L)).as("n_without_urgent"))
      .orderBy(col("c_mktsegment"))
  }
}
