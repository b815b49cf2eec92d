package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 registers here as a named query; each
  * SQL-expressible one also carries an equivalent DuckDB oracle in
  * [[oracleSql]] (same column names, same total order — the driver
  * hash-compares values after sorting columns by name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.aggPricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_pricing_summary"   -> (Relational.aggPricingSummary(_, _)),
    "join_orders_customers" -> (Relational.joinOrdersCustomers(_, _)),
    "topn_revenue"          -> (Relational.topnRevenue(_, _)),
    "window_rank_orders"    -> (Relational.windowRankOrders(_, _)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "agg_pricing_summary"   -> Relational.aggPricingSummarySql,
    "join_orders_customers" -> Relational.joinOrdersCustomersSql,
    "topn_revenue"          -> Relational.topnRevenueSql,
    "window_rank_orders"    -> Relational.windowRankOrdersSql,
  )
}
