package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL entry point: registers every testdata table as a temp view (plus
  * the `graft_dot` function) so users can run plain Spark SQL against the
  * same catalog the operator library uses:
  *
  * {{{
  *   graft.Sql.register(spark, "/root/testdata/sf0.01")
  *   spark.sql("SELECT l_returnflag, sum(l_quantity) FROM lineitem GROUP BY 1")
  * }}}
  *
  * Views are lazy — registering costs one parquet footer read per table;
  * Catalyst still pushes filters/pruning into the scans underneath. */
object Sql {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def register(spark: SparkSession, dir: String): Unit = {
    tableNames.filterNot(_ == "events").foreach { t =>
      Tables.table(spark, dir, t).createOrReplaceTempView(t)
    }
    // events goes through the nanos→micros conversion reader
    Tables.events(spark, dir).createOrReplaceTempView("events")
    graft.functions.FixedPointDotProduct.register(spark)
    graft.functions.TopKPairs.register(spark)
  }

  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    register(spark, dir)
    spark.sql(query)
  }

  /** TPC-H Q3-style shipping-priority query, registered to prove the SQL
    * entry point end-to-end: ONE shared ANSI text runs verbatim on both
    * Spark (via [[sql]]) and the DuckDB oracle — the revenue sum rides
    * the exact-decimal pattern, the date literal and LIMIT are portable,
    * and the total order (revenue DESC, l_orderkey) is tie-broken. */
  val shippingPrioritySql: String =
    """SELECT l_orderkey,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |           * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
      |  o_orderpriority
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING'
      |  AND c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
      |GROUP BY l_orderkey, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  def sqlShippingPriority(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir, shippingPrioritySql)

  /** TPC-H Q13-style customer order-count distribution: how many
    * customers placed exactly k orders, INCLUDING the zero-order
    * customers the left outer join preserves. ONE shared ANSI text on
    * both engines. Plan shape: outer hash join on the customer key, then
    * two cascaded aggregations whose second input is one row per customer
    * — the histogram never sees the fact table again. */
  val customerDistributionSql: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (
      |  SELECT c.c_custkey AS ck, count(o.o_orderkey) AS c_count
      |  FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
      |  GROUP BY c.c_custkey) t
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  def sqlCustomerDistribution(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir, customerDistributionSql)

  /** TPC-H Q2-style correlated scalar subquery (adapted to this schema:
    * lineitem doubles as the part-supplier price list): for every large
    * part, the supplier(s) selling it at the minimum observed price.
    * ONE shared ANSI text on both engines. Catalyst decorrelates the
    * scalar subquery into a per-part min aggregate + equi-join — no
    * per-row re-execution — and the outer three-way join stays on key
    * columns. `min_price` is a SELECTED parquet double (no arithmetic),
    * so equality and ordering are exact on both engines; DISTINCT makes
    * rows unique on (p_partkey, s_name), which the ORDER BY totally
    * orders. */
  val minCostSupplierSql: String =
    """SELECT DISTINCT p.p_partkey, p.p_brand, s.s_name,
      |       l.l_extendedprice AS min_price
      |FROM part p, lineitem l, supplier s
      |WHERE l.l_partkey = p.p_partkey
      |  AND s.s_suppkey = l.l_suppkey
      |  AND p.p_size >= 40
      |  AND l.l_extendedprice = (
      |    SELECT min(l2.l_extendedprice) FROM lineitem l2
      |    WHERE l2.l_partkey = p.p_partkey)
      |ORDER BY p_partkey, s_name""".stripMargin

  def sqlMinCostSupplier(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir, minCostSupplierSql)

  /** TPC-H Q5-style local-supplier volume: revenue per nation for one
    * region and one order year, where the lineitem's supplier and the
    * order's customer share a nation. ONE shared ANSI text on both
    * engines. This is the join-REORDER showcase: six relations in an
    * unordered comma list, and Catalyst must (and does) build the tree
    * selective-first — region filter → nation → broadcast down the
    * customer/supplier sides, never materializing the unconstrained
    * cross products the syntactic order implies. The revenue expression
    * rides the exact-decimal pattern; ties break on n_name. */
  val localSupplierVolumeSql: String =
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |           * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey
      |  AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey
      |  AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  def sqlLocalSupplierVolume(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir, localSupplierVolumeSql)

  /** TPC-H Q4-style correlated EXISTS (adapted: this lineitem has no
    * commit/receipt dates, so "late" orders become orders with a returned
    * line). ONE shared ANSI text on both engines. Catalyst rewrites the
    * correlated EXISTS into a LEFT SEMI hash join on `l_orderkey` — the
    * subquery never re-executes per row — and only then aggregates, so
    * the fact table is touched exactly once. The count is an exact
    * integer; the 5-priority output is totally ordered. */
  val orderPriorityExistsSql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders o
      |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_returnflag = 'R')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  def sqlOrderPriorityExists(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir, orderPriorityExistsSql)

  /** TPC-H Q10-style returned-item revenue: top-20 customers by revenue
    * lost to returns in a six-month window. ONE shared ANSI text on both
    * engines. The selective pieces (date range on orders, returnflag on
    * lineitem) sit in the WHERE clause as pushable conjuncts — both
    * reach their parquet scans — and the revenue sum rides the
    * exact-decimal pattern. Top-20 plans as TakeOrderedAndProject (no
    * global sort); revenue DESC ties break on c_custkey. */
  val returnedItemRevenueSql: String =
    """SELECT c.c_custkey, c.c_name, n.n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |           * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      |FROM customer c, orders o, lineitem l, nation n
      |WHERE c.c_custkey = o.o_custkey
      |  AND l.l_orderkey = o.o_orderkey
      |  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      |  AND l.l_returnflag = 'R'
      |  AND c.c_nationkey = n.n_nationkey
      |GROUP BY c.c_custkey, c.c_name, n.n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  def sqlReturnedItemRevenue(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir, returnedItemRevenueSql)

  /** TPC-H Q14-style promotion share: one month of lineitem joined to
    * part, split into promo vs total revenue by conditional aggregation.
    * ONE shared ANSI text on both engines. Numerator and denominator are
    * emitted as separate exact-decimal sums instead of a ratio — decimal
    * division rounds differently across engines, and a downstream reader
    * dividing two exact doubles gets the same IEEE result everywhere.
    * Part (the dimension side) broadcasts; the one-month shipdate filter
    * is pushed into the lineitem scan. */
  val promoRevenueSql: String =
    """SELECT
      |  CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
      |       THEN CAST(l_extendedprice AS DECIMAL(12,2))
      |            * (1 - CAST(l_discount AS DECIMAL(12,2)))
      |       ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS promo_revenue,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |           * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS total_revenue,
      |  count(*) AS n_lines
      |FROM lineitem, part
      |WHERE l_partkey = p_partkey
      |  AND l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin

  def sqlPromoRevenue(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir, promoRevenueSql)

  /** TPC-H Q15-style top supplier: a revenue CTE reused twice — once as
    * the join side, once inside a scalar `max` subquery. ONE shared ANSI
    * text on both engines. Catalyst plans the CTE once per reference but
    * the scalar max collapses to a 1-row broadcast; the revenue equality
    * compares two decimal-derived doubles that are bit-identical on both
    * engines (same exact-decimal sum, cast once). */
  val topSupplierSql: String =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |             * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
      |      AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier, revenue
      |WHERE s_suppkey = supplier_no
      |  AND total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  def sqlTopSupplier(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir, topSupplierSql)

  /** TPC-H Q18-style large-volume orders: a HAVING-filtered aggregate
    * subquery (orders whose line quantities sum past a threshold) feeds
    * an IN predicate — Catalyst rewrites it to a LEFT SEMI join against
    * the aggregated side, so the HAVING filter prunes BEFORE the 3-way
    * join. ONE shared ANSI text on both engines; quantity sums ride the
    * exact-decimal pattern and the top-20 is tie-broken on o_orderkey. */
  val largeOrdersSql: String =
    """SELECT c_name, c_custkey, o_orderkey,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
      |FROM customer, orders, lineitem
      |WHERE o_orderkey IN (
      |    SELECT l_orderkey FROM lineitem
      |    GROUP BY l_orderkey
      |    HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 250)
      |  AND c_custkey = o_custkey
      |  AND o_orderkey = l_orderkey
      |GROUP BY c_name, c_custkey, o_orderkey
      |ORDER BY total_qty DESC, o_orderkey
      |LIMIT 20""".stripMargin

  def sqlLargeOrders(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir, largeOrdersSql)

  /** TPC-H Q6-style revenue forecast: the canonical PURE-PUSHDOWN query
    * — single table, three conjunctive range predicates, one aggregate,
    * no join, no group. All three predicates reach the parquet scan as
    * PushedFilters (row groups outside the year are skipped on
    * min/max stats), which is the whole point of the shape at 100 TB:
    * the scan, not the agg, is the query. ONE shared ANSI text; the
    * revenue product rides the exact-decimal pattern, and BETWEEN on
    * parquet doubles compares stored values exactly. */
  val forecastRevenueSql: String =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |             * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  def sqlForecastRevenue(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir, forecastRevenueSql)
}
