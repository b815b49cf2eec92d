package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scratch: time named variants to isolate a perf anomaly.
  * Not part of the driver contract. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/testdata_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.functions.TopKPairs.register(spark)

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val orders = Tables.orders(spark, sfDir)
      .select($"o_orderstatus",
        ($"o_totalprice".cast("decimal(12,2)") * 100).cast("long").as("price_cents"),
        $"o_orderkey")
    orders.cache().count()

    time("warm_count")(orders.count())
    time("builtin_max")(
      orders.groupBy($"o_orderstatus").agg(max($"price_cents")).collect())
    time("graft_topk_cached")(
      orders.groupBy($"o_orderstatus")
        .agg(expr("graft_topk(price_cents, o_orderkey, 3)")).collect())
    orders.unpersist()
    time("graft_topk_scan")(
      Tables.orders(spark, sfDir)
        .select($"o_orderstatus",
          ($"o_totalprice".cast("decimal(12,2)") * 100).cast("long").as("price_cents"),
          $"o_orderkey")
        .groupBy($"o_orderstatus")
        .agg(expr("graft_topk(price_cents, o_orderkey, 3)")).collect())
    time("builtin_max_by_scan")(
      Tables.orders(spark, sfDir)
        .select($"o_orderstatus",
          ($"o_totalprice".cast("decimal(12,2)") * 100).cast("long").as("price_cents"),
          $"o_orderkey")
        .groupBy($"o_orderstatus").agg(max_by($"o_orderkey", $"price_cents")).collect())
    spark.stop()
  }
}
