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
  }

  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    register(spark, dir)
    spark.sql(query)
  }
}
