package graft

import org.apache.spark.sql.types._

/** Pins the physical schema of every driver-provided parquet table.
  *
  * The driver regenerates `/root/testdata` between (and sometimes
  * during) rounds, and physical types have changed across generations —
  * `events.ts` has shipped as TIMESTAMP(NANOS) and as
  * TIMESTAMP(MICROS)/NTZ. When that happens, downstream symptoms are a
  * shotgun blast of analysis errors across unrelated suites; this spec
  * exists so the FIRST failure is one assertion naming the exact table
  * and column that moved, with a pointer at what to do about it.
  *
  * `events` is asserted post-normalization (the catalog's contract is a
  * microsecond TimestampType whatever the file carried); every other
  * table is asserted as-read, because pass-through is what keeps Spark
  * and the DuckDB oracle reading identical values.
  */
class TestdataContractSpec extends SparkTestBase {

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  test("every raw table matches the generation this build was verified against") {
    for ((table, cols) <- expected.toSeq.sortBy(_._1)) {
      val got = Tables.table(spark, sfDir, table).schema
        .map(f => f.name -> f.dataType)
      assert(got == cols,
        s"""testdata generation changed for '$table':
           |  expected: $cols
           |  found:    $got
           |The driver regenerated /root/testdata with different physical
           |types. Re-run the full gate (sbt test, graft.Verify + tools/
           |check.py, graft.Bench) and adapt the reader in graft.Tables if
           |the oracle still hash-matches — see Tables.normalizeEventTs for
           |the pattern.""".stripMargin)
    }
  }

  test("the events catalog contract is a microsecond TimestampType, any generation") {
    // asserted through the catalog, not the raw file: consumers only ever
    // see the normalized shape
    val ts = Tables.events(spark, sfDir).schema("ts").dataType
    assert(ts == TimestampType,
      s"Tables.events must normalize ts to TimestampType, got $ts")
  }

  test("long-typed events.ts stays in the nanos-magnitude epoch range the reader assumes") {
    // Tables.normalizeEventTs treats a LongType ts as a NANOS epoch and
    // (deliberately) raise_error's on 0 < |ts| < 1e17 — values that
    // would be legitimate nanos instants between ~1966 and ~1973 but are
    // far more likely a silent micros-as-long regeneration. That guard
    // is only sound while the generated data actually stays current-era;
    // this test pins that ASSUMPTION against the live testdata, so a
    // future generation with early timestamps fails HERE (one assertion
    // naming the contract) instead of crashing every events consumer
    // mid-scan. If this fires: extend normalizeEventTs to an
    // aggregate-level magnitude probe before relaxing the per-row guard.
    import org.apache.spark.sql.functions._
    val raw = Tables.table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        val r = raw.agg(
          min(abs(col("ts"))).as("mn"), max(abs(col("ts"))).as("mx")).head()
        val (mn, mx) = (r.getLong(0), r.getLong(1))
        assert(mn == 0L || mn >= 100000000000000000L,
          s"events.ts long values dip below nanos magnitude (min |ts| = $mn): " +
            "the current-era assumption behind normalizeEventTs no longer holds")
        assert(mx < 4102444800L * 1000000000L, // ~year 2100 in nanos
          s"events.ts long values exceed plausible nanos range (max |ts| = $mx)")
      case _ => // micros/NTZ generations: the guard is not in play
    }
  }
}
