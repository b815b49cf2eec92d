package graft

import graft.plans.GraftOps

/** Unit coverage for the custom as-of join operator on a crafted fixture
  * that exercises every merge edge: equal-time match (>= semantics),
  * latest-of-several, no-right-key, right-only key, and times strictly
  * after the left row. The sf-scale behavior is covered by the
  * `join_asof_native` oracle query (identical hash to DuckDB's native
  * `ASOF LEFT JOIN`) and the plan assert in OperatorSpec.
  */
class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def fixture() = {
    // shuffle.partitions=4 in the test session → EnsureRequirements must
    // genuinely co-partition both sides for the merge to see all pairs
    val left = Seq(
      (1L, 5L, "a"),   // equal-time right row exists (>= includes it)
      (1L, 10L, "b"),  // several earlier rights: the LATEST must win
      (2L, 7L, "c"),   // right key exists but only with a later time
      (3L, 1L, "d")    // key absent on the right entirely
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 3L, "r13"), (1L, 5L, "r15"), (1L, 9L, "r19"),
      (2L, 8L, "r28"),
      (4L, 1L, "r41")  // right-only key: must never leak into the output
    ).toDF("rk", "rt", "rv")
    (left, right)
  }

  test("as-of merge: equal-time, latest-wins, and unmatched-null semantics") {
    val (left, right) = fixture()
    val out = GraftOps.asofJoin(left, right, "k", "rk", "t", "rt")
      .select($"tag", $"rv").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("a" -> "r15", "b" -> "r19", "c" -> null, "d" -> null))
  }

  test("as-of output preserves every left row exactly once") {
    val (left, right) = fixture()
    val out = GraftOps.asofJoin(left, right, "k", "rk", "t", "rt")
    assert(out.count() == left.count())
    assert(out.columns.toSeq == Seq("k", "t", "tag", "rk", "rt", "rv"))
  }

  test("as-of rejects mismatched key/time types loudly") {
    val (left, right) = fixture()
    val badRight = right.withColumn("rt", $"rt".cast("int"))
    val e = intercept[IllegalArgumentException] {
      GraftOps.asofJoin(left, badRight, "k", "rk", "t", "rt")
    }
    assert(e.getMessage.contains("time types differ"))
  }
}
