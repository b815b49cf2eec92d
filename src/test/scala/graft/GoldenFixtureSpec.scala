package graft

/** Exact-output pins for the deterministic no-oracle model queries: each
  * pinned query's full sf0.001 output must match its committed golden
  * file (schema, row set, values — doubles under the shared tolerance).
  * See [[GoldenFixtures]] for why this is stronger than the invariant
  * floors, and [[GoldenGen]] for the regeneration workflow. */
class GoldenFixtureSpec extends SparkTestBase {

  private def loadGolden(name: String): Seq[String] = {
    val in = getClass.getResourceAsStream(s"/golden/$name.tsv")
    assert(in != null, s"missing golden fixture /golden/$name.tsv — run GoldenGen")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  GoldenFixtures.Pinned.foreach { name =>
    test(s"$name matches its committed golden fixture") {
      val golden = loadGolden(name)
      val df = SparkEntry.queries(name)(spark, GoldenFixtures.SfDir)
      val (header, lines) = GoldenFixtures.serialize(df)
      assert(header == golden.head,
        s"schema drift:\n  got      $header\n  expected ${golden.head}")
      val expected = golden.tail
      assert(lines.size == expected.size,
        s"row count drift: got ${lines.size}, golden has ${expected.size}")
      val types = GoldenFixtures.headerTypes(header).map(_._2)
      lines.zip(expected).zipWithIndex.foreach { case ((got, exp), rowIdx) =>
        val g = got.split("\t", -1); val e = exp.split("\t", -1)
        assert(g.length == e.length, s"row $rowIdx arity drift")
        types.indices.foreach { i =>
          val same = types(i) match {
            case "double" | "float" =>
              (g(i) == "\\N" && e(i) == "\\N") ||
                (g(i) != "\\N" && e(i) != "\\N" &&
                  GoldenFixtures.doublesClose(g(i).toDouble, e(i).toDouble))
            case _ => g(i) == e(i)
          }
          assert(same,
            s"$name row $rowIdx col $i drift: got '${g(i)}' expected '${e(i)}'\n" +
              s"  got row:    $got\n  golden row: $exp")
        }
      }
    }
  }
}
