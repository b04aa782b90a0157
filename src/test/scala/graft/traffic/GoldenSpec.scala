package graft.traffic

import scala.io.Source

import graft.SparkSpec

/** Pins the full batch pipeline against checked-in golden CSVs — any
  * semantic drift in Normalize or an analysis fails here with a diff. */
class GoldenSpec extends SparkSpec {

  private lazy val norm = Normalize(TrafficFixture.raw(spark, 1000)).cache()

  test("all analyses match their checked-in goldens") {
    GoldenTool.analyses(norm).foreach { case (name, df) =>
      val url = getClass.getResource(s"/goldens/$name.csv")
      assert(url != null,
        s"golden missing for $name — run: sbt 'Test/runMain graft.traffic.GoldenTool'")
      val expected = Source.fromURL(url, "UTF-8").mkString
      val got = GoldenTool.toCsv(df)
      assert(got == expected, s"golden mismatch for $name")
    }
  }
}
