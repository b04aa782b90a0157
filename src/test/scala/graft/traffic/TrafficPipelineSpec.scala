package graft.traffic

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.SparkSpec

class TrafficPipelineSpec extends SparkSpec {

  /** Render the raw fixture as a paged-JSON landing file. */
  private lazy val landing: String = {
    val rows = TrafficFixture.raw(spark, 300).toJSON.collect()
    val p = Files.createTempFile("landing", ".jsonl")
    Files.write(p, rows.mkString("\n").getBytes(StandardCharsets.UTF_8))
    p.toString
  }

  test("end-to-end: paged-JSON landing -> normalize -> all seven analyses") {
    val norm = TrafficPipeline.load(spark, landing, pageSize = 100)
    assert(norm.count() > 250)
    val results = TrafficPipeline.analyses(norm)
    assert(results.map(_._1).toSet.size == 7)
    results.foreach { case (name, df) =>
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("end-to-end model battery produces finite metrics") {
    val norm = TrafficPipeline.load(spark, landing, pageSize = 100)
    val reports = TrafficPipeline.models(norm, numTrees = 3)
    assert(reports.length == 4)
    assert(reports.forall(_._2.nonEmpty))
  }
}
