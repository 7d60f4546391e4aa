package graft.mimic

import graft.SparkSpec
import graft.mimic.Model._

/** Typed Dataset accessors: encoder round-trips against the fixture tree. */
class ModelSpec extends SparkSpec {

  lazy val root: String = {
    val d = java.nio.file.Files.createTempDirectory("mimic_typed").toString
    Fixtures.writeTree(spark, d)
    d
  }

  test("chartEventsTyped: typed filter + map over real rows") {
    import spark.implicits._
    val src = MimicSource(spark, root)
    val highDose = src.chartEventsTyped
      .filter(e => e.valuenum.exists(_ > 100.0))
      .map(e => e.itemid)
      .collect()
    assert(highDose.toSet === Set(702L)) // the 1000.0 outlier
  }

  test("inputEventsTyped: interval arithmetic through the case class") {
    import spark.implicits._
    val src = MimicSource(spark, root)
    val durations = src.inputEventsTyped
      .map(m => (m.orderid, (m.endtime.getTime - m.starttime.getTime) / 3600000L))
      .collect().toMap
    assert(durations(1L) === 4L && durations(2L) === 24L)
  }

  test("icustaysTyped joins back to DataFrame world losslessly") {
    val src = MimicSource(spark, root)
    assert(src.icustaysTyped.count() === src.icustays.count())
  }
}
