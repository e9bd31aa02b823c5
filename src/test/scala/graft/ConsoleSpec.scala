package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.console.GraftConsole

class ConsoleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("console maps dcafs commands to SQL surface") {
    val c = new GraftConsole(spark)
    c.registerTable("sensor_raw",
      Seq("2.0,3.5,44", "7.5,1.25,44").toDF("line"))

    assert(c.execute("ss").linesIterator.contains("sensor_raw"))
    assert(c.execute("raw:sensor_raw,1").linesIterator.size == 2) // header + 1

    c.addPath(PathSpec("p1", ",", Seq(
      StoreStep(Seq(("v", 0, "double", "-1.0"))))))
    assert(c.execute("pf:list").contains("p1: 1 steps"))
    c.attach("p1", "sensor_raw")
    val out = c.execute("SELECT round(sum(v), 2) AS s FROM p1_out")
    assert(out.linesIterator.toSeq == Seq("s", "9.5"))
    assert(c.execute("st").contains("no active streaming"))
    assert(c.execute("help").nonEmpty)
    // single-line path probe (dcafs editor test())
    val probe = c.execute("pf:test,p1,42.5,x")
    assert(probe.contains("42.5"), probe)
  }

  test("rv lists the rtvals snapshot view (the dcafs rtvals listing)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val c = new GraftConsole(spark)
    val mem = MemoryStream[graft.streaming.ValUpdate]
    val q = graft.streaming.RtVals.snapshots(mem.toDS())
      .writeStream.format("memory").queryName("rtvals").outputMode("update").start()
    try {
      mem.addData(
        graft.streaming.ValUpdate("deck_temp", 19.2, 1),
        graft.streaming.ValUpdate("deck_hum", 55.0, 1))
      q.processAllAvailable()
      val rv = c.execute("rv")
      assert(rv.contains("deck_temp") && rv.contains("19.2"))
      assert(c.execute("st").contains("rtvals"))
    } finally q.stop()
  }

  test("settings:load wires a whole dcafs config into the console") {
    val c = new graft.console.GraftConsole(spark)
    val f = java.nio.file.Files.createTempFile("graft-settings", ".xml")
    java.nio.file.Files.write(f,
      """<das>
        |  <streams>
        |    <stream id="ctd" type="tcp"><address>10.0.0.5:4001</address>
        |      <label>generic:ctd</label></stream>
        |  </streams>
        |  <paths>
        |    <path id="clean" delimiter=","><filter type="start">$</filter></path>
        |  </paths>
        |</das>""".stripMargin.getBytes)
    assert(c.execute(s"settings:load,$f") == "loaded 1 streams, 1 paths")
    assert(c.execute("streams").contains("ctd\ttcp\t10.0.0.5:4001"))
    assert(c.execute("pf:list").contains("clean"))
    assert(c.streamSpec("ctd").exists(_.label == "generic:ctd"))
  }
}
