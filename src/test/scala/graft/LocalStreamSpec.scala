package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.LocalLineBus

/** LocalStream loopback (reference `io/stream/LocalStream.java:12-19`):
  * a path's output re-enters the engine as another path's source with no
  * socket in between, carrying the loopback's configured label for
  * downstream routing.
  */
class LocalStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("two compiled paths chain through the loopback with label routing") {
    implicit val sc = spark.sqlContext
    // PATH 1: raw NMEA-ish frames -> filter + math (scale i1 by 10) ->
    // loopback sink under channel "convert"
    val p1 = PathSpec("ingest", ",", Seq(
      FilterStep(Seq("i0 above 0")),
      MathStep(Seq(1 -> "i1 * 10"))))
    val mem = MemoryStream[String]
    val in = mem.toDF().select(col("value").as("line"),
      lit("mem").as("origin"), current_timestamp().as("ts"))
    val sinkQ = LineSinks.loopback(PathCompiler.compile(p1, in), "convert")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-loop-sink").toString)
      .start()
    // PATH 2: loopback source (label "converted") -> label-routed branch ->
    // store step, into a memory table
    val src = spark.readStream.format("graft.sources.LocalLineSource")
      .option("id", "convert").option("label", "converted").load()
    assert(src.columns.toSeq == Seq("line", "origin", "ts", "label"))
    val routed = src.filter(col("label") === "converted") // label dispatch
    val p2 = PathSpec("store", ",", Seq(
      StoreStep(Seq(("a", 0, "double", "-1.0"), ("b", 1, "double", "-1.0")))))
    val outQ = PathCompiler.compile(p2, routed)
      .writeStream.format("memory").queryName("loop_out")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-loop-src").toString)
      .outputMode("append").start()
    try {
      mem.addData("2.0,3.5", "-1.0,9.9", "4.0,1.25")
      sinkQ.processAllAvailable() // path 1 pushes onto the bus
      outQ.processAllAvailable() // path 2 drains it
      val got = spark.table("loop_out").orderBy("a").collect()
      assert(got.length == 2, "filter step must drop the negative frame")
      assert(got.map(r => (r.getAs[Double]("a"), r.getAs[Double]("b"))).toSeq ==
        Seq((2.0, 35.0), (4.0, 12.5)))
    } finally { sinkQ.stop(); outQ.stop() }
  }

  test("lines pushed before any subscriber park bounded and drain on subscribe") {
    LocalLineBus.push("park-test", "early-1")
    LocalLineBus.push("park-test", "early-2")
    val got = scala.collection.mutable.ArrayBuffer.empty[String]
    val f: (String, Long) => Unit = (l, _) => { got += l; () }
    LocalLineBus.subscribe("park-test", f)
    assert(got.toSeq == Seq("early-1", "early-2"), "pending lines drain in order")
    LocalLineBus.push("park-test", "live-3")
    assert(got.toSeq == Seq("early-1", "early-2", "live-3"))
    LocalLineBus.unsubscribe("park-test", f)
    LocalLineBus.push("park-test", "parked-again")
    assert(got.length == 3, "unsubscribed consumer no longer receives")
  }
}
