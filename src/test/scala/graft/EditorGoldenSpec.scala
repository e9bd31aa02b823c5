package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Edits

/** Golden tests for every worked example in the reference's editor help
  * text (EditorForward.java:51-96, base datum "16:25:12") — the closest
  * thing dcafs has to a documented spec of edit semantics.
  */
class EditorGoldenSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val base = "16:25:12"

  private def eval(c: Column): String =
    Seq(base).toDF("line").select(c.as("v")).collect()(0).getString(0)

  test("resplit examples") {
    assert(eval(Edits.resplit(col("line"), ":", "i0-i1", leftoverAppend = true)) == "16-25:12")
    assert(eval(Edits.resplit(col("line"), ":", "i0-i1")) == "16-25")
    assert(eval(Edits.resplit(col("line"), ":", "i2-i1-i0")) == "12-25-16")
    // round-11 review finding: Pattern.split drops trailing empty
    // segments, so ADJACENT or template-trailing refs lost every ref
    // beyond pieces.indices ("a-i0i1" emitted only "a-16")
    assert(eval(Edits.resplit(col("line"), ":", "a-i0i1")) == "a-1625")
    assert(eval(Edits.resplit(col("line"), ":", "i0i1")) == "1625")
  }

  test("listreplace: in-range, below-first and beyond-end indexes") {
    def lr(v: String, first: Int): Option[String] = {
      val r = Seq(v).toDF("f")
        .select(graft.operators.Edits
          .listreplace(col("f"), first, Seq("red", "green", "blue")).as("v"))
        .collect()(0)
      Option(r.getString(0))
    }
    assert(lr("1", 1) == Some("red"))
    assert(lr("3", 1) == Some("blue"))
    // below `first` must be a null no-match, not an element_at error
    // (index 0 raises even in try_element_at) or a silent from-the-END
    // read (negative indexes)
    assert(lr("0", 1) == None)
    assert(lr("-1", 1) == None)
    assert(lr("4", 1) == None) // beyond end stays null
  }

  test("charsplit example: positions 1,4,7 on 16:25:12") {
    // "1,4,7" splits 16:25:12 -> 16:/25:/12 joined by ','
    assert(eval(Edits.charsplit(col("line"), ",", 4, 7)) == "16:,25:,12")
  }

  test("retime example: HH:mm:ss -> HH-mm") {
    assert(eval(Edits.redate(col("line"), "HH:mm:ss", "HH-mm")) == "16-25")
  }

  test("replace / remove examples") {
    assert(eval(Edits.replaceLit(col("line"), "1", "4")) == "46:25:42")
    assert(eval(Edits.removeLit(col("line"), "1")) == "6:25:2")
  }

  test("prepend / append / insert examples") {
    assert(eval(Edits.prepend(col("line"), "time=")) == "time=16:25:12")
    assert(eval(Edits.append(col("line"), " (UTC)")) == "16:25:12 (UTC)")
    assert(eval(Edits.insert(Edits.prepend(col("line"), "time="), 4, "!"))
      == "time!=16:25:12")
  }

  test("cutstart / cutend examples") {
    assert(eval(Edits.cutstart(col("line"), 2)) == ":25:12")
    assert(eval(Edits.cutend(col("line"), 2)) == "16:25:")
  }

  test("regex examples: rexreplace / rexremove / rexkeep / rexsplit") {
    assert(eval(Edits.rexreplace(col("line"), raw"\d+", "x")) == "x:x:x")
    assert(eval(Edits.rexremove(col("line"), raw"\d+")) == "::")
    assert(eval(Edits.rexkeep(col("line"), raw"\d+", "")) == "162512")
    assert(eval(Edits.rexkeep(col("line"), raw"\d+", "-")) == "16-25-12")
  }
}
