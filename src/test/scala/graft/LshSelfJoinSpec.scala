package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native banded-LSH self-join operator (round-10,
  * org.apache.spark.sql.graft.LshSelfJoinExec) against the compositional
  * equi-join it replaces: identical pair sets on real corpora and on the
  * null/duplicate/degenerate edges the SQL semantics define, with the
  * plan shape pinned (one clustering exchange of ONE table copy, no
  * join node at all).
  */
class LshSelfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet

  test("parity with the compositional join on the documents fixture") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val native = graft.operators.TextOps
      .lshCandidatePairs(docs, "doc_id", "text", 3, 8, 4)
    val joined = graft.operators.TextOps
      .lshCandidatePairsJoin(docs, "doc_id", "text", 3, 8, 4)
    val n = pairs(native)
    val j = pairs(joined)
    assert(n == j, s"native-only=${(n -- j).take(5)} join-only=${(j -- n).take(5)}")
    assert(n.nonEmpty, "fixture should produce candidates")
    assert(n.forall { case (a, b) => a < b })
  }

  test("null bucket keys and null ids never pair; duplicates collapse") {
    val banded = Seq[(java.lang.Long, java.lang.Integer, String)](
      (1L, 0, "x"), (2L, 0, "x"), (2L, 0, "x"), // dup row -> one id
      (3L, 0, null), (4L, 0, null), // null bh: no pairs
      (5L, null, "y"), (6L, null, "y"), // null band: no pairs
      (null, 0, "z"), (7L, 0, "z"), (8L, 0, "z"), // null id skipped
      (9L, 1, "x") // same bh, different band: different bucket
    ).toDF("doc_id", "band", "bh")
    val got = pairs(org.apache.spark.sql.graft.LshSelfJoin
      .candidatePairs(banded, "doc_id", "band", "bh").distinct())
    assert(got == Set((1L, 2L), (7L, 8L)))
  }

  test("BinaryType bucket keys pair by value, not reference") {
    // round-11 review finding: Objects.equals is REFERENCE equality for
    // Array[Byte], and UnsafeRow.getBinary returns a fresh array per
    // eval — a binary bh column (raw md5 bytes) would never extend a
    // run, so the operator silently emitted ZERO pairs
    val banded = Seq((1L, 0, "x"), (2L, 0, "x"), (3L, 0, "y"))
      .toDF("doc_id", "band", "bh")
      .withColumn("bh", unbase64(base64(col("bh").cast("binary"))))
    assert(banded.schema("bh").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val got = pairs(org.apache.spark.sql.graft.LshSelfJoin
      .candidatePairs(banded, "doc_id", "band", "bh").distinct())
    assert(got == Set((1L, 2L)), s"binary keys must value-match: $got")
  }

  test("column lookup honors case-insensitivity and rejects ambiguity") {
    val banded = Seq((1L, 0, "x"), (2L, 0, "x")).toDF("Doc_ID", "band", "bh")
    val got = pairs(org.apache.spark.sql.graft.LshSelfJoin
      .candidatePairs(banded, "doc_id", "band", "bh").distinct())
    assert(got == Set((1L, 2L)))
    val dup = banded.select(col("Doc_ID"), col("band"), col("bh"),
      col("band").as("BH"))
    val e = intercept[IllegalArgumentException] {
      org.apache.spark.sql.graft.LshSelfJoin
        .candidatePairs(dup, "Doc_ID", "band", "bh")
    }
    assert(e.getMessage.contains("ambiguous"))
  }

  test("single-row buckets and empty input emit nothing") {
    val one = Seq((1L, 0, "a"), (2L, 1, "b")).toDF("doc_id", "band", "bh")
    assert(pairs(org.apache.spark.sql.graft.LshSelfJoin
      .candidatePairs(one, "doc_id", "band", "bh")).isEmpty)
    val empty = Seq.empty[(Long, Int, String)].toDF("doc_id", "band", "bh")
    assert(pairs(org.apache.spark.sql.graft.LshSelfJoin
      .candidatePairs(empty, "doc_id", "band", "bh")).isEmpty)
  }

  test("a bucket emits the full upper triangle across partition boundaries") {
    // 100 ids in one bucket + noise buckets, shuffled input order
    val rows = (1L to 100L).map(i => (i, 0, "hot")) ++
      (101L to 150L).map(i => (i, 1, s"cold${i % 7}"))
    val banded = spark.createDataFrame(
        scala.util.Random.shuffle(rows).toSeq).toDF("doc_id", "band", "bh")
      .repartition(7)
    val got = pairs(org.apache.spark.sql.graft.LshSelfJoin
      .candidatePairs(banded, "doc_id", "band", "bh").distinct())
    val hot = for (a <- 1L to 100L; b <- (a + 1) to 100L) yield (a, b)
    val cold = (101L to 150L).groupBy(_ % 7).values.flatMap { g =>
      val s = g.sorted
      for (i <- s.indices; k <- (i + 1) until s.length) yield (s(i), s(k))
    }
    assert(got == (hot ++ cold).toSet)
  }

  test("plan: one exchange on the bucket key, no join node") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val banded = graft.operators.TextOps
      .bandedSignatures(docs, "doc_id", "text", 3, 8, 4)
    val p = org.apache.spark.sql.graft.LshSelfJoin
      .candidatePairs(banded, "doc_id", "band", "bh")
      .queryExecution.executedPlan.toString
    assert(p.contains("LshSelfJoin"), s"native op missing:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin") &&
      !p.contains("ShuffledHashJoin") && !p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"join node should be gone:\n$p")
    assert(raw"Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"exactly one clustering shuffle:\n$p")
  }
}
