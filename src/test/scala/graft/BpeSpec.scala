package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Pins TextOps.bpeMerges semantics against a driver-side reference BPE
  * trainer (Sennrich et al. 2016) on corpora chosen to hit the two
  * failure modes of string-rendered merge rules:
  *  - chain merges: in [a,a,a] the rule (a,a) merges LEFT-TO-RIGHT,
  *    NON-OVERLAPPING -> [aa,a]; in [a,a,a,a] -> [aa,aa];
  *  - prefix boundaries: symbol "e" followed by symbol "rt" must NOT
  *    match a rule (e, r) — a symbol can never merge with a PREFIX of
  *    its neighbour.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Reference trainer: list-of-symbols representation, no strings. */
  private def referenceBpe(wordCounts: Map[String, Long],
      iters: Int): Seq[(Int, String, Long)] = {
    var words: Map[Vector[String], Long] =
      wordCounts.map { case (w, c) => w.map(_.toString).toVector -> c }
    val out = Seq.newBuilder[(Int, String, Long)]
    for (it <- 1 to iters) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach { case (syms, c) =>
        syms.zip(syms.tail).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + c
        }
      }
      if (counts.nonEmpty) {
        val (pair, cnt) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((it, pair._1 + pair._2, cnt))
        words = words.groupMapReduce {
          case (syms, _) =>
            val merged = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == pair._1 && syms(i + 1) == pair._2) {
                merged += syms(i) + syms(i + 1); i += 2
              } else { merged += syms(i); i += 1 }
            }
            merged.result()
        } { case (_, c) => c } (_ + _)
      }
    }
    out.result()
  }

  private def run(docs: Seq[String], iters: Int): Seq[(Int, String, Long)] = {
    import spark.implicits._
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    TextOps.bpeMerges(df, "text", iters)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
  }

  private def wc(docs: Seq[String]): Map[String, Long] =
    docs.flatMap(_.split("\\s+")).filter(_.matches("^[a-z]+$"))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("chain merges are left-to-right non-overlapping") {
    // 'aaa' -> [aa, a]; 'aaaa' -> [aa, aa]: iteration 2's pair counts
    // distinguish the correct merge from the separator-consuming bug.
    val docs = Seq("aaa aaa aaaa", "aaaa ab")
    assert(run(docs, 3) == referenceBpe(wc(docs), 3))
  }

  test("a rule never merges with a prefix of a longer symbol") {
    // After (e, r) wins iteration 1, 'ert' contains symbol-seq [er, t]
    // but 'berth' must not let 'e'+'rt'-style prefix matches fire.
    val docs = Seq("er er er ert", "e rt e rt xe rr")
    assert(run(docs, 4) == referenceBpe(wc(docs), 4))
  }

  test("corpus merges match the reference trainer at depth 10") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the merger of the firms was the theme of thether",
      "thin then there themes merge merging merged",
      "parts parting partner part park parse")
    assert(run(docs, 10) == referenceBpe(wc(docs), 10))
  }
}
