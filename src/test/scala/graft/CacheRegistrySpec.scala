package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Semantics of the tracked-cache LRU registry (TextOps.trackCache):
  * bounded live set, oldest-first eviction, plan-keyed dedup, and
  * revalidation of hits after an external clearCache.
  */
class CacheRegistrySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def frame(i: Int) =
    Seq.tabulate(4)(j => (i, j)).toDF(s"a", "b").filter($"a" === i)

  test("registry stays bounded and evicted frames still compute correctly") {
    TextOps.releasePriorCaches()
    val frames = (0 until 36).map { i =>
      val f = TextOps.trackCache(frame(i))
      f.count() // materialize
      f
    }
    // only the most recent <= 32 frames may still hold storage (bound is
    // peak board concurrency x frames-per-build, see trackCache scaladoc)
    val live = frames.count(_.storageLevel != StorageLevel.NONE)
    assert(live <= 32, s"$live frames live, bound is 32")
    // the oldest frames were evicted but remain correct (recompute)
    assert(frames.head.storageLevel == StorageLevel.NONE)
    assert(frames.head.collect().length == 4)
    TextOps.releasePriorCaches()
    assert(frames.count(_.storageLevel != StorageLevel.NONE) == 0)
  }

  test("re-tracking the same plan does not double-cache or evict") {
    TextOps.releasePriorCaches()
    val a = TextOps.trackCache(frame(100))
    a.count()
    // same canonical plan, new DataFrame object: must reuse a's blocks
    val b = TextOps.trackCache(frame(100))
    assert(b.storageLevel != StorageLevel.NONE)
    assert(b.collect().sorted(Ordering.by((r: org.apache.spark.sql.Row) =>
      r.getInt(1))).length == 4)
    TextOps.releasePriorCaches()
  }

  test("a hit invalidated by external clearCache is re-cached") {
    TextOps.releasePriorCaches()
    val a = TextOps.trackCache(frame(200))
    a.count()
    spark.catalog.clearCache() // external invalidation
    assert(a.storageLevel == StorageLevel.NONE)
    val b = TextOps.trackCache(frame(200))
    b.count()
    assert(b.storageLevel != StorageLevel.NONE,
      "stale registry hit must re-cache after external unpersist")
    TextOps.releasePriorCaches()
  }
}
