package graft

import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalatest.funsuite.AnyFunSuite

/** The DTW DP kernel (Impls.dtwDist): known values, identity, symmetry,
  * shift tolerance vs Euclidean, degenerate inputs.
  */
class DtwSpec extends AnyFunSuite {
  private def d(a: Seq[Long], b: Seq[Long]): Long =
    graft.functions.Impls.dtwDist(
      ArrayData.toArrayData(a.toArray), ArrayData.toArrayData(b.toArray))

  test("known value, identity, symmetry") {
    // hand-checked DP (matches the DuckDB recursive-CTE prototype)
    assert(d(Seq(1L, 3, 4, 9, 8, 2, 1, 5, 7, 3),
      Seq(2L, 0, 0, 8, 7, 4, 3, 0, 0, 1)) == 27L)
    val x = Seq(5L, 9, 2, 7, 7, 1)
    assert(d(x, x) == 0L)
    val y = Seq(4L, 9, 3, 6, 8, 2)
    assert(d(x, y) == d(y, x))
  }

  test("alignment tolerance: a phase-shifted copy is closer than pointwise") {
    val a = Seq(0L, 0, 10, 10, 10, 0, 0, 0)
    val shifted = Seq(0L, 0, 0, 10, 10, 10, 0, 0)
    val pointwise = a.zip(shifted).map { case (x, y) => math.abs(x - y) }.sum
    assert(d(a, shifted) < pointwise, "warping must beat rigid alignment")
  }

  test("unequal lengths and degenerate inputs") {
    assert(d(Seq(3L), Seq(3L, 3, 3, 3)) == 0L) // one point warps across
    assert(d(Seq(1L), Seq(4L)) == 3L)
    assert(d(Seq.empty, Seq(1L, 2)) == -1L)
    assert(d(Seq(1L, 2), Seq.empty) == -1L)
  }

  test("adversarial inputs saturate instead of wrapping; null elements -> -1") {
    // |MinValue - MaxValue| overflows Long; the user-callable dtw_dist
    // must not silently wrap (round-9 advice)
    val sat = d(Seq(Long.MinValue), Seq(Long.MaxValue))
    assert(sat > 0L && sat <= Long.MaxValue / 4, s"expected saturation, got $sat")
    // a long series of extreme costs must not wrap the running sum either
    val many = d(Seq.fill(64)(Long.MinValue), Seq.fill(64)(Long.MaxValue))
    assert(many > 0L && many <= Long.MaxValue / 4)
    // abs(MinValue) alone is also UB without the guard
    assert(d(Seq(Long.MinValue), Seq(0L)) == Long.MaxValue / 4)
    // null elements (ArrayType(LongType) permits them) -> no alignment
    val withNull = ArrayData.toArrayData(Array[Any](1L, null, 3L))
    val clean = ArrayData.toArrayData(Array[Any](1L, 2L))
    assert(graft.functions.Impls.dtwDist(withNull, clean) == -1L)
    assert(graft.functions.Impls.dtwDist(clean, withNull) == -1L)
  }
}
