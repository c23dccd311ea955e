package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Similarity

/** Pins the LSH hyperplane generator at the documented 100 TB override
  * sizing (GRAFT_LSH_PLANES=18 × GRAFT_LSH_TABLES=16 = 288 planes): every
  * plane distinct and none degenerate. The previous modular-arithmetic
  * generator was periodic in the plane index with period 97 — only 97 of
  * the 288 override planes were distinct and one was the all-+1 plane, so
  * the `1−(1−(1−θ/π)^p)^L` recall sizing rule silently broke past 97
  * planes. The DuckDB oracle mirrors whatever weights wVec emits, so only
  * a structural spec like this can catch generator collapse. */
class HyperplaneSpec extends AnyFunSuite {

  val OverridePlanes = 18 * 16

  test("all 288 planes at the 100 TB override sizing are distinct") {
    val planes = (0 until OverridePlanes).map(Similarity.wVec)
    assert(planes.distinct.size === OverridePlanes)
  }

  test("no plane is degenerate or near-constant") {
    (0 until OverridePlanes).foreach { j =>
      val s = Similarity.wVec(j).sum // all-equal plane would be ±64
      assert(math.abs(s) < 40, s"plane $j has |sum(signs)| = ${math.abs(s)}")
    }
  }

  test("components are balanced across planes (each dim flips sign)") {
    // For every component index, both signs must occur across the plane
    // family — a stuck component would make one embedding dimension
    // invisible to every table.
    val planes = (0 until OverridePlanes).map(Similarity.wVec)
    (0 until Similarity.Dim).foreach { i =>
      val colSum = planes.map(_(i)).sum
      assert(math.abs(colSum) < OverridePlanes, s"component $i never flips")
    }
  }
}
