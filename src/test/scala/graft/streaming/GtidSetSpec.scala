package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class GtidSetSpec extends AnyFunSuite {

  test("parse/format round-trip of the canonical MySQL text form") {
    assert(GtidSet.parse("") === Vector.empty)
    assert(GtidSet.parse("1-5:7:9-12") === Vector((1L, 5L), (7L, 7L), (9L, 12L)))
    assert(GtidSet.format(Vector((1L, 5L), (7L, 7L))) === "1-5:7")
  }

  test("add coalesces adjacent and overlapping intervals") {
    assert(GtidSet.add("", 3) === "3")
    assert(GtidSet.add("3", 5) === "3:5")
    assert(GtidSet.add("3:5", 4) === "3-5") // gap closes into one interval
    assert(GtidSet.add("1-5", 3) === "1-5") // idempotent inside
    assert(GtidSet.add("1-5", 6) === "1-6") // adjacency extends
  }

  test("contains answers membership across intervals") {
    val s = "1-5:7:9-12"
    assert(Seq(1L, 5L, 7L, 9L, 12L).forall(GtidSet.contains(s, _)))
    assert(Seq(0L, 6L, 8L, 13L).forall(!GtidSet.contains(s, _)))
    assert(!GtidSet.contains("", 1L))
  }

  test("union merges a Previous_gtids interval block") {
    assert(GtidSet.union("5-8", Vector((1L, 4L), (10L, 11L))) === "1-8:10-11")
    assert(GtidSet.union("", Vector((2L, 3L))) === "2-3")
  }

  test("property: any insertion order yields the same canonical set") {
    val gen = Gen.listOfN(30, Gen.chooseNum(1L, 20L))
    val cases = (0 until 50).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(7L + i)))
    cases.foreach { gnos =>
      val inOrder = gnos.sorted.foldLeft("")(GtidSet.add)
      val shuffled = gnos.foldLeft("")(GtidSet.add)
      assert(inOrder === shuffled)
      gnos.foreach(g => assert(GtidSet.contains(shuffled, g)))
      // intervals are sorted, disjoint, non-adjacent (canonical)
      val iv = GtidSet.parse(shuffled)
      iv.sliding(2).foreach {
        case Vector((_, b1), (a2, _)) => assert(a2 > b1 + 1)
        case _ => ()
      }
    }
  }
}
