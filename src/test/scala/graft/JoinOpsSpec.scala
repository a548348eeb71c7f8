package graft

import graft.ops.JoinOps
import org.scalatest.funsuite.AnyFunSuite

/** Edge semantics of the as-of join that the data-driven oracle may
  * never exercise: equal-timestamp inclusivity, no-prior-match nulls,
  * and non-interference between keys.
  */
class JoinOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("asofJoin: inclusive bound, no-prior nulls, per-key isolation") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, "p1"), // exact tie with right at 100 -> matches r100
      (1L, 50L, "p2"),  // before any right row -> nulls
      (1L, 250L, "p3"), // after both -> latest (200)
      (2L, 300L, "p4")  // other key: only right at 150
    ).toDF("k", "lts", "pid")
    val right = Seq(
      (1L, 100L, "r100"),
      (1L, 200L, "r200"),
      (2L, 150L, "r150")
    ).toDF("k", "rts", "rid")

    val got = JoinOps.asofJoin(left, right,
      keyCol = "k", leftTsCol = "lts", rightTsCol = "rts",
      rightValCols = Seq("rts", "rid"))
      .select("pid", "rid", "rts")
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toMap

    assert(got("p1") === Some("r100")) // ties are inclusive
    assert(got("p2") === None)         // nothing at-or-before
    assert(got("p3") === Some("r200")) // latest wins
    assert(got("p4") === Some("r150")) // keys don't leak
  }
}
