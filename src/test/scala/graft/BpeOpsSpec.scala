package graft

import graft.ops.BpeOps
import org.scalatest.funsuite.AnyFunSuite

/** Edge semantics of BPE merge learning the corpus oracle may never
  * pin down: greedy-leftmost overlap handling, frequency weighting,
  * deterministic tiebreak, and running the vocabulary dry.
  */
class BpeOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("learnMerges: overlap is greedy-leftmost, merges chain, dry stop") {
    import spark.implicits._
    // words: aaa ×2, ab ×1  →  round 1 pairs: (a,a)=4 [two per "aaa",
    // weighted by freq 2 — NOT 6: the middle 'a' can't pair twice
    // after the leftmost merge, but pair COUNTING sees both adjacent
    // pairs], (a,b)=1
    val docs = Seq((1L, "aaa aaa ab")).toDF("doc_id", "text")
    val merges = BpeOps.learnMerges(docs, "text", rounds = 10)
    assert(merges.map(m => (m.rank, m.s1, m.s2, m.cnt)) === Seq(
      (1, "a", "a", 4L),  // "aaa" renders to aa|a| — leftmost wins
      (2, "aa", "a", 2L), // chained: uses round 1's new symbol
      (3, "a", "b", 1L))) // then the vocab runs dry: 3 merges, not 10
  }

  test("learnMerges: ties break lexicographically") {
    import spark.implicits._
    // "zy" and "ab" both have exactly one pair with freq 1
    val docs = Seq((1L, "zy ab")).toDF("doc_id", "text")
    val first = BpeOps.learnMerges(docs, "text", rounds = 1).head
    assert((first.s1, first.s2) === ("a", "b"))
  }

  test("wordFreqs keeps only pure [a-z]+ words (separator can never collide)") {
    import spark.implicits._
    val docs = Seq((1L, "ok o|k 123 mixed9 fine")).toDF("doc_id", "text")
    val words = BpeOps.wordFreqs(docs, "text")
      .collect().map(_.getString(0)).sorted
    assert(words === Array("fine", "ok"))
  }
}
