package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Content-defined chunking's reason to exist, asserted directly: a
  * prefix edit re-synchronizes at the first content-defined boundary,
  * so all downstream chunks keep their digests — where fixed-size
  * chunking would shift every one of them.
  */
class CdcChunkSpec extends AnyFunSuite {
  import TestSpark._

  private def chunks(text: String) = {
    import spark.implicits._
    graft.queries.CurationQueries
      .cdcChunkRows(Seq((1L, text)).toDF("doc_id", "text"))
      .orderBy(col("chunk_idx"))
      .collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getString(4)))
  }

  // deterministic pseudo-text long enough to carry many boundaries
  private val base = {
    val rnd = new scala.util.Random(7)
    (1 to 4000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
  }

  test("chunks cover the text exactly, in order, without overlap") {
    val cs = chunks(base)
    assert(cs.head._1 === 0L)
    assert(cs.map(_._2).sum === base.length.toLong)
    cs.sliding(2).foreach {
      case Array((s1, l1, _), (s2, _, _)) => assert(s1 + l1 === s2)
      case _ => ()
    }
  }

  test("a prefix edit re-synchronizes: downstream chunk digests survive") {
    val orig = chunks(base).map(_._3)
    val edited = chunks("EDIT-INSERTED-PREFIX " + base).map(_._3)
    val shared = orig.toSet.intersect(edited.toSet).size
    // everything past the first boundary after the edit must be intact
    assert(shared >= orig.length - 2,
      s"only $shared of ${orig.length} chunk digests survived a prefix edit")
  }

  test("fixed-grid chunking (the contrast) loses every chunk on the same edit") {
    def grid(text: String) =
      text.grouped(64).map(g => java.util.UUID.nameUUIDFromBytes(g.getBytes)).toSeq
    val shared = grid(base).toSet.intersect(grid("X" + base).toSet).size
    assert(shared === 0, "the fixed grid accidentally survived — weak contrast fixture")
  }

  test("short and empty docs degrade gracefully") {
    assert(chunks("tiny").toSeq === Seq((0L, 4L,
      org.apache.commons.codec.digest.DigestUtils.md5Hex("tiny"))))
    assert(chunks("").isEmpty)
  }
}
