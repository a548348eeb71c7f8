package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deploy-scale epoch shuffle ([[graft.ops.EpochOps]]): the positions
  * must be PARTITIONING-INVARIANT (any worker count yields the same
  * global permutation — the property that makes the order recomputable
  * by any node with no stored state) and a true permutation per epoch.
  * The cross-engine value certification runs through
  * q_epoch_shuffle_dist's DuckDB oracle; these specs pin the knobs the
  * oracle can't see.
  */
class EpochOpsSpec extends AnyFunSuite {
  import TestSpark._

  private def order(parts: Int): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    graft.ops.EpochOps.epochOrderDistributed(
      spark, Tables.documents(spark, sf).select(col("doc_id")),
      "doc_id", Seq(0L, 1L, 2L), numPartitions = parts)
      .as[(Long, Long, Long)].collect().sorted.toSeq
  }

  test("positions are invariant to the partition count") {
    assert(order(3) == order(8))
  }

  test("each epoch's positions are an exact 1..n permutation, orders differ across epochs") {
    val rows = order(5)
    val n = Tables.documents(spark, sf).count()
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet == Set(0L, 1L, 2L))
    byEpoch.foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted == (1L to n).toSeq)
    }
    // the permutations must actually differ between epochs (the hash
    // mixes the epoch): identical orders would mean a broken mix
    def perm(e: Long) = byEpoch(e).sortBy(_._3).map(_._2)
    assert(perm(0L) != perm(1L) && perm(1L) != perm(2L))
  }

  test("memo fingerprint changes when a fixture file is rewritten in place") {
    val d = java.nio.file.Files.createTempDirectory("graft_fp_").toFile
    val f = new java.io.File(d, "part-0.parquet")
    java.nio.file.Files.writeString(f.toPath, "aaaa")
    val fp1 = graft.ops.Memos.dirFingerprint(d.getPath)
    java.nio.file.Files.writeString(f.toPath, "bbbbbbbb") // new length
    val fp2 = graft.ops.Memos.dirFingerprint(d.getPath)
    assert(fp1 != fp2, "rewrite under the same path must be a cache MISS")
    assert(graft.ops.Memos.dirFingerprint(d.getPath + "_absent") == "absent")
  }
}
