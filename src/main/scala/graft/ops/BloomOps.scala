package graft.ops

import graft.functions.BitsetContains
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.functions._

/** Runtime Bloom-filter join pruning — the missing piece between
  * "broadcast the small side" and "shuffle both sides": when the
  * build side is small enough to SUMMARIZE but the join output is
  * needed from a huge probe side, a Bloom filter of the build keys
  * pushed into the probe scan drops most non-matching rows BEFORE the
  * shuffle. False positives only — the exact join that follows removes
  * them — so the composed result is bit-identical to the plain join
  * (which is exactly what the `q_bloom_join` oracle certifies).
  *
  * This is the same pattern as Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter` injection (and TPC-H
  * runtime-filter literature), made explicit as a library op so it
  * composes with any plan stage, not just what the optimizer happens
  * to rewrite. At 100 TB: the probe side never shuffles its pruned-out
  * rows — for a 1% -selective dimension filter that is ~99% of the
  * probe-side shuffle I/O gone; the bitmap itself is a few KB shipped
  * once per task via the serialized plan.
  */
object BloomOps {

  /** Number of set bits (diagnostic: load factor = popCount / mBits). */
  def popCount(words: Array[Long]): Long = words.map(java.lang.Long.bitCount(_).toLong).sum

  /** Build the word-packed bitmap of `numHashes` probe positions per
    * key. Driver-side by design — the build side is the SMALL side of
    * the join (the side a broadcast-hash join would collect in full);
    * the collect here is `≤ min(numHashes·|keys|, mBits)` distinct
    * positions, capped by `mBits` (8 KB of words at 2^16 bits)
    * regardless of input size. Probes use Spark's codegen'd
    * `xxhash64(key, seed)` so build and test sides hash identically.
    */
  def buildBitmap(
      keys: DataFrame, keyCol: String, mBits: Int, numHashes: Int): Array[Long] = {
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0, "mBits must be a power of two ≥ 64")
    require(numHashes >= 1, s"numHashes must be ≥ 1 (got $numHashes)")
    val probes = (0 until numHashes).map(i =>
      pmod(xxhash64(col(keyCol), lit(i)), lit(mBits.toLong)))
    val pos = keys
      .select(explode(array(probes: _*)).as("p"))
      .distinct()
      .collect() // bounded: ≤ min(numHashes·|keys|, mBits) rows
    val words = new Array[Long](mBits >> 6)
    pos.foreach { r =>
      val p = r.getLong(0)
      words((p >>> 6).toInt) |= 1L << (p & 63L).toInt
    }
    words
  }

  /** Codegen'd `mightContain`: AND of `numHashes` bitset probes, each
    * a builtin `xxhash64` + [[BitsetContains]]. No false negatives by
    * construction (same hash family as [[buildBitmap]]).
    */
  def mightContain(
      words: Array[Long], key: Column, mBits: Int, numHashes: Int): Column = {
    require(numHashes >= 1, s"numHashes must be ≥ 1 (got $numHashes)")
    (0 until numHashes).map { i =>
      val pos = pmod(xxhash64(key, lit(i)), lit(mBits.toLong))
      GraftColumnBridge.column(
        BitsetContains(GraftColumnBridge.expression(pos), words))
    }.reduce(_ && _)
  }

  /** Exact inner join with the probe side pre-pruned through a Bloom
    * filter of the build side's keys. Result ≡ `big ⋈ small` (false
    * positives die in the join); the win is that pruned `big` rows
    * never reach the shuffle.
    */
  def bloomPrunedJoin(
      big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
      mBits: Int = 1 << 16, numHashes: Int = 3): DataFrame = {
    // xxhash64 is TYPE-sensitive: the same numeric value hashes
    // differently as int vs bigint, so a type-coerced equi-join would
    // still match while the bitmap silently never does (false
    // negatives — the one failure mode a Bloom filter must not have).
    // Insist the caller aligns types instead of coercing silently.
    val bigType = big.schema(bigKey).dataType
    val smallType = small.schema(smallKey).dataType
    require(bigType == smallType,
      s"bloomPrunedJoin: key types must match exactly for hash equality " +
        s"($bigKey: $bigType vs $smallKey: $smallType — cast one side first)")
    // the small side feeds BOTH the bitmap collect and the join probe —
    // materialize once (evictable; releaseAllCaches contract as other ops)
    val sm = Reuse.materialized(small)
    val words = buildBitmap(sm.select(col(smallKey)), smallKey, mBits, numHashes)
    big
      .filter(mightContain(words, col(bigKey), mBits, numHashes))
      .join(sm, big(bigKey) === sm(smallKey))
  }
}
