package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Thread-scaling probe: the same data-dominated kernels ProbeScale
  * stresses (8×-replicated sf0.1 corpus), run at local[2] / local[8] /
  * local[32] — the direct answer to "would more executors help", which
  * neither the SF sweep (fixed-cost-dominated) nor the replication
  * probe (fixed 32 threads) measures. A kernel whose wall doesn't drop
  * with cores is driver-bound or skew-bound and would NOT scale out;
  * these must all show real speedup to back the 100 TB posture.
  *
  * Usage: runMain graft.tools.ProbeParallel [replication=8]
  */
object ProbeParallel {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(8)
    val sfDir = "/root/testdata/sf0.1"

    def kernels(spark: SparkSession): Seq[(String, () => Long)] = {
      val docs0 = graft.Tables.documents(spark, sfDir)
      val docs = (0 until k).map(i =>
        docs0.select((col("doc_id") + lit(i.toLong * 1000000000L)).as("doc_id"),
          col("text"), col("lang"), col("source")))
        .reduce(_ unionByName _)
      val emb0 = graft.Tables.embeddings(spark, sfDir)
      val emb = (0 until k).map(i =>
        emb0.select((col("vec_id") + lit(i.toLong * 1000000000L)).as("vec_id"),
          col("embedding"), col("label")))
        .reduce(_ unionByName _)
      val li0 = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      val li = (0 until k).map(_ => li0).reduce(_ unionByName _)
      graft.functions.GraftFunctions.register(spark)
      Seq(
        // pure codegen map compute — no scan IO, no shuffle, no
        // barrier: the engine's raw per-core arithmetic throughput
        "map: 512M-row codegen compute" -> (() =>
          spark.range(512L * 1000 * 1000)
            .selectExpr("sum(sqrt(id * 1.0001) + sin(id % 97))")
            .queryExecution.toRdd.count()),
        // one wide hash aggregation — partial+final, one exchange,
        // 77M input rows -> 200k groups
        "shuffle: 77M-row hash aggregate" -> (() => {
          val big = (0 until 4).map(_ => li).reduce(_ unionByName _)
          big.groupBy(col("l_partkey"))
            .agg(sum(col("l_quantity")), avg(col("l_extendedprice")))
            .queryExecution.toRdd.count()
        }),
        // rolling-hash chunking + digest group — codegen kernel + agg
        "cdc chunk + digest group" -> (() =>
          graft.queries.CurationQueries.cdcChunkRows(docs)
            .groupBy(col("chunk_md5")).count().queryExecution.toRdd.count()),
        // full similarity pipeline incl. its checkpoint barriers —
        // the HONEST number: barrier + driver fixed costs cap the
        // visible speedup at probe scale (they amortize at real scale,
        // being per-job rather than per-row)
        "minhash LSH near-dups" -> (() =>
          graft.ops.DedupOps.minhashNearDuplicates(docs, "doc_id", "text", 0.8).count()))
    }

    val results = scala.collection.mutable.LinkedHashMap[String, Vector[(Int, Double)]]()
      .withDefaultValue(Vector.empty)
    for (cpus <- Seq(2, 8, 32)) {
      val spark = graft.GraftSession.local(cpus.toString, "ERROR")
      spark.range(1000000).selectExpr("sum(id)").collect() // JIT warm
      val ks = kernels(spark)
      // one warm pass so parquet footers/codegen don't skew the compare
      ks.foreach { case (_, f) => f(); graft.ops.Reuse.releaseAllCaches(spark) }
      ks.foreach { case (name, f) =>
        val t0 = System.nanoTime(); f()
        val dt1 = (System.nanoTime() - t0) / 1e9
        graft.ops.Reuse.releaseAllCaches(spark)
        val t1 = System.nanoTime(); f()
        val dt2 = (System.nanoTime() - t1) / 1e9
        graft.ops.Reuse.releaseAllCaches(spark)
        results(name) = results(name) :+ (cpus, math.min(dt1, dt2))
        println(f"[local[$cpus%2d]] $name%-30s ${math.min(dt1, dt2)}%7.2f s")
      }
      spark.stop()
    }
    println(f"${"kernel"}%-30s ${"2t"}%7s ${"8t"}%7s ${"32t"}%7s  speedup 2t->32t")
    results.foreach { case (name, v) =>
      val byT = v.toMap
      println(f"$name%-30s ${byT(2)}%7.2f ${byT(8)}%7.2f ${byT(32)}%7.2f  ${byT(2) / byT(32)}%5.1f x")
    }
  }
}
