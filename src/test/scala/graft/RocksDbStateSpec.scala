package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQueryListener}
import org.scalatest.funsuite.AnyFunSuite

/** The streaming state store must be the scale-safe RocksDB provider:
  * the default HDFS-backed provider holds all state in executor heap,
  * which caps drained volume; RocksDB keeps it off-heap with disk
  * spill. Asserts the provider is ACTIVE (RocksDB custom metrics in the
  * query progress), not merely configured.
  */
class RocksDbStateSpec extends AnyFunSuite {
  import TestSpark._

  test("stateful drain runs on the RocksDB state store provider") {
    @volatile var stateMetricKeys = Set.empty[String]
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        import scala.jdk.CollectionConverters._
        e.progress.stateOperators.foreach { op =>
          stateMetricKeys = stateMetricKeys ++ op.customMetrics.keySet.asScala
        }
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    try {
      val drained = StreamingOps.drainToBatch(
        StreamingOps.hourlyCounts(StreamingOps.eventsStream(spark, sf)),
        OutputMode.Complete())
      assert(drained.count() > 0)
      assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        === StreamingOps.RocksDbProvider)
      // listener events are async — give the progress a moment to land
      val deadline = System.currentTimeMillis() + 10000
      while (!stateMetricKeys.exists(_.toLowerCase.contains("rocksdb")) &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(stateMetricKeys.exists(_.toLowerCase.contains("rocksdb")),
        s"no rocksdb state metrics in progress; saw: $stateMetricKeys")
    } finally spark.streams.removeListener(listener)
  }

  test("an explicit caller-chosen provider is respected, HDFS default is upgraded") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(key, "")
    try {
      spark.conf.set(key, "com.example.CustomProvider")
      StreamingOps.ensureScaleSafeStateStore(spark)
      assert(spark.conf.get(key) === "com.example.CustomProvider")
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
      StreamingOps.ensureScaleSafeStateStore(spark)
      assert(spark.conf.get(key) === StreamingOps.RocksDbProvider)
    } finally {
      if (prev.nonEmpty) spark.conf.set(key, prev) else spark.conf.unset(key)
    }
  }
}
