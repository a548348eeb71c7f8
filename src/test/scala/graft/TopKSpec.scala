package graft

import graft.functions.TopKRows
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the bounded-heap top-k aggregate: equivalence with the
  * sort/limit and window-rank formulations (the shapes it replaces),
  * heap-boundary tie handling, fewer-rows-than-k, null sort structs,
  * and the serialize/merge path (exercised by any multi-partition run).
  */
class TopKSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("global top-k equals orderBy+limit on (n DESC, word ASC)") {
    val counts = Tables.documents(spark, sf)
      .select(explode(graft.ops.TextOps.words(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
    val viaSort = counts.orderBy(col("n").desc, col("word")).limit(20)
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    val viaHeap = counts
      .agg(TopKRows.topK(struct((-col("n")).as("nn"), col("word").as("word")), 20)
        .as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.word"), (-col("t.nn")).as("n"))
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    assert(viaHeap === viaSort)
  }

  test("grouped top-k equals the window-rank formulation") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("cents").desc, col("day"))
    val viaWindow = daily.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .orderBy(col("event_type"), col("cents").desc, col("day"))
      .collect().toSeq
    val viaHeap = daily.groupBy(col("event_type"))
      .agg(TopKRows.topK(struct((-col("cents")).as("nc"), col("day").as("day")), 3)
        .as("top"))
      .select(col("event_type"), explode(col("top")).as("t"))
      .select(col("event_type"), col("t.day").as("day"), (-col("t.nc")).as("cents"))
      .orderBy(col("event_type"), col("cents").desc, col("day"))
      .collect().toSeq
    assert(viaHeap === viaWindow)
  }

  test("ties at the heap boundary resolve by the full struct order") {
    // 5 rows with equal score, distinct tiebreak; k=3 keeps the 3
    // smallest (score, tag) — deterministic regardless of partitioning
    val df = Seq((1L, "e"), (1L, "c"), (1L, "a"), (1L, "d"), (1L, "b"))
      .toDF("s", "tag").repartition(4)
    val got = df.agg(TopKRows.topK(struct(col("s"), col("tag")), 3).as("t"))
      .select(explode(col("t")).as("x")).select(col("x.tag"))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("a", "b", "c"))
  }

  test("fewer rows than k returns all, sorted") {
    val df = Seq((3L, "x"), (1L, "y")).toDF("s", "tag")
    val got = df.agg(TopKRows.topK(struct(col("s"), col("tag")), 10).as("t"))
      .select(explode(col("t")).as("x"))
      .select(col("x.s"), col("x.tag"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((1L, "y"), (3L, "x")))
  }

  test("null sort structs are skipped, null FIELDS order first") {
    val df = Seq[(java.lang.Long, String)]((2L, "b"), (null, "n"), (1L, "a"))
      .toDF("s", "tag")
    // whole-struct null: when(s is null) -> null struct is not offered
    val skipped = df
      .agg(TopKRows.topK(
        when(col("s").isNotNull, struct(col("s"), col("tag"))), 5).as("t"))
      .select(size(col("t"))).collect().head.getInt(0)
    assert(skipped === 2)
    // null field: Spark SQL sort order puts nulls first ascending
    val withNullField = df
      .agg(TopKRows.topK(struct(col("s"), col("tag")), 5).as("t"))
      .select(explode(col("t")).as("x")).select(col("x.tag"))
      .collect().map(_.getString(0)).toSeq
    assert(withNullField === Seq("n", "a", "b"))
  }

  test("k must be positive") {
    intercept[IllegalArgumentException] {
      Seq(1).toDF("a").agg(TopKRows.topK(struct(col("a")), 0)).collect()
    }
    ()
  }

  test("serialize/deserialize round-trips the heap; merge keeps k smallest") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{CreateStruct, Literal}
    import org.apache.spark.unsafe.types.UTF8String
    val agg = TopKRows(
      CreateStruct(Seq(
        Literal(1L), Literal(UTF8String.fromString("x"), org.apache.spark.sql.types.StringType))),
      k = 2)
    val buf = agg.createAggregationBuffer()
    agg.update(buf, InternalRow.empty) // literal child: adds (1, "x")
    val round = agg.deserialize(agg.serialize(buf))
    assert(round.size === 1)
    assert(round.head.getLong(0) === 1L)
    // merge folds the other heap in and keeps the k smallest overall
    val other = agg.createAggregationBuffer()
    Seq(0L, 7L).foreach { v =>
      other.enqueue(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](v, UTF8String.fromString("q"))))
    }
    val merged = agg.merge(round, other)
    assert(merged.size === 2)
    assert(merged.toArray.map(_.getLong(0)).sorted.toSeq === Seq(0L, 1L))
    ()
  }

  test("streaming heap state merges across micro-batches (MemoryStream, 2 batches)") {
    // the q_stream_topk certificate's missing piece when the file
    // source yields a single batch: two explicit batches through the
    // state store must equal the one-pass batch heap
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = (1 to 50).map(i => (s"g${i % 3}", (i * 37) % 101, i.toLong))
    val ms = MemoryStream[(String, Int, Long)]
    val q = ms.toDF().toDF("grp", "v", "id")
      .groupBy(col("grp"))
      .agg(TopKRows.topK(struct((-col("v")).as("nv"), col("id").as("id")), 4)
        .as("top"))
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("topk_2batch").start()
    try {
      ms.addData(rows.take(25))
      q.processAllAvailable()
      ms.addData(rows.drop(25))
      q.processAllAvailable()
      val got = spark.table("topk_2batch")
        .select(col("grp"), explode(col("top")).as("t"))
        .select(col("grp"), (-col("t.nv")).as("v"), col("t.id"))
        .collect().toSeq.map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      val exp = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
        rs.map { case (_, v, id) => (g, v, id) }
          .sortBy { case (_, v, id) => (-v, id) }.take(4)
      }.sortBy { case (g, v, id) => (g, -v, id) }
      assert(got.sortBy { case (g, v, id) => (g, -v, id) } === exp)
    } finally q.stop()
  }
}
