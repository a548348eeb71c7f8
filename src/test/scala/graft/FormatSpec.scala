package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Interchange-format semantics the certified round-trip queries lean
  * on (queries/FormatQueries.scala): XML markup escaping, explicit
  * timestamp text formats, and ORC TIMESTAMP fidelity. StorageSpec
  * already covers ORC pushdown/pruning on the documents table; this
  * spec covers what the oracle hash alone can't localize — WHICH cell
  * would rot first.
  */
class FormatSpec extends AnyFunSuite {
  import TestSpark._

  test("XML writer escapes markup-significant characters losslessly") {
    // '&', '<', '>', quotes: the cells a naive serializer corrupts
    // first; testdata text is clean ASCII, so force the issue here
    val dir = java.nio.file.Files
      .createTempDirectory("graft_xml_").toString + "/esc"
    val rows = Seq(
      (1L, """a & b <tag> "quoted" 'single'"""),
      (2L, "plain"),
      (3L, "5 < 6 && 7 > 2"))
    import spark.implicits._
    rows.toDF("id", "txt").write.mode("overwrite")
      .format("xml").option("rowTag", "row").save(dir)
    val back = spark.read.format("xml").option("rowTag", "row")
      .schema(StructType(Seq(
        StructField("id", LongType), StructField("txt", StringType))))
      .load(dir)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(back.toSeq === rows)
  }

  test("ORC round-trips microsecond TIMESTAMP exactly") {
    // documents has no timestamp column (covered by StorageSpec);
    // events exercises the TIMESTAMP encoder both formats must not rot
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("value"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_orc_ts_").toString + "/ev"
    ev.write.mode("overwrite").orc(dir)
    val fp = (df: org.apache.spark.sql.DataFrame) => df
      .agg(count(lit(1)),
        sum(unix_micros(col("ts"))),
        min(col("ts")), max(col("ts")),
        sum(round(col("value") * 100).cast("long")))
      .collect().head.toSeq
    assert(fp(spark.read.orc(dir)) === fp(ev))
  }

  test("format round-trip queries return grouped rows at sf0.001") {
    val orc = graft.queries.FormatQueries.q_orc_roundtrip.fn(spark, sf)
    assert(orc.count() === 3) // A, N, R return flags
    val xml = graft.queries.FormatQueries.q_xml_roundtrip.fn(spark, sf)
    assert(xml.count() === 5) // event types
    // n_events over the XML round trip must equal the parquet row count
    val n = xml.agg(sum(col("n_events"))).collect().head.getLong(0)
    assert(n === Tables.events(spark, sf).count())
  }
}
