package graft

import graft.ops.UrlOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Canonical-host extraction over every messy-URL variant class. */
class UrlOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("canonicalHost collapses scheme/case/www/port/userinfo/query variants") {
    import spark.implicits._
    val cases = Seq(
      "https://src1.example.com/p/1" -> "src1.example.com",
      "HTTP://SRC1.EXAMPLE.COM/p/2" -> "src1.example.com",
      "https://www.src1.example.com/p/3?utm_source=x#f" -> "src1.example.com",
      "http://crawler@src1.example.com:443/p/4" -> "src1.example.com",
      "https://src1.example.com:8080/" -> "src1.example.com",
      "https://src1.example.com" -> "src1.example.com",
      "not a url" -> "")
    val got = cases.map(_._1).toDF("url")
      .select(UrlOps.canonicalHost(col("url")))
      .collect().map(_.getString(0)).toSeq
    assert(got === cases.map(_._2))
  }

  test("urlFixture variants all canonicalize back to the source host") {
    import spark.implicits._
    val rows = (0L until 60L).map(id => (id, s"src${id % 5}")).toDF("doc_id", "source")
    val hosts = rows
      .select(col("source"),
        UrlOps.canonicalHost(
          UrlOps.urlFixture(col("doc_id"), col("source"))).as("host"))
      .collect()
    hosts.foreach { r =>
      assert(r.getString(1) === s"${r.getString(0)}.example.com")
    }
  }
}
