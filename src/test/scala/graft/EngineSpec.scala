package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[4]", "4")
      .appName("graft-test").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

/** Contract-level smoke: every declared query runs and returns rows at
  * sf0.001, entry() is non-empty, names are unique, and each oracle key
  * has a query. Per-operator semantic specs live in the sibling *Spec
  * files.
  */
class EngineSpec extends AnyFunSuite {
  import TestSpark._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("query/oracle maps are consistent") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
  }

  test("dashboard certification map points at registered queries") {
    val registered = SparkEntry.queries.keySet
    graft.queries.DashboardQueries.byReferenceName.foreach { case (ref, q) =>
      assert(registered.contains(q.name), s"$ref -> ${q.name} unregistered")
    }
  }

  private val seenSchemas =
    scala.collection.mutable.Map.empty[String, org.apache.spark.sql.types.StructType]

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      seenSchemas(name) = df.schema
      // count() drives the whole plan; most queries should be non-empty
      // at sf0.001 but emptiness alone is not a failure for filters
      // that legitimately select nothing at tiny SF.
      df.count()
    }
  }

  /** Cross-engine type-normalization lint (round-7 verdict: the one
    * red row was an INT32 engine column vs a DuckDB HUGEINT — the only
    * aggregate-derived output in 209 oracles not CAST to BIGINT).
    * Every certified query's output columns must stay inside the house
    * type set that hashes identically across Spark / DuckDB / pandas:
    * no INT32/FLOAT32 scalars, no un-cast aggregate outputs.
    */
  test("q_isotonic: fit is monotone, pools violators, preserves mass") {
    val rows = SparkEntry.queries("q_isotonic")(spark, sf)
      .orderBy("bin").collect()
    val iso = rows.map(_.getAs[Long]("iso_ppm"))
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b },
      s"isotonic output must be nondecreasing: ${iso.mkString(",")}")
    val raw = rows.map(_.getAs[Long]("raw_ppm"))
    assert(raw.zip(raw.tail).exists { case (a, b) => a > b },
      "fixture has no monotonicity violation — the PAV pooling path is " +
        "vacuously untested at this SF")
    // pooled blocks must carry the block's own pooled mean: within an
    // ADJACENT run of equal iso values, iso == floor(Σpos·1e6 / Σn)
    val runs = rows.foldLeft(List.empty[List[org.apache.spark.sql.Row]]) {
      case (acc @ (cur :: rest), r)
          if cur.head.getAs[Long]("iso_ppm") == r.getAs[Long]("iso_ppm") =>
        (r :: cur) :: rest
      case (acc, r) => List(r) :: acc
    }
    runs.foreach { blk =>
      val fit = blk.head.getAs[Long]("iso_ppm")
      val n = blk.map(_.getAs[Long]("n_users")).sum
      val p = blk.map(_.getAs[Long]("n_pos")).sum
      assert(fit == p * 1000000L / n,
        s"pooled block mean mismatch: fit=$fit vs ${p * 1000000L / n}")
    }
  }

  test("q_survival: KM curve is nonincreasing and risk sets account") {
    val rows = SparkEntry.queries("q_survival")(spark, sf)
      .orderBy("duration_days").collect()
    assert(rows.nonEmpty)
    val surv = rows.map(_.getAs[Long]("surv_ppm"))
    assert(surv.zip(surv.tail).forall { case (a, b) => a >= b },
      s"survival must be nonincreasing: ${surv.mkString(",")}")
    assert(surv.head <= 1000000L)
    // risk-set bookkeeping: n_risk drops by exactly the failures +
    // censorings of each earlier step
    val triples = rows.map(r => (r.getAs[Long]("n_risk"),
      r.getAs[Long]("n_churn"), r.getAs[Long]("n_censored")))
    triples.zip(triples.tail).foreach { case ((n0, d0, c0), (n1, _, _)) =>
      assert(n1 == n0 - d0 - c0,
        s"risk set must shrink by exits: $n0 - $d0 - $c0 != $n1")
    }
    assert(triples.exists(_._2 > 0),
      "fixture has no failure events — the product-limit step is vacuous")
  }

  test("oracle typing lint: certified outputs use the house type set") {
    import org.apache.spark.sql.types._
    def houseScalar(dt: DataType): Boolean = dt match {
      case LongType | DoubleType | StringType | BooleanType |
           DateType | TimestampType | TimestampNTZType | BinaryType => true
      case _: DecimalType => true
      case _ => false
    }
    def house(dt: DataType): Boolean = dt match {
      case ArrayType(e, _) => house(e)
      case MapType(k, v, _) => house(k) && house(v)
      case StructType(fs) => fs.forall(f => house(f.dataType))
      case other => houseScalar(other)
    }
    val certified = SparkEntry.oracleSql.keySet
    val missing = certified -- seenSchemas.keySet
    assert(missing.isEmpty,
      s"lint did not observe schemas for: ${missing.toSeq.sorted.mkString(",")}")
    val violations = for {
      name <- certified.toSeq.sorted
      f <- seenSchemas(name).fields if !house(f.dataType)
    } yield s"$name.${f.name}: ${f.dataType.simpleString}"
    assert(violations.isEmpty,
      "non-house output types (cross-engine hash hazard):\n  " +
        violations.mkString("\n  "))
  }
}
