package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd IVF cell assignment: the `nProbe` centroid ids nearest
  * (by cosine) to an `array<double>` vector, nearest first, ties by
  * centroid id.
  *
  * This is the MAP-SIDE formulation of Voronoi assignment: the
  * centroid table rides inside the expression (it is `nCentroids ×
  * dim` doubles — broadcast-sized by construction), so assigning a
  * 100 TB corpus to cells is a shuffle-free projection. The
  * corpus×centroids crossJoin + per-row window top-k it replaces
  * shuffles the whole corpus twice for the same answer.
  *
  * Ranking matches the algebraic version exactly: full cosine
  * (dot/(|v|·|c|)) with left-to-right folds, `ORDER BY cos DESC,
  * cent_id` tie-break — so SQL oracles reproduce the assignment with
  * `list_dot_product` + ROW_NUMBER. Zero INPUT vectors (all cosines
  * NaN) return an empty assignment — explicitly unassigned, where a
  * window formulation would rank NaN first; zero CENTROIDS remain
  * excluded by the corpus contract (assert upstream if the corpus can
  * contain them).
  */
case class NearestCentroids(
    child: Expression, centIds: Array[Long], cents: Array[Array[Double]],
    nProbe: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val centNorms: Array[Double] = cents.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    math.sqrt(s)
  }

  override def nullSafeEval(input: Any): Any =
    select(input.asInstanceOf[ArrayData])

  /** Public for the generated-code callback. */
  def select(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var vn = 0.0
    var i = 0
    while (i < n) { val x = a.getDouble(i); vn += x * x; i += 1 }
    vn = math.sqrt(vn)
    // zero vector: every cosine is NaN — genuinely unassigned (a NaN
    // would otherwise fall through the comparisons and silently take
    // the first centroids)
    if (vn == 0.0) return new GenericArrayData(Array.empty[Long])
    val k = math.min(nProbe, cents.length)
    val topIds = new Array[Long](k)
    val topCos = new Array[Double](k)
    var filled = 0
    var c = 0
    while (c < cents.length) {
      // a zero-norm centroid (e.g. an emptied k-means cell averaged to
      // zero) has no cosine: cos = NaN would pass `pos == filled < k`
      // during buffer fill and then beat every real centroid (all NaN
      // comparisons are false) — skip it instead of trusting upstream
      if (centNorms(c) == 0.0) { c += 1 }
      else {
      val cv = cents(c)
      val m = math.min(n, cv.length)
      var dot = 0.0
      var d = 0
      while (d < m) { dot += a.getDouble(d) * cv(d); d += 1 }
      val cos = dot / (vn * centNorms(c))
      val id = centIds(c)
      // insertion into the small top-k, ordered by (cos desc, id asc)
      var pos = filled
      while (pos > 0 && (cos > topCos(pos - 1) ||
          (cos == topCos(pos - 1) && id < topIds(pos - 1)))) pos -= 1
      if (pos < k) {
        val last = math.min(filled, k - 1)
        var j = last
        while (j > pos) { topIds(j) = topIds(j - 1); topCos(j) = topCos(j - 1); j -= 1 }
        topIds(pos) = id
        topCos(pos) = cos
        if (filled < k) filled += 1
      }
      c += 1
      }
    }
    new GenericArrayData(java.util.Arrays.copyOf(topIds, filled))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroids", this,
      classOf[NearestCentroids].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.select($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
