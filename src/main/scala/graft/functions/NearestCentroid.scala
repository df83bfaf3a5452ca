package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: index of the nearest centroid (squared
  * L2) for an `array<float>` vector against an `array<array<double>>`
  * centroid set — the per-row hot loop of IVF index assignment
  * ([[graft.analytics.IvfIndex]]).
  *
  * The HOF formulation (`array_position(dists, array_min(dists))` over
  * per-centroid `zip_with`+`aggregate` folds) evaluates nLists × dim
  * interpreted lambda calls per row; at 100 TB the assignment pass maps
  * the ENTIRE corpus, so this is exactly the "built-ins genuinely fall
  * short" case of SURVEY.md §7.4. This expression generates one tight
  * nested loop (same left-to-right double accumulation → identical
  * argmin, ties to the lower index; equality vs the HOF reference pinned
  * in `DedupSpec`).
  *
  * NULL if the vector is NULL or any element/centroid entry is NULL;
  * centroids shorter/longer than the vector compare over the shared
  * prefix exactly like `zip_with` (which truncates to the shorter side
  * producing nulls — here we require equal dims and return NULL
  * otherwise, the stricter contract).
  */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<array<double>>), got ($l, $r)")
    }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid"

  override def nullSafeEval(v: Any, cs: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val cents = cs.asInstanceOf[ArrayData]
    val dim = vec.numElements()
    val k = cents.numElements()
    if (k == 0) return null
    var best = -1
    var bestD = Double.MaxValue
    var c = 0
    while (c < k) {
      if (cents.isNullAt(c)) return null
      val cent = cents.getArray(c)
      if (cent.numElements() != dim) return null
      var d = 0.0
      var i = 0
      while (i < dim) {
        if (vec.isNullAt(i) || cent.isNullAt(i)) return null
        val diff = vec.getFloat(i).toDouble - cent.getDouble(i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    // all-NaN distances never beat bestD → best stays -1; surface NULL
    // instead of a valid-looking (and unprobeable) list id. (The HOF
    // argmin reference yields -1 here via array_position's 0 — the
    // equality pin in DedupSpec runs on NaN-free data.)
    if (best < 0) null else best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cs) => {
      val dim = ctx.freshName("dim")
      val k = ctx.freshName("k")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val cent = ctx.freshName("cent")
      s"""
         |final int $dim = $v.numElements();
         |final int $k = $cs.numElements();
         |int $best = -1;
         |double $bestD = Double.MAX_VALUE;
         |if ($k == 0) { ${ev.isNull} = true; }
         |for (int $c = 0; $c < $k && !${ev.isNull}; $c++) {
         |  if ($cs.isNullAt($c)) { ${ev.isNull} = true; break; }
         |  org.apache.spark.sql.catalyst.util.ArrayData $cent = $cs.getArray($c);
         |  if ($cent.numElements() != $dim) { ${ev.isNull} = true; break; }
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($v.isNullAt($i) || $cent.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $diff = (double) $v.getFloat($i) - $cent.getDouble($i);
         |    $d += $diff * $diff;
         |  }
         |  if (!${ev.isNull} && $d < $bestD) { $bestD = $d; $best = $c; }
         |}
         |if ($best < 0) { ${ev.isNull} = true; } // all-NaN distances
         |if (!${ev.isNull}) { ${ev.value} = $best; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NearestCentroid {
  val fnName = "nearest_centroid"

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[NearestCentroid].getCanonicalName, fnName)

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName, exprs => NearestCentroid(exprs(0), exprs(1)), "built-in")
}
