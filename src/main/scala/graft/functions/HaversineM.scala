package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for haversine great-circle meters —
  * `haversine_m(lat, lon, origin_lat, origin_lon)`.
  *
  * Semantically identical to the composed Column form (`Geo.haversineMeters`
  * — same IEEE op sequence, so the DuckDB oracle mirror applies unchanged);
  * the native form exists so RAW SQL can write the predicate the engine's
  * own query compiler builds internally:
  *
  *   `WHERE haversine_m(lat, lon, 10.0, 20.0) <= 2000000.0`
  *
  * and the [[graft.plans.GeoBoxRule]] optimizer rule can RECOGNIZE it (one
  * expression-class match rather than a fragile deep trig-tree pattern) and
  * conjoin the conservative bounding box automatically — giving SQL users
  * the same parquet pushdown the DSL path builds by hand (SearchQuery's
  * geo_distance compile). Evaluation is a tight codegen'd sequence of
  * `java.lang.Math` calls — exactly what Spark's own trig expressions emit,
  * so results are bit-identical to the composed form. */
case class HaversineM(first: Expression, second: Expression,
                      third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  // the FUNCTION BUILDER (GraftExtensions) casts every child to double, so
  // plain SQL literals (DECIMAL(3,1) from `10.0`) and float/int coordinate
  // columns work without the `10.0D` spelling (ExpectsInputTypes would be
  // the idiomatic fix, but AbstractDataType is private[sql]); this check
  // is the backstop for direct construction
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"haversine_m expects four doubles, got ${children.map(_.dataType).mkString(", ")}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "haversine_m"

  override def nullSafeEval(lat: Any, lon: Any, olat: Any, olon: Any): Any =
    HaversineM.compute(lat.asInstanceOf[Double], lon.asInstanceOf[Double],
      olat.asInstanceOf[Double], olon.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lat, lon, olat, olon) => {
      val dphi = ctx.freshName("dphi")
      val dlmb = ctx.freshName("dlmb")
      val a = ctx.freshName("a")
      // the EXACT op sequence of Geo.haversineMeters / Geo.haversineSql
      s"""
         |double $dphi = java.lang.Math.toRadians($lat - $olat) / 2.0;
         |double $dlmb = java.lang.Math.toRadians($lon - $olon) / 2.0;
         |double $a = java.lang.Math.sin($dphi) * java.lang.Math.sin($dphi)
         |  + java.lang.Math.cos(java.lang.Math.toRadians($olat))
         |    * java.lang.Math.cos(java.lang.Math.toRadians($lat))
         |    * java.lang.Math.sin($dlmb) * java.lang.Math.sin($dlmb);
         |${ev.value} = 12742000.0 * java.lang.Math.asin(java.lang.Math.sqrt($a));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

object HaversineM {
  /** Interpreted twin of the codegen — one shared op sequence. */
  def compute(lat: Double, lon: Double, olat: Double, olon: Double): Double = {
    val dphi = math.toRadians(lat - olat) / 2.0
    val dlmb = math.toRadians(lon - olon) / 2.0
    val a = math.sin(dphi) * math.sin(dphi) +
      math.cos(math.toRadians(olat)) * math.cos(math.toRadians(lat)) *
        math.sin(dlmb) * math.sin(dlmb)
    12742000.0 * math.asin(math.sqrt(a))
  }
}
