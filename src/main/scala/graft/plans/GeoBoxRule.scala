package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.HaversineM

/** Optimizer rule: derive the conservative bounding box from a
  * `haversine_m(lat, lon, LIT, LIT) <= LIT` filter and conjoin it.
  *
  * The DSL path (SearchQuery's geo_distance compile) builds this box by
  * hand at parse time; this rule gives the SAME parquet row-group pruning
  * to anyone writing the distance predicate directly — `spark.sql` users,
  * notebooks, downstream DataFrame code — because plain numeric bounds on
  * the lat/lon COLUMNS reach PushedFilters while the trig expression never
  * can. The box is a strict superset of the circle (5% margin over the
  * min meters-per-degree — the identical constants as the DSL path), so
  * the rewrite can only prune, never change the hit set:
  *
  *   - latitude: ±meters/110574·1.05 around the origin, always added;
  *   - longitude: ±meters/(111320·cos(maxAbsLat))·1.05, SKIPPED near the
  *     poles (cos < 0.02 — every longitude qualifies) and on antimeridian
  *     wrap (a wrapped box would wrongly prune).
  *
  * Idempotent by construction: derived conjuncts are checked against the
  * existing conjunct set with `semanticEquals` before adding, so the
  * fixed-point optimizer converges on the second pass. Distances under
  * `<` or `<=` both qualify (the box is closed either way). */
object GeoBoxRule extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val derived = conjuncts.flatMap(boxOf)
        .filterNot(b => conjuncts.exists(_.semanticEquals(b)))
      if (derived.isEmpty) f
      else Filter((derived ++ conjuncts).reduceLeft(And), child)
  }

  private def boxOf(p: Expression): Seq[Expression] = p match {
    case LessThanOrEqual(HaversineM(lat, lon,
        Literal(olat: Double, DoubleType), Literal(olon: Double, DoubleType)),
        Literal(m: Double, DoubleType)) => bounds(lat, lon, olat, olon, m)
    case LessThan(HaversineM(lat, lon,
        Literal(olat: Double, DoubleType), Literal(olon: Double, DoubleType)),
        Literal(m: Double, DoubleType)) => bounds(lat, lon, olat, olon, m)
    case GreaterThanOrEqual(Literal(m: Double, DoubleType), HaversineM(lat, lon,
        Literal(olat: Double, DoubleType), Literal(olon: Double, DoubleType))) =>
      bounds(lat, lon, olat, olon, m)
    case GreaterThan(Literal(m: Double, DoubleType), HaversineM(lat, lon,
        Literal(olat: Double, DoubleType), Literal(olon: Double, DoubleType))) =>
      bounds(lat, lon, olat, olon, m)
    case _ => Nil
  }

  /** The SearchQuery geo_distance constants, verbatim. */
  private def bounds(lat: Expression, lon: Expression,
                     olat: Double, olon: Double, meters: Double): Seq[Expression] = {
    if (!(meters > 0) || olat < -90 || olat > 90 || olon < -180 || olon > 180) return Nil
    val latDelta = meters / 110574.0 * 1.05
    val latLo = olat - latDelta
    val latHi = olat + latDelta
    val latBounds = Seq(
      GreaterThanOrEqual(lat, Literal(latLo, DoubleType)),
      LessThanOrEqual(lat, Literal(latHi, DoubleType)))
    val maxAbsLat = math.min(89.0, math.max(math.abs(latLo), math.abs(latHi)))
    val cosMin = math.cos(math.toRadians(maxAbsLat))
    val lonBounds =
      if (cosMin < 0.02) Nil // polar cap: every longitude qualifies
      else {
        val lonDelta = meters / (111320.0 * cosMin) * 1.05
        if (olon - lonDelta < -180.0 || olon + lonDelta > 180.0) Nil // wrap
        else Seq(
          GreaterThanOrEqual(lon, Literal(olon - lonDelta, DoubleType)),
          LessThanOrEqual(lon, Literal(olon + lonDelta, DoubleType)))
      }
    latBounds ++ lonBounds
  }
}
