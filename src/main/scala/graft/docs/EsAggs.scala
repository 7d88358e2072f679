package graft.docs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** ES `aggs` bodies — the other half of a Kibana request (every dashboard
  * panel is a terms/histogram bucket agg with metric sub-aggs), compiled
  * to a single `groupBy().agg()`.
  *
  * Scope (v1, loudly rejected beyond it): at top level either ONE bucket
  * agg — `terms` (count-desc top-N buckets) or `histogram` (fixed
  * `interval` bins) — carrying any number of metric sub-aggs, or a flat
  * set of metric aggs (global aggregation). Metrics: `avg`, `sum`, `min`,
  * `max`, `value_count`. Field paths may not cross an array (ES requires
  * a `nested` agg context there — not implemented).
  *
  * Output is the relational rendering of ES's bucket list: one row per
  * bucket — `key`, `doc_count`, then one column per metric agg named by
  * its agg name. `avg`/`sum` are doubles (ES returns doubles for both);
  * `min`/`max` keep the field type; `value_count` is a long.
  *
  * Scale shape: one hash aggregation — partial (map-side) combine, one
  * shuffle on the bucket key, and for `terms` a TakeOrderedAndProject of
  * the top `size` buckets. NOTE a semantic upgrade over ES: ES terms aggs
  * are APPROXIMATE (per-shard top `shard_size` then merge — documented
  * doc_count error); this engine's top-N is exact, because the groupBy
  * sees all rows for a key after the shuffle.
  */
object EsAggs {

  sealed trait Agg
  /** `avg` | `sum` | `min` | `max` | `value_count` over a field path. */
  final case class Metric(kind: String, path: Seq[String]) extends Agg
  /** ES `terms` bucket agg: top-`size` keys by doc_count desc, key asc. */
  final case class Terms(path: Seq[String], size: Int) extends Agg
  /** ES `histogram` bucket agg: `floor(v / interval) * interval` bins. */
  final case class Histogram(path: Seq[String], interval: Long) extends Agg

  final case class Request(query: SearchQuery,
                           bucket: Option[Agg],
                           metrics: Seq[(String, Metric)])

  private val metricKinds = Set("avg", "sum", "min", "max", "value_count")

  def parse(body: String, schema: StructType): Request = {
    import org.json4s._
    val root = org.json4s.jackson.JsonMethods.parse(body) match {
      case JObject(fields) => fields.toMap
      case other => throw new IllegalArgumentException(s"ES body must be an object: $other")
    }
    // `size` is allowed (and ignored): aggs bodies set `"size": 0` to
    // suppress hits; this entry point returns only the aggregation rows.
    val unknown = root.keySet -- Set("query", "aggs", "aggregations", "size")
    require(unknown.isEmpty, s"unsupported ES aggs body key(s): ${unknown.mkString(", ")}")
    val query = root.get("query")
      .map(_ => SearchQuery.parseBody(body, schema).query)
      .getOrElse(SearchQuery.MatchAll)
    val aggsJ = root.get("aggs").orElse(root.get("aggregations"))
      .getOrElse(throw new IllegalArgumentException("aggs body needs an \"aggs\" key"))
    val named = aggsJ match {
      case JObject(fields) => fields
      case other => throw new IllegalArgumentException(s"aggs must be an object: $other")
    }
    require(named.nonEmpty, "aggs object is empty")

    def fieldPath(spec: JValue, kind: String): Seq[String] = {
      val p = spec match {
        case JObject(f) => f.toMap.get("field") match {
          case Some(JString(s)) => s
          case _ => throw new IllegalArgumentException(s"$kind agg needs a \"field\"")
        }
        case other => throw new IllegalArgumentException(s"bad $kind agg spec: $other")
      }
      val path = p.stripSuffix(".keyword").split('.').toSeq
      val (arr, _) = SearchQuery.splitArrayPath(path, schema)
      require(arr.isEmpty,
        s"agg field $p crosses array $arr — ES needs a nested agg there (not implemented)")
      path
    }
    def num(spec: JValue, key: String, kind: String): Option[Long] = spec match {
      case JObject(f) => f.toMap.get(key).map {
        case JInt(i) => i.toLong
        case JLong(l) => l
        case JDouble(d) => d.toLong
        case JDecimal(d) => d.toLong
        case other => throw new IllegalArgumentException(s"bad $kind.$key: $other")
      }
      case _ => None
    }
    def parseMetrics(entries: List[(String, JValue)]): Seq[(String, Metric)] =
      entries.map {
        case (name, JObject(List((kind, spec)))) if metricKinds(kind) =>
          name -> Metric(kind, fieldPath(spec, kind))
        case (name, other) =>
          throw new IllegalArgumentException(
            s"unsupported metric agg $name: $other (supported: ${metricKinds.mkString("/")})")
      }

    named match {
      // one bucket agg, with optional metric sub-aggs
      case List((_, JObject(bucketFields))) if bucketFields.exists {
        case (k, _) => k == "terms" || k == "histogram"
      } =>
        val bf = bucketFields.toMap
        val extraneous = bf.keySet -- Set("terms", "histogram", "aggs", "aggregations")
        require(extraneous.isEmpty,
          s"unsupported bucket agg key(s): ${extraneous.mkString(", ")}")
        val bucket = bf.get("terms").map { spec =>
          Terms(fieldPath(spec, "terms"),
            num(spec, "size", "terms").map(_.toInt).getOrElse(10)) // ES default
        }.orElse(bf.get("histogram").map { spec =>
          val interval = num(spec, "interval", "histogram")
            .getOrElse(throw new IllegalArgumentException("histogram needs interval"))
          require(interval > 0, s"histogram interval must be > 0: $interval")
          Histogram(fieldPath(spec, "histogram"), interval)
        }).get
        val subs = bf.get("aggs").orElse(bf.get("aggregations")) match {
          case Some(JObject(fields)) => parseMetrics(fields)
          case Some(other) => throw new IllegalArgumentException(s"bad sub-aggs: $other")
          case None => Nil
        }
        Request(query, Some(bucket), subs)
      // flat metric aggs (global aggregation)
      case metricsOnly => Request(query, None, parseMetrics(metricsOnly))
    }
  }

  /** Run an ES aggs body against the document table. */
  def run(docs: DataFrame, docCol: String, body: String, schema: StructType): DataFrame = {
    val req = parse(body, schema)
    val doc = col(docCol)
    def f(p: Seq[String]): Column = p.foldLeft(doc)((c, n) => c.getField(n))
    val filtered = docs.filter(SearchQuery.compile(req.query, doc))
    def metricCol(name: String, m: Metric): Column = (m.kind match {
      case "avg" => avg(f(m.path)).cast("double")
      case "sum" => sum(f(m.path)).cast("double") // ES sum is a double
      case "min" => min(f(m.path))
      case "max" => max(f(m.path))
      case "value_count" => count(f(m.path))
    }).as(name)
    val metricCols = req.metrics.map { case (n, m) => metricCol(n, m) }
    req.bucket match {
      case Some(Terms(p, size)) =>
        filtered.groupBy(f(p).as("key"))
          .agg(count(lit(1)).as("doc_count"), metricCols: _*)
          .orderBy(col("doc_count").desc, col("key").asc) // ES bucket order
          .limit(size)
      case Some(Histogram(p, interval)) =>
        filtered
          .groupBy((floor(f(p) / interval.toDouble) * interval).cast("long").as("key"))
          .agg(count(lit(1)).as("doc_count"), metricCols: _*)
          .orderBy(col("key"))
      case None =>
        require(metricCols.nonEmpty, "aggs body has no aggregations")
        filtered.agg(count(lit(1)).as("doc_count"), metricCols: _*)
    }
  }
}
