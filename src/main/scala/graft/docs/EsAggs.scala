package graft.docs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** ES `aggs` bodies — the other half of a Kibana request (every dashboard
  * panel is a terms/histogram bucket agg with metric sub-aggs), compiled
  * to a single `groupBy().agg()`.
  *
  * Scope (loudly rejected beyond it): up to TWO bucket levels — `terms`
  * (count-desc top-N buckets) or `histogram` (fixed `interval` bins),
  * optionally split by a second bucket agg (the Kibana "split series"
  * shape) — with metric sub-aggs at the leaf level, or a flat set of
  * metric aggs (global aggregation); optionally inside ONE `nested`
  * context agg. Metrics: `avg`, `sum`, `min`, `max`, `value_count`.
  * Field paths may not cross an array UNLESS the body switches into that
  * array with a `nested` agg (exactly ES's rule: a nested-mapped field is
  * only aggregable from a nested context).
  *
  * A `nested` agg over an array path changes the unit of aggregation to
  * the array ELEMENTS (each nested element is its own Lucene doc in ES —
  * `doc_count` counts elements, metric fields resolve inside the
  * element), compiled as `explode(array)` before the groupBy. A `nested`
  * agg over a struct path (the reference maps structs as `nested` too —
  * `IndexingListener.java:71-96`) is a no-op context switch, as in ES.
  *
  * Output is the relational rendering of ES's bucket list: one row per
  * bucket — `key`, `doc_count`, then one column per metric agg named by
  * its agg name. `avg`/`sum` are doubles (ES returns doubles for both);
  * `min`/`max` keep the field type; `value_count` is a long.
  *
  * Scale shape: one hash aggregation — partial (map-side) combine, one
  * shuffle on the bucket key, and for `terms` a TakeOrderedAndProject of
  * the top `size` buckets; a `nested` context adds a generate (explode)
  * before the partial agg, never a join. NOTE a semantic upgrade over
  * ES: ES terms aggs are APPROXIMATE (per-shard top `shard_size` then
  * merge — documented doc_count error); this engine's top-N is exact,
  * because the groupBy sees all rows for a key after the shuffle.
  */
object EsAggs {

  sealed trait Agg
  /** `avg` | `sum` | `min` | `max` | `value_count` over a field path
    * (relative to the aggregation context: document root, or the array
    * element inside a `nested` agg). */
  final case class Metric(kind: String, path: Seq[String]) extends Agg
  /** ES `terms` bucket agg: top-`size` keys by doc_count desc, key asc. */
  final case class Terms(path: Seq[String], size: Int) extends Agg
  /** ES `histogram` bucket agg: `floor(v / interval) * interval` bins. */
  final case class Histogram(path: Seq[String], interval: Long) extends Agg

  /** A bucket level: the bucket agg, its metric sub-aggs, and at most one
    * sub-bucket level (Kibana "split series" — terms × terms/histogram).
    * Depth is capped at two bucket levels; a level with a sub-bucket
    * carries no metrics of its own (parse rejects mixing). */
  final case class Buckets(bucket: Agg, metrics: Seq[(String, Metric)],
                           sub: Option[Buckets])

  final case class Request(query: SearchQuery,
                           nestedPath: Option[Seq[String]],
                           tree: Either[Seq[(String, Metric)], Buckets]) {
    /** Back-compat views used by single-level callers/tests. */
    def bucket: Option[Agg] = tree.toOption.map(_.bucket)
    def metrics: Seq[(String, Metric)] = tree.fold(identity, _.metrics)
  }

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

    def namedOf(jv: JValue): List[(String, JValue)] = jv match {
      case JObject(fields) => fields
      case other => throw new IllegalArgumentException(s"aggs must be an object: $other")
    }
    def asString(v: JValue): String = v match {
      case JString(s) => s
      case other => throw new IllegalArgumentException(s"not a string: $other")
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
    /** Resolve an agg `field` against the context: document root (ctx =
      * None, array crossing rejected) or a nested array (ctx =
      * Some((declaredNestedPath, arrayPath)) — ES paths are absolute, so
      * require the declared prefix and strip the ARRAY prefix to the
      * element-relative remainder; the two differ when `nested.path`
      * extends into the element, README-query-2 style). */
    def fieldPath(spec: JValue, kind: String,
                  ctx: Option[(Seq[String], Seq[String])]): Seq[String] = {
      val p = spec match {
        case JObject(f) => f.toMap.get("field") match {
          case Some(JString(s)) => s
          case _ => throw new IllegalArgumentException(s"$kind agg needs a \"field\"")
        }
        case other => throw new IllegalArgumentException(s"bad $kind agg spec: $other")
      }
      val path = p.stripSuffix(".keyword").split('.').toSeq
      ctx match {
        case None =>
          val (arr, _) = SearchQuery.splitArrayPath(path, schema)
          require(arr.isEmpty,
            s"agg field $p crosses array ${arr.mkString(".")} — switch context with a nested agg first")
          path
        case Some((np, arr)) =>
          require(path.startsWith(np),
            s"agg field $p is outside the nested context ${np.mkString(".")}")
          path.drop(arr.length)
      }
    }
    def parseMetrics(entries: List[(String, JValue)],
                     ctx: Option[(Seq[String], Seq[String])]): Seq[(String, Metric)] =
      entries.map {
        case (name, JObject(List((kind, spec)))) if metricKinds(kind) =>
          name -> Metric(kind, fieldPath(spec, kind, ctx))
        case (name, other) =>
          throw new IllegalArgumentException(
            s"unsupported metric agg $name: $other (supported: ${metricKinds.mkString("/")})")
      }
    /** A bucket-level tree (≤ 2 levels) or flat metrics, in context. */
    def parseTree(named: List[(String, JValue)],
                  ctx: Option[(Seq[String], Seq[String])]): Either[Seq[(String, Metric)], Buckets] =
      named match {
        case List((_, JObject(bucketFields))) if bucketFields.exists {
          case (k, _) => k == "terms" || k == "histogram"
        } =>
          val bf = bucketFields.toMap
          val extraneous = bf.keySet -- Set("terms", "histogram", "aggs", "aggregations")
          require(extraneous.isEmpty,
            s"unsupported bucket agg key(s): ${extraneous.mkString(", ")}")
          val bucket = bf.get("terms").map { spec =>
            Terms(fieldPath(spec, "terms", ctx),
              num(spec, "size", "terms").map(_.toInt).getOrElse(10)) // ES default
          }.orElse(bf.get("histogram").map { spec =>
            val interval = num(spec, "interval", "histogram")
              .getOrElse(throw new IllegalArgumentException("histogram needs interval"))
            require(interval > 0, s"histogram interval must be > 0: $interval")
            Histogram(fieldPath(spec, "histogram", ctx), interval)
          }).get
          bf.get("aggs").orElse(bf.get("aggregations")) match {
            case None => Right(Buckets(bucket, Nil, None))
            case Some(JObject(fields)) => parseTree(fields, ctx) match {
              case Left(ms) => Right(Buckets(bucket, ms, None))
              case Right(inner) =>
                require(inner.sub.isEmpty,
                  "aggs nesting deeper than two bucket levels is not implemented")
                Right(Buckets(bucket, Nil, Some(inner)))
            }
            case Some(other) => throw new IllegalArgumentException(s"bad sub-aggs: $other")
          }
        case mixed if mixed.size > 1 && mixed.exists {
          case (_, JObject(f)) => f.exists { case (k, _) => k == "terms" || k == "histogram" }
          case _ => false
        } =>
          throw new IllegalArgumentException(
            "a level mixing metric aggs with a bucket agg is not implemented " +
              "(attach metrics to the LEAF bucket level)")
        case metricsOnly => Left(parseMetrics(metricsOnly, ctx))
      }

    namedOf(aggsJ) match {
      // a nested context agg wrapping the real aggregation
      case List((_, JObject(nestedFields))) if nestedFields.exists(_._1 == "nested") =>
        val nf = nestedFields.toMap
        val extraneous = nf.keySet -- Set("nested", "aggs", "aggregations")
        require(extraneous.isEmpty,
          s"unsupported nested agg key(s): ${extraneous.mkString(", ")}")
        val pathStr = nf("nested") match {
          case JObject(pf) => pf.toMap.get("path").map(asString)
            .getOrElse(throw new IllegalArgumentException("nested agg needs a \"path\""))
          case other => throw new IllegalArgumentException(s"bad nested spec: $other")
        }
        val np = pathStr.split('.').toSeq
        val inner = nf.get("aggs").orElse(nf.get("aggregations"))
          .map(namedOf).getOrElse(throw new IllegalArgumentException("nested agg needs sub-aggs"))
        SearchQuery.splitArrayPath(np, schema) match {
          case (Nil, _) => // struct path (reference maps structs nested too): no-op context
            Request(query, None, parseTree(inner, None))
          case (arr, _) => // array path (may extend into the element, README-query-2 style)
            Request(query, Some(arr), parseTree(inner, Some((np, arr))))
        }
      case named =>
        Request(query, None, parseTree(named, None))
    }
  }

  /** Run an ES aggs body against the document table. */
  def run(docs: DataFrame, docCol: String, body: String, schema: StructType): DataFrame = {
    val req = parse(body, schema)
    val doc = col(docCol)
    def field(root: Column, p: Seq[String]): Column =
      p.foldLeft(root)((c, n) => c.getField(n))
    val filtered = docs.filter(SearchQuery.compile(req.query, doc))
    // nested context: the unit of aggregation becomes the array element
    val (rows, ctx) = req.nestedPath match {
      case Some(np) => (filtered.select(explode(field(doc, np)).as("el")), col("el"))
      case None => (filtered, doc)
    }
    def metricCol(name: String, m: Metric): Column = (m.kind match {
      case "avg" => avg(field(ctx, m.path)).cast("double")
      case "sum" => sum(field(ctx, m.path)).cast("double") // ES sum is a double
      case "min" => min(field(ctx, m.path))
      case "max" => max(field(ctx, m.path))
      case "value_count" => count(field(ctx, m.path))
    }).as(name)
    def keyCol(b: Agg): Column = b match {
      case Terms(p, _) => field(ctx, p)
      case Histogram(p, interval) =>
        // floor(v/interval)*interval in PURE INTEGER arithmetic: double
        // division misrounds at bucket boundaries once values outgrow the
        // 53-bit mantissa's exact range (epoch-micros timestamps do).
        // pmod keeps ES's floor semantics for negative values too.
        (field(ctx, p) - pmod(field(ctx, p), lit(interval))).cast("long")
      case m: Metric => throw new IllegalStateException(s"not a bucket agg: $m")
    }
    req.tree match {
      case Left(ms) =>
        require(ms.nonEmpty, "aggs body has no aggregations")
        rows.agg(count(lit(1)).as("doc_count"), ms.map((metricCol _).tupled): _*)
      case Right(Buckets(b, ms, None)) =>
        val grouped = rows.groupBy(keyCol(b).as("key"))
          .agg(count(lit(1)).as("doc_count"), ms.map((metricCol _).tupled): _*)
        b match {
          case Terms(_, size) =>
            grouped.orderBy(col("doc_count").desc, col("key").asc).limit(size) // ES bucket order
          case _ => grouped.orderBy(col("key"))
        }
      case Right(Buckets(b1, _, Some(Buckets(b2, ms2, _)))) =>
        // Two-level split: ONE hash aggregation on the composite key
        // (corpus-sized work ends here), then parent counts / top-N /
        // child top-N as windows over the BUCKET table — |buckets| rows,
        // bounded by key cardinality, never by the corpus.
        val leaf = rows.groupBy(keyCol(b1).as("key"), keyCol(b2).as("key2"))
          .agg(count(lit(1)).as("doc_count2"), ms2.map((metricCol _).tupled): _*)
        val wp = org.apache.spark.sql.expressions.Window.partitionBy(col("key"))
        var out = leaf.withColumn("doc_count", sum(col("doc_count2")).over(wp))
        b1 match {
          case Terms(_, size1) =>
            // dense_rank over (count, key): rows of one parent share a rank
            out = out.withColumn("_prank", dense_rank().over(
                org.apache.spark.sql.expressions.Window
                  .orderBy(col("doc_count").desc, col("key").asc)))
              .filter(col("_prank") <= size1).drop("_prank")
          case _ => ()
        }
        b2 match {
          case Terms(_, size2) =>
            out = out.withColumn("_crank", row_number().over(
                wp.orderBy(col("doc_count2").desc, col("key2").asc)))
              .filter(col("_crank") <= size2).drop("_crank")
          case _ => ()
        }
        val childOrder = b2 match {
          case Terms(_, _) => Seq(col("doc_count2").desc, col("key2").asc)
          case _ => Seq(col("key2").asc)
        }
        out.select(Seq(col("key"), col("doc_count"), col("key2"), col("doc_count2"))
            ++ ms2.map { case (n, _) => col(n) }: _*)
          .orderBy(Seq(col("doc_count").desc, col("key").asc) ++ childOrder: _*)
    }
  }
}
