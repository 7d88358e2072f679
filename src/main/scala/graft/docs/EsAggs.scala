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
  /** `avg` | `sum` | `min` | `max` | `value_count` | `cardinality` over a
    * field path (relative to the aggregation context: document root, or
    * the array element inside a `nested` agg). `cardinality` is EXACT
    * distinct count — a documented upgrade over ES's HLL approximation
    * (same note as the exact terms top-N). */
  final case class Metric(kind: String, path: Seq[String]) extends Agg
  /** ES `terms` bucket agg: top-`size` buckets. Default ES order =
    * doc_count desc, key asc; `order` overrides it with `_key`, `_count`,
    * or a metric sub-agg NAME (validated at parse — unknown targets are
    * rejected, not ignored). `minDocCount` drops buckets below the
    * threshold BEFORE the top-N. */
  final case class Terms(path: Seq[String], size: Int,
                         order: Option[(String, Boolean)] = None,
                         minDocCount: Long = 1L) extends Agg
  /** ES `histogram` bucket agg: `floor(v / interval) * interval` bins. */
  final case class Histogram(path: Seq[String], interval: Long) extends Agg
  /** ES `date_histogram` with `calendar_interval` — variable-length
    * calendar buckets (month/quarter/year/week/day/hour/minute) via
    * `date_trunc`, keyed by the bucket's start DATE-or-TIMESTAMP
    * (rendered as the truncated value; ES returns its epoch millis). */
  final case class DateHistogram(path: Seq[String], interval: String) extends Agg
  /** ES `filters` bucket agg — one NAMED bucket per predicate (a document
    * lands in EVERY bucket it matches). Compiled as ONE conditional
    * aggregation (`sum(case when pred)` per bucket) — zero-doc buckets
    * are present with doc_count 0, exactly ES's keyed response. */
  final case class FiltersAgg(buckets: Seq[(String, SearchQuery)]) extends Agg
  /** ES `range` bucket agg — `from` INCLUSIVE, `to` EXCLUSIVE (the ES
    * contract), open ends allowed; buckets keyed `from-to` with `*` for an
    * open end, in body order. Same one-pass conditional-aggregation shape
    * as `filters`. */
  final case class RangeAgg(path: Seq[String],
                            ranges: Seq[(Option[Long], Option[Long])]) extends Agg

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

  private val metricKinds = Set("avg", "sum", "min", "max", "value_count", "cardinality")

  private val calendarIntervals =
    Set("minute", "hour", "day", "week", "month", "quarter", "year")

  private val bucketKinds =
    Set("terms", "histogram", "date_histogram", "filters", "range")

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
    /** Validate a bucket spec's keys — an unknown key silently ignored
      * (e.g. a typo'd `order`) would return buckets in the WRONG order or
      * the wrong bucket set, the same honesty rule as bool clauses. */
    def checkSpecKeys(spec: JValue, kind: String, allowed: Set[String]): Map[String, JValue] =
      spec match {
        case JObject(f) =>
          val m = f.toMap
          val unknown = m.keySet -- allowed
          require(unknown.isEmpty,
            s"unsupported $kind key(s): ${unknown.mkString(", ")} (${allowed.toSeq.sorted.mkString("/")})")
          m
        case other => throw new IllegalArgumentException(s"bad $kind agg spec: $other")
      }
    /** ES terms `order`: `{"_key"|"_count"|"<metric agg name>": "asc"|"desc"}`.
      * Metric-name targets are validated against the level's sub-aggs by
      * the caller. */
    def parseOrder(spec: Map[String, JValue]): Option[(String, Boolean)] =
      spec.get("order").map {
        case JObject(List((target, JString(dir)))) =>
          require(dir == "asc" || dir == "desc", s"bad terms order direction: $dir")
          (target, dir == "asc")
        case other => throw new IllegalArgumentException(
          s"unsupported terms order form: $other " +
            "(one {\"_key\"|\"_count\"|\"<metric agg>\": \"asc\"|\"desc\"} entry)")
      }
    /** A bucket-level tree (≤ 2 levels) or flat metrics, in context. */
    def parseTree(named: List[(String, JValue)],
                  ctx: Option[(Seq[String], Seq[String])]): Either[Seq[(String, Metric)], Buckets] =
      named match {
        case List((_, JObject(bucketFields))) if bucketFields.exists {
          case (k, _) => bucketKinds(k)
        } =>
          val bf = bucketFields.toMap
          val extraneous = bf.keySet -- (bucketKinds ++ Set("aggs", "aggregations"))
          require(extraneous.isEmpty,
            s"unsupported bucket agg key(s): ${extraneous.mkString(", ")}")
          require(bf.keySet.count(bucketKinds) == 1,
            s"a bucket agg must have exactly one bucket type: ${bf.keySet.mkString(", ")}")
          val bucket = bf.get("terms").map { spec =>
            val m = checkSpecKeys(spec, "terms", Set("field", "size", "order", "min_doc_count"))
            Terms(fieldPath(spec, "terms", ctx),
              num(spec, "size", "terms").map(_.toInt).getOrElse(10), // ES default
              parseOrder(m),
              num(spec, "min_doc_count", "terms").getOrElse(1L))
          }.orElse(bf.get("histogram").map { spec =>
            checkSpecKeys(spec, "histogram", Set("field", "interval"))
            val interval = num(spec, "interval", "histogram")
              .getOrElse(throw new IllegalArgumentException("histogram needs interval"))
            require(interval > 0, s"histogram interval must be > 0: $interval")
            Histogram(fieldPath(spec, "histogram", ctx), interval)
          }).orElse(bf.get("date_histogram").map { spec =>
            // calendar_interval ONLY: fixed intervals belong to `histogram`
            // over an epoch column; silently coercing a fixed_interval to a
            // calendar unit would put rows in the wrong buckets.
            val m = checkSpecKeys(spec, "date_histogram", Set("field", "calendar_interval"))
            val unit = m.get("calendar_interval") match {
              case Some(JString(u)) if calendarIntervals(u) => u
              case Some(other) => throw new IllegalArgumentException(
                s"unsupported calendar_interval: $other (${calendarIntervals.toSeq.sorted.mkString("/")})")
              case None => throw new IllegalArgumentException(
                "date_histogram needs calendar_interval (fixed intervals: use histogram on an epoch column)")
            }
            DateHistogram(fieldPath(spec, "date_histogram", ctx), unit)
          }).orElse(bf.get("filters").map { spec =>
            require(ctx.isEmpty, "filters agg inside a nested context is not implemented")
            val m = checkSpecKeys(spec, "filters", Set("filters"))
            val inner = m.get("filters") match {
              case Some(JObject(fs)) if fs.nonEmpty => fs
              case _ => throw new IllegalArgumentException(
                "filters agg needs a non-empty keyed \"filters\" object")
            }
            FiltersAgg(inner.map { case (name, q) =>
              name -> SearchQuery.parseQueryNode(q, schema)
            })
          }).orElse(bf.get("range").map { spec =>
            val m = checkSpecKeys(spec, "range", Set("field", "ranges"))
            val ranges = m.get("ranges") match {
              case Some(JArray(rs)) if rs.nonEmpty => rs.map {
                case JObject(bounds) =>
                  val b = bounds.toMap
                  val unknown = b.keySet -- Set("from", "to")
                  require(unknown.isEmpty,
                    s"unsupported range bound key(s): ${unknown.mkString(", ")} (from/to)")
                  val lo = b.get("from").map {
                    case JInt(i) => i.toLong
                    case JLong(l) => l
                    case other => throw new IllegalArgumentException(s"bad range from: $other")
                  }
                  val hi = b.get("to").map {
                    case JInt(i) => i.toLong
                    case JLong(l) => l
                    case other => throw new IllegalArgumentException(s"bad range to: $other")
                  }
                  require(lo.nonEmpty || hi.nonEmpty, "range bucket needs from and/or to")
                  (lo, hi)
                case other => throw new IllegalArgumentException(s"bad range bucket: $other")
              }
              case _ => throw new IllegalArgumentException("range agg needs a non-empty ranges array")
            }
            RangeAgg(fieldPath(spec, "range", ctx), ranges)
          }).get
          val tree = bf.get("aggs").orElse(bf.get("aggregations")) match {
            case None => Buckets(bucket, Nil, None)
            case Some(JObject(fields)) => parseTree(fields, ctx) match {
              case Left(ms) => Buckets(bucket, ms, None)
              case Right(inner) =>
                require(inner.sub.isEmpty,
                  "aggs nesting deeper than two bucket levels is not implemented")
                Buckets(bucket, Nil, Some(inner))
            }
            case Some(other) => throw new IllegalArgumentException(s"bad sub-aggs: $other")
          }
          // Validate terms order targets against what the level can sort
          // by; reject (don't ignore) anything else.
          def checkOrder(b: Agg, metricNames: Set[String], where: String): Unit = b match {
            case Terms(_, _, Some((target, _)), _) =>
              require(target == "_key" || target == "_count" || metricNames(target),
                s"terms order target \"$target\" is not _key/_count or a metric sub-agg of $where " +
                  s"(metrics: ${if (metricNames.isEmpty) "none" else metricNames.toSeq.sorted.mkString(", ")})")
            case _ => ()
          }
          tree.sub match {
            case None => checkOrder(tree.bucket, tree.metrics.map(_._1).toSet, "this level")
            case Some(child) =>
              checkOrder(tree.bucket, Set.empty, "the parent level (which carries no metrics)")
              checkOrder(child.bucket, child.metrics.map(_._1).toSet, "the child level")
              child.bucket match {
                case _: FiltersAgg | _: RangeAgg => throw new IllegalArgumentException(
                  "filters/range as the CHILD bucket level is not implemented")
                case _ => ()
              }
          }
          (bucket, tree.sub) match {
            case (_: FiltersAgg | _: RangeAgg, Some(_)) =>
              throw new IllegalArgumentException(
                "sub-bucket levels under filters/range aggs are not implemented")
            case _ => ()
          }
          Right(tree)
        case mixed if mixed.size > 1 && mixed.exists {
          case (_, JObject(f)) => f.exists { case (k, _) => bucketKinds(k) }
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
    /** A metric column, optionally CONDITIONAL on `pred` (the filters/
      * range one-pass shape: `avg(when(pred, v))` — aggregate functions
      * ignore NULLs, so the when() IS the bucket membership). */
    def metricCol(name: String, m: Metric, pred: Option[Column] = None): Column = {
      val v = pred match {
        case Some(p) => when(p, field(ctx, m.path))
        case None => field(ctx, m.path)
      }
      (m.kind match {
        case "avg" => avg(v).cast("double")
        case "sum" => sum(v).cast("double") // ES sum is a double
        case "min" => min(v)
        case "max" => max(v)
        case "value_count" => count(v)
        // EXACT distinct count (ES cardinality is HLL-approximate — the
        // documented upgrade, same as the exact terms top-N); the engine's
        // HLL sketch itself is q27/approxDistinct.
        case "cardinality" => count_distinct(v)
      }).as(name)
    }
    def keyCol(b: Agg): Column = b match {
      case Terms(p, _, _, _) => field(ctx, p)
      case Histogram(p, interval) =>
        // floor(v/interval)*interval in PURE INTEGER arithmetic: double
        // division misrounds at bucket boundaries once values outgrow the
        // 53-bit mantissa's exact range (epoch-micros timestamps do).
        // pmod keeps ES's floor semantics for negative values too.
        (field(ctx, p) - pmod(field(ctx, p), lit(interval))).cast("long")
      case DateHistogram(p, unit) =>
        // date_trunc is calendar arithmetic (month lengths, leap years,
        // ISO week starts) — the thing fixed-interval floor division
        // can't express. Day-or-coarser buckets render as DATE keys;
        // sub-day units keep the truncated TIMESTAMP.
        val t = date_trunc(unit, field(ctx, p))
        if (unit == "minute" || unit == "hour") t else t.cast("date")
      case other => throw new IllegalStateException(s"not a keyed bucket agg: $other")
    }
    /** ES terms bucket order — default doc_count desc / key asc; `_key`,
      * `_count`, or a metric column override, key-asc tie-broken. */
    def termsOrder(order: Option[(String, Boolean)],
                   dc: Column, key: Column): Seq[Column] = order match {
      case None | Some(("_count", false)) => Seq(dc.desc, key.asc)
      case Some(("_count", true)) => Seq(dc.asc, key.asc)
      case Some(("_key", true)) => Seq(key.asc)
      case Some(("_key", false)) => Seq(key.desc)
      case Some((metric, true)) => Seq(col(metric).asc_nulls_last, key.asc)
      case Some((metric, false)) => Seq(col(metric).desc_nulls_last, key.asc)
    }
    /** filters/range: ONE conditional aggregation over the corpus — no
      * groupBy shuffle at all (a global partial+final agg), then the F
      * buckets unfold from the single result row in body order, zero-doc
      * buckets included (ES's keyed response shape). */
    def condBuckets(buckets: Seq[(String, Column)], ms: Seq[(String, Metric)]): DataFrame = {
      val aggCols = buckets.zipWithIndex.flatMap { case ((_, pred), i) =>
        sum(when(pred, 1L).otherwise(0L)).cast("long").as(s"_dc_$i") +:
          ms.map { case (n, m) => metricCol(s"_m${i}_$n", m, Some(pred)) }
      }
      val one = rows.agg(aggCols.head, aggCols.tail: _*)
      val bucketStructs = buckets.zipWithIndex.map { case ((key, _), i) =>
        struct(lit(key).as("key") +: col(s"_dc_$i").as("doc_count") +:
          ms.map { case (n, _) => col(s"_m${i}_$n").as(n) }: _*)
      }
      one.select(explode(array(bucketStructs: _*)).as("_b")).select(col("_b.*"))
    }
    req.tree match {
      case Left(ms) =>
        require(ms.nonEmpty, "aggs body has no aggregations")
        rows.agg(count(lit(1)).as("doc_count"), ms.map { case (n, m) => metricCol(n, m) }: _*)
      case Right(Buckets(FiltersAgg(bs), ms, None)) =>
        condBuckets(bs.map { case (n, q) => n -> SearchQuery.compile(q, ctx) }, ms)
      case Right(Buckets(RangeAgg(p, rs), ms, None)) =>
        val v = field(ctx, p)
        condBuckets(rs.map { case (lo, hi) =>
          val key = s"${lo.map(_.toString).getOrElse("*")}-${hi.map(_.toString).getOrElse("*")}"
          val pred = (lo.map(v >= _).toSeq ++ hi.map(v < _).toSeq).reduce(_ && _)
          key -> pred
        }, ms)
      case Right(Buckets(b, ms, None)) =>
        val grouped = rows.groupBy(keyCol(b).as("key"))
          .agg(count(lit(1)).as("doc_count"), ms.map { case (n, m) => metricCol(n, m) }: _*)
        b match {
          case Terms(_, size, order, minDoc) =>
            val pruned = if (minDoc > 1L) grouped.filter(col("doc_count") >= minDoc) else grouped
            pruned.orderBy(termsOrder(order, col("doc_count"), col("key")): _*).limit(size)
          case _ => grouped.orderBy(col("key"))
        }
      case Right(Buckets(b1, _, Some(Buckets(b2, ms2, _)))) =>
        // Two-level split: ONE hash aggregation on the composite key
        // (corpus-sized work ends here), then parent counts / top-N /
        // child top-N as windows over the BUCKET table — |buckets| rows,
        // bounded by key cardinality, never by the corpus.
        val leaf = rows.groupBy(keyCol(b1).as("key"), keyCol(b2).as("key2"))
          .agg(count(lit(1)).as("doc_count2"), ms2.map { case (n, m) => metricCol(n, m) }: _*)
        val wp = org.apache.spark.sql.expressions.Window.partitionBy(col("key"))
        // Parent doc_count BEFORE any child pruning (ES: a child-level
        // min_doc_count does not change the parent's count).
        var out = leaf.withColumn("doc_count", sum(col("doc_count2")).over(wp))
        var parentOrder = Seq(col("doc_count").desc, col("key").asc)
        b1 match {
          case Terms(_, size1, order1, minDoc1) =>
            if (minDoc1 > 1L) out = out.filter(col("doc_count") >= minDoc1)
            // parent order can only target _key/_count (the parent level
            // carries no metrics — validated at parse)
            parentOrder = termsOrder(order1, col("doc_count"), col("key"))
            // dense_rank over the order: rows of one parent share a rank
            out = out.withColumn("_prank", dense_rank().over(
                org.apache.spark.sql.expressions.Window.orderBy(parentOrder: _*)))
              .filter(col("_prank") <= size1).drop("_prank")
          case _ => ()
        }
        var childOrder = Seq(col("key2").asc)
        b2 match {
          case Terms(_, size2, order2, minDoc2) =>
            if (minDoc2 > 1L) out = out.filter(col("doc_count2") >= minDoc2)
            childOrder = termsOrder(order2, col("doc_count2"), col("key2"))
            out = out.withColumn("_crank", row_number().over(
                wp.orderBy(childOrder: _*)))
              .filter(col("_crank") <= size2).drop("_crank")
          case _ => ()
        }
        out.select(Seq(col("key"), col("doc_count"), col("key2"), col("doc_count2"))
            ++ ms2.map { case (n, _) => col(n) }: _*)
          .orderBy(parentOrder ++ childOrder: _*)
    }
  }
}
