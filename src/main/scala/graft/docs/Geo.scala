package graft.docs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geodesic expressions shared by the `geo_distance` query, the
  * `geo_distance` agg and the `geotile_grid` agg — pure column
  * arithmetic (no UDF, whole-stage-codegen friendly).
  *
  * Distance is the haversine great-circle on an R = 6 371 000 m sphere.
  * Documented deviation: ES/Lucene haversinMeters uses R ≈ 6 371 008.77 m
  * (the mean radius) — a ≤ 1.4e-6 relative difference, far below the
  * intent of any "within N km" request. The formula is the same fixed
  * IEEE op sequence on the engine and the DuckDB oracle; libm
  * sin/cos/asin/tan/log are ≤ 1-ulp in every mainstream implementation,
  * so the two sides agree to ~1e-15 relative (the same documented
  * tolerance as the d120 decay kernels).
  *
  * The corpus has no native coordinates (FIXTURES.md §4), so geo queries
  * PLANT deterministic lat/lon from integer keys (the m5/dd8 pattern) —
  * exact tenth-of-a-degree grid values, identically derivable in SQL.
  */
object Geo {
  val EarthRadiusM = 6371000.0

  /** Haversine meters between a (lat, lon) column pair and a fixed
    * origin: `2R·asin(√(sin²(Δφ/2) + cosφ₀·cosφ·sin²(Δλ/2)))`. */
  def haversineMeters(lat: Column, lon: Column, olat: Double, olon: Double): Column = {
    val dphi = radians(lat - lit(olat)) / 2.0
    val dlmb = radians(lon - lit(olon)) / 2.0
    val a = sin(dphi) * sin(dphi) +
      cos(radians(lit(olat))) * cos(radians(lat)) * sin(dlmb) * sin(dlmb)
    lit(2.0 * EarthRadiusM) * asin(sqrt(a))
  }

  /** The identical formula as DuckDB SQL text, for oracle queries. */
  def haversineSql(lat: String, lon: String, olat: Double, olon: Double): String =
    s"(2.0 * 6371000.0) * ASIN(SQRT(" +
      s"SIN(RADIANS($lat - $olat) / 2.0) * SIN(RADIANS($lat - $olat) / 2.0)" +
      s" + COS(RADIANS($olat)) * COS(RADIANS($lat))" +
      s" * SIN(RADIANS($lon - $olon) / 2.0) * SIN(RADIANS($lon - $olon) / 2.0)))"

  /** Web-mercator slippy-tile key `"z/x/y"` (the ES geotile_grid bucket
    * key) at a fixed zoom. Callers guarantee |lat| stays inside the
    * mercator cap (85.05°) — ES clips at index time; planted corpus
    * coordinates stay within ±60°. Exact-grid latitudes that land ON a
    * tile boundary (e.g. lat 0) hit it exactly in both engines (ln(1)=0
    * is exact), so the integer floor cannot disagree. */
  def tileKey(lat: Column, lon: Column, z: Int): Column = {
    val n = (1L << z).toDouble
    val x = floor((lon + lit(180.0)) / lit(360.0) * lit(n)).cast("long")
    val phi = radians(lat)
    val y = floor((lit(1.0) - log(tan(phi) + lit(1.0) / cos(phi)) / lit(math.Pi))
      / lit(2.0) * lit(n)).cast("long")
    concat_ws("/", lit(z.toString), x.cast("string"), y.cast("string"))
  }

  /** Hex cell key `"res/q/r"` for the `geohex_grid` agg — DOCUMENTED
    * DEVIATION from ES: ES buckets by H3 (icosahedral projection math, a
    * full geodesy library); this engine buckets by an AXIAL HEX GRID on
    * the equirectangular lon/lat plane (pointy-top, cell size
    * 72°/2^res), which preserves the property Kibana maps actually use —
    * hexagonal, aperture-4-nested, stable cell ids — while staying a
    * pure fixed IEEE op sequence both engines replay bit-for-bit (the
    * haversine rule). Hex rounding is the standard cube round with
    * `floor(x + 0.5)` as the tie-up rounding (floor is a single IEEE op,
    * identical in every engine — no decimal-string round-tripping). */
  def hexKey(lat: Column, lon: Column, res: Int): Column = {
    require(res >= 0 && res <= 8, s"geohex precision out of range: $res (0-8)")
    val s = 72.0 / (1L << res).toDouble
    val q = (lon * lit(0.5773502691896258) - lat * lit(0.3333333333333333)) / lit(s)
    val r = (lat * lit(0.6666666666666666)) / lit(s)
    val y = (-q) - r
    val rx = floor(q + lit(0.5))
    val ry = floor(y + lit(0.5))
    val rz = floor(r + lit(0.5))
    val dx = abs(rx - q)
    val dy = abs(ry - y)
    val dz = abs(rz - r)
    val c1 = dx > dy && dx > dz
    val fq = when(c1, (-ry) - rz).otherwise(rx)
    val fr = when(!c1 && dy <= dz, (-rx) - ry).otherwise(rz)
    concat_ws("/", lit(res.toString),
      fq.cast("long").cast("string"), fr.cast("long").cast("string"))
  }

  /** The identical hex op sequence as DuckDB SQL text. */
  def hexKeySql(lat: String, lon: String, res: Int): String = {
    val s = 72.0 / (1L << res).toDouble
    val q = s"(($lon * 0.5773502691896258 - $lat * 0.3333333333333333) / $s)"
    val r = s"(($lat * 0.6666666666666666) / $s)"
    val y = s"((-$q) - $r)"
    val rx = s"floor($q + 0.5)"
    val ry = s"floor($y + 0.5)"
    val rz = s"floor($r + 0.5)"
    val dx = s"abs($rx - $q)"
    val dy = s"abs($ry - $y)"
    val dz = s"abs($rz - $r)"
    val c1 = s"($dx > $dy AND $dx > $dz)"
    val fq = s"(CASE WHEN $c1 THEN (-$ry) - $rz ELSE $rx END)"
    val fr = s"(CASE WHEN (NOT $c1) AND $dy <= $dz THEN (-$rx) - $ry ELSE $rz END)"
    s"('$res/' || CAST(CAST($fq AS BIGINT) AS VARCHAR) || '/' || " +
      s"CAST(CAST($fr AS BIGINT) AS VARCHAR))"
  }

  private val GeohashAlphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Geohash cell id at `precision` characters (the ES geohash_grid
    * bucket key): longitude/latitude quantized to the cell grid and
    * bit-interleaved MSB-first starting with longitude (the geohash
    * spec), then base-32 rendered. Pure integer bit arithmetic — the
    * quantization `floor((v + range) / span · 2^bits)` and the
    * interleave are exact in any engine; no trigonometry at all. */
  def geohash(lat: Column, lon: Column, precision: Int): Column = {
    require(precision >= 1 && precision <= 6,
      s"geohash precision out of implemented range: $precision (1-6)")
    val totalBits = precision * 5
    val lonBits = (totalBits + 1) / 2 // lon gets the extra bit on odd totals
    val latBits = totalBits / 2
    val lonQ = floor((lon + lit(180.0)) / lit(360.0) * lit((1L << lonBits).toDouble))
      .cast("long")
    val latQ = floor((lat + lit(90.0)) / lit(180.0) * lit((1L << latBits).toDouble))
      .cast("long")
    // clamp the +180/+90 exact-edge cell into range (geohash wraps it)
    val lonC = least(lonQ, lit((1L << lonBits) - 1L))
    val latC = least(latQ, lit((1L << latBits) - 1L))
    // interleave MSB-first, lon first: bit k of the result (from MSB,
    // k = 0 .. totalBits-1) is lon bit (lonBits-1-k/2) when k even,
    // lat bit (latBits-1-k/2) when odd
    val inter = (0 until totalBits).map { k =>
      val src = if (k % 2 == 0) lonC else latC
      val srcBit = (if (k % 2 == 0) lonBits else latBits) - 1 - k / 2
      val outBit = totalBits - 1 - k
      shiftleft(shiftright(src, srcBit).bitwiseAND(1L), outBit)
    }.reduce(_ + _)
    concat((0 until precision).map { c =>
      val idx = shiftright(inter, 5 * (precision - 1 - c)).bitwiseAND(31L)
      lit(GeohashAlphabet).substr(idx.cast("int") + 1, lit(1))
    }: _*)
  }

  /** The identical geohash as DuckDB SQL text — a flat expression over
    * the caller's `lat`/`lon` column names (the quantized/interleaved
    * integers are inlined textually; callers keep it readable by staging
    * lonc/latc/lonlat in CTE columns and passing THOSE names). */
  def geohashSql(lonlat: String, precision: Int): String =
    (0 until precision).map { c =>
      s"substr('$GeohashAlphabet', CAST((($lonlat >> ${5 * (precision - 1 - c)}) & 31) + 1 AS INTEGER), 1)"
    }.mkString(" || ")

  /** The quantize+interleave integer (`lonlat` input of [[geohashSql]])
    * as DuckDB SQL over staged `lonc`/`latc` quantized-integer columns. */
  def geohashInterleaveSql(lonc: String, latc: String, precision: Int): String = {
    val totalBits = precision * 5
    val lonBits = (totalBits + 1) / 2
    val latBits = totalBits / 2
    (0 until totalBits).map { k =>
      val src = if (k % 2 == 0) lonc else latc
      val srcBit = (if (k % 2 == 0) lonBits else latBits) - 1 - k / 2
      val outBit = totalBits - 1 - k
      s"((($src >> $srcBit) & 1) << $outBit)"
    }.mkString(" + ")
  }

  /** The quantized-longitude / quantized-latitude integers as DuckDB SQL. */
  def geohashQuantSql(lat: String, lon: String, precision: Int): (String, String) = {
    val totalBits = precision * 5
    val lonBits = (totalBits + 1) / 2
    val latBits = totalBits / 2
    (s"LEAST(CAST(FLOOR(($lon + 180.0) / 360.0 * ${(1L << lonBits).toDouble}) AS BIGINT), ${(1L << lonBits) - 1})",
      s"LEAST(CAST(FLOOR(($lat + 90.0) / 180.0 * ${(1L << latBits).toDouble}) AS BIGINT), ${(1L << latBits) - 1})")
  }

  /** Ray-casting point-in-polygon over LITERAL vertices (the `geo_shape`
    * polygon test). Crossing parity of a rightward ray against each edge;
    * the classic division form `x < xi + (xj-xi)(y-yi)/(yj-yi)` is
    * rearranged to MULTIPLICATION only (the edge's Δy sign is a
    * plan-time constant, so the inequality direction folds per edge) —
    * no division means no ANSI zero-divisor trap and bit-identical IEEE
    * arithmetic in any engine. Horizontal edges can never straddle the
    * ray and drop out at plan time. Boundary points follow the parity
    * test's half-open edge convention (callers choose vertices off the
    * data grid when exactness at edges matters). */
  def pointInPolygon(lat: Column, lon: Column,
                     verts: Seq[(Double, Double)]): Column = {
    require(verts.size >= 3, s"polygon needs >= 3 vertices, got ${verts.size}")
    val crossings = verts.indices.flatMap { i =>
      val (yi, xi) = verts(i)
      val (yj, xj) = verts((i + 1) % verts.size)
      if (yi == yj) None // horizontal edge: never straddles the ray
      else {
        val straddle = (lit(yi) > lat) =!= (lit(yj) > lat)
        val e = lit(xj - xi) * (lat - lit(yi)) - (lon - lit(xi)) * lit(yj - yi)
        val cross = if (yj > yi) e > lit(0.0) else e < lit(0.0)
        Some(when(straddle && cross, 1).otherwise(0))
      }
    }
    crossings.reduce(_ + _) % 2 === 1
  }

  /** The identical parity test as DuckDB SQL text (same plan-time edge
    * constants, same inequality directions). */
  def pointInPolygonSql(lat: String, lon: String,
                        verts: Seq[(Double, Double)]): String = {
    require(verts.size >= 3, s"polygon needs >= 3 vertices, got ${verts.size}")
    val terms = verts.indices.flatMap { i =>
      val (yi, xi) = verts(i)
      val (yj, xj) = verts((i + 1) % verts.size)
      if (yi == yj) None
      else {
        val cmp = if (yj > yi) ">" else "<"
        Some(s"(CASE WHEN (($yi > $lat) <> ($yj > $lat)) AND " +
          s"((${xj - xi} * ($lat - $yi) - ($lon - $xi) * ${yj - yi}) $cmp 0.0) " +
          "THEN 1 ELSE 0 END)")
      }
    }
    s"((${terms.mkString(" + ")}) % 2 = 1)"
  }

  /** Ray-casting parity test where the polygon vertices are COLUMNS (a
    * doc-side `geo_shape` field): same crossing rule as
    * [[pointInPolygon]], but the per-edge inequality direction resolves
    * at RUNTIME (`when(yj > yi, t > 0, t < 0)`) since Δy's sign is no
    * longer a plan-time constant. Horizontal edges fall out via the
    * straddle test. Pure multiplication-only column math; the SQL twin
    * ([[pointInPolygonDynSql]]) stages the identical op sequence. */
  def pointInPolygonDyn(lat: Column, lon: Column,
                        verts: Seq[(Column, Column)]): Column = {
    require(verts.size >= 3, s"polygon needs >= 3 vertices, got ${verts.size}")
    val n = verts.size
    val crossings = (0 until n).map { i =>
      val (yi, xi) = verts(i)
      val (yj, xj) = verts((i + 1) % n)
      val straddle = (yi > lat) =!= (yj > lat)
      val t = (xj - xi) * (lat - yi) - (lon - xi) * (yj - yi)
      val cross = when(yj > yi, t > lit(0.0)).otherwise(t < lit(0.0))
      when(straddle && cross, 1).otherwise(0)
    }
    crossings.reduce(_ + _) % 2 === 1
  }

  /** [[pointInPolygonDyn]] as DuckDB SQL over staged vertex column names
    * `verts = Seq((yName, xName), …)`; `lat`/`lon` are SQL expressions
    * (typically literals — the query shape's vertices). */
  def pointInPolygonDynSql(lat: String, lon: String,
                           verts: Seq[(String, String)]): String = {
    require(verts.size >= 3, s"polygon needs >= 3 vertices, got ${verts.size}")
    val n = verts.size
    val terms = (0 until n).map { i =>
      val (yi, xi) = verts(i)
      val (yj, xj) = verts((i + 1) % n)
      s"(CASE WHEN (($yi > $lat) <> ($yj > $lat)) AND " +
        s"(CASE WHEN $yj > $yi THEN (($xj - $xi) * ($lat - $yi) - ($lon - $xi) * ($yj - $yi)) > 0.0 " +
        s"ELSE (($xj - $xi) * ($lat - $yi) - ($lon - $xi) * ($yj - $yi)) < 0.0 END) " +
        "THEN 1 ELSE 0 END)"
    }
    s"((${terms.mkString(" + ")}) % 2 = 1)"
  }

  /** Proper (strict) segment crossing between a COLUMN segment A→B and a
    * LITERAL segment C→D, via the four-orientation test:
    * `orient(A,B,C)·orient(A,B,D) < 0 ∧ orient(C,D,A)·orient(C,D,B) < 0`
    * with `orient(P,Q,R) = (Qx−Px)(Ry−Py) − (Qy−Py)(Rx−Px)`. Touching
    * endpoints / collinear overlap count as NON-crossing (callers pick
    * query vertices off the data grid, the pointInPolygon convention). */
  def segmentsCross(ay: Column, ax: Column, by: Column, bx: Column,
                    c: (Double, Double), d0: (Double, Double)): Column = {
    val (cy, cx) = c
    val (dy, dx) = d0
    val oAbc = (bx - ax) * (lit(cy) - ay) - (by - ay) * (lit(cx) - ax)
    val oAbd = (bx - ax) * (lit(dy) - ay) - (by - ay) * (lit(dx) - ax)
    val oCda = lit(dx - cx) * (ay - lit(cy)) - lit(dy - cy) * (ax - lit(cx))
    val oCdb = lit(dx - cx) * (by - lit(cy)) - lit(dy - cy) * (bx - lit(cx))
    oAbc * oAbd < lit(0.0) && oCda * oCdb < lit(0.0)
  }

  /** [[segmentsCross]] as DuckDB SQL (same op sequence; `ay…bx` are SQL
    * column names, `c`/`d0` literal vertices — Δ constants fold in Scala
    * exactly as the Column twin's `lit(dx - cx)`). */
  def segmentsCrossSql(ay: String, ax: String, by: String, bx: String,
                       c: (Double, Double), d0: (Double, Double)): String = {
    val (cy, cx) = c
    val (dy, dx) = d0
    val oAbc = s"(($bx - $ax) * ($cy - $ay) - ($by - $ay) * ($cx - $ax))"
    val oAbd = s"(($bx - $ax) * ($dy - $ay) - ($by - $ay) * ($dx - $ax))"
    val oCda = s"(${dx - cx} * ($ay - $cy) - ${dy - cy} * ($ax - $cx))"
    val oCdb = s"(${dx - cx} * ($by - $cy) - ${dy - cy} * ($bx - $cx))"
    s"($oAbc * $oAbd < 0.0 AND $oCda * $oCdb < 0.0)"
  }

  /** Polygon–polygon INTERSECTS between a doc-side shape (COLUMN
    * vertices) and a literal query polygon: any doc vertex inside the
    * query shape, OR any query vertex inside the doc shape, OR any edge
    * pair properly crossing — complete for simple polygons up to the
    * documented boundary-touching convention. O(|doc|·|query|) edge
    * tests, all multiplication-only column math behind the caller's
    * pushed bbox prefilter. */
  def polygonsIntersect(docVerts: Seq[(Column, Column)],
                        queryVerts: Seq[(Double, Double)]): Column = {
    val docVertexInQuery = docVerts.map { case (y, x) =>
      pointInPolygon(y, x, queryVerts)
    }.reduce(_ || _)
    val queryVertexInDoc = queryVerts.map { case (y, x) =>
      pointInPolygonDyn(lit(y), lit(x), docVerts)
    }.reduce(_ || _)
    val nq = queryVerts.size
    val edgeCross = docVerts.indices.flatMap { i =>
      val (ay, ax) = docVerts(i)
      val (by, bx) = docVerts((i + 1) % docVerts.size)
      (0 until nq).map { j =>
        segmentsCross(ay, ax, by, bx, queryVerts(j), queryVerts((j + 1) % nq))
      }
    }.reduce(_ || _)
    docVertexInQuery || queryVertexInDoc || edgeCross
  }

  /** [[polygonsIntersect]] as DuckDB SQL over staged vertex columns. */
  def polygonsIntersectSql(docVerts: Seq[(String, String)],
                           queryVerts: Seq[(Double, Double)]): String = {
    val docVertexInQuery = docVerts.map { case (y, x) =>
      pointInPolygonSql(y, x, queryVerts)
    }.mkString("(", " OR ", ")")
    val queryVertexInDoc = queryVerts.map { case (y, x) =>
      pointInPolygonDynSql(y.toString, x.toString, docVerts)
    }.mkString("(", " OR ", ")")
    val nq = queryVerts.size
    val edgeCross = docVerts.indices.flatMap { i =>
      val (ay, ax) = docVerts(i)
      val (by, bx) = docVerts((i + 1) % docVerts.size)
      (0 until nq).map { j =>
        segmentsCrossSql(ay, ax, by, bx, queryVerts(j), queryVerts((j + 1) % nq))
      }
    }.mkString("(", " OR ", ")")
    s"($docVertexInQuery OR $queryVertexInDoc OR $edgeCross)"
  }

  /** The identical tile key as DuckDB SQL text. */
  def tileKeySql(lat: String, lon: String, z: Int): String = {
    val n = s"${(1L << z).toDouble}"
    val x = s"CAST(FLOOR(($lon + 180.0) / 360.0 * $n) AS BIGINT)"
    val y = s"CAST(FLOOR((1.0 - LN(TAN(RADIANS($lat)) + 1.0 / COS(RADIANS($lat))) / PI())" +
      s" / 2.0 * $n) AS BIGINT)"
    s"'$z' || '/' || CAST($x AS VARCHAR) || '/' || CAST($y AS VARCHAR)"
  }
}
