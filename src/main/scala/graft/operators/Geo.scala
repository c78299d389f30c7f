package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geospatial bucketing — the Spark-native analog of the reference's
  * GeoSpatial service (com/bigdata/service/geospatial/GeoSpatial.java,
  * ast/eval/GeoSpatialServiceFactory.java:133), which indexes points
  * on a z-order curve over its B+Trees. Here the z-order key is a
  * computed column: bucketing/partitioning by z-cell co-locates
  * spatially-near points, so bounding-box queries prune to a handful
  * of cell ranges instead of scanning the world — at 100 TB the quad
  * table would be partitioned (or at least sorted/zone-mapped) by
  * z-cell and a bbox query reads only matching partitions.
  *
  * All arithmetic is integer/IEEE-exact and composed from codegen'd
  * built-ins, so the DuckDB oracle replays it bit-for-bit.
  */
object Geo {

  /** 16-bit quantization of a coordinate into [0, 65535]. */
  def quantize(c: Column, min: Double, max: Double): Column =
    least(lit(65535L), greatest(lit(0L),
      floor((c - lit(min)) / lit(max - min) * lit(65536.0)).cast("long")))

  /** 32-bit Morton/z-order interleave of quantized (lat, lon). */
  def zOrder(lat: Column, lon: Column): Column = {
    val ly = quantize(lat, -90.0, 90.0)
    val lx = quantize(lon, -180.0, 180.0)
    (0 until 16).map { i =>
      shiftright(ly, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)) +
        shiftright(lx, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))
    }.reduce(_ + _)
  }

  /** Coarse z-cell: the top `bits` of the 32-bit z key. */
  def zCell(lat: Column, lon: Column, bits: Int = 10): Column =
    shiftright(zOrder(lat, lon), 32 - bits)

  /** Bounding-box predicate (the verify step after z-cell pruning). */
  def inBBox(lat: Column, lon: Column,
             latMin: Double, latMax: Double,
             lonMin: Double, lonMax: Double): Column =
    lat >= latMin && lat <= latMax && lon >= lonMin && lon <= lonMax

  /** The coarse z-cells that cover a bounding box: quantization is
    * monotone, so every point inside the box falls in the rectangle of
    * cells spanned by the quantized corners — a driver-side
    * enumeration (≤ 2^bits values), never a scan. `bits` must be even
    * (half to each axis). */
  def coveringCells(latMin: Double, latMax: Double,
                    lonMin: Double, lonMax: Double, bits: Int = 10): Seq[Long] = {
    require(bits > 0 && bits % 2 == 0 && bits <= 32, s"bits must be even in (0,32], got $bits")
    val half = bits / 2
    def q(v: Double, mn: Double, mx: Double): Long =
      math.min(65535L, math.max(0L, math.floor((v - mn) / (mx - mn) * 65536.0).toLong))
    val shift = 16 - half
    val (y0, y1) = (q(latMin, -90, 90) >> shift, q(latMax, -90, 90) >> shift)
    val (x0, x1) = (q(lonMin, -180, 180) >> shift, q(lonMax, -180, 180) >> shift)
    def interleave(y: Long, x: Long): Long =
      (0 until half).map { i =>
        (((y >> i) & 1L) << (2 * i + 1)) | (((x >> i) & 1L) << (2 * i))
      }.reduce(_ | _)
    for { y <- y0 to y1; x <- x0 to x1 } yield interleave(y, x)
  }

  /** Haversine great-circle distance (km) to a fixed center — IEEE
    * double arithmetic whose operation ORDER mirrors the oracle SQL
    * term-for-term, so both engines agree to well under the 6-dp
    * rounding used on outputs. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Double, lon2: Double): Column = {
    val sdlat = sin((lat1 - lit(lat2)) * lit(math.Pi) / 180 / 2)
    val sdlon = sin((lon1 - lit(lon2)) * lit(math.Pi) / 180 / 2)
    val a = sdlat * sdlat +
      cos(lat1 * lit(math.Pi) / 180) * lit(math.cos(lat2 * math.Pi / 180)) * sdlon * sdlon
    lit(2 * 6371.0) * asin(sqrt(a))
  }

  /** Exact spherical-cap bounding box: latitude band + the longitude
    * RANGES the cap covers (two when it crosses the antimeridian —
    * clamping would prune far-side points). Longitude extent is
    * asin(sin c / cos φ): the cap's widest meridian crossing sits at a
    * latitude ABOVE the center, so the naive r/(km-per-deg·cos φ)
    * under-covers (caught by GeoPropertySpec, which calls THIS
    * function — keep prune math here, in one place). */
  def capBounds(lat: Double, lon: Double, radiusKm: Double)
      : (Double, Double, Seq[(Double, Double)]) = {
    val c = radiusKm / 6371.0 // angular radius, radians
    val phi = lat * math.Pi / 180.0
    val dLat = math.toDegrees(c)
    val capReachesPole = math.abs(lat) + dLat >= 90.0
    val sinRatio = math.sin(c) / math.cos(phi)
    val dLon =
      if (capReachesPole || sinRatio >= 1.0) 180.0
      else math.toDegrees(math.asin(sinRatio))
    val lonRanges: Seq[(Double, Double)] =
      if (dLon >= 180.0) Seq((-180.0, 180.0))
      else {
        val (lo, hi) = (lon - dLon, lon + dLon)
        if (lo < -180) Seq((-180.0, hi), (lo + 360, 180.0))
        else if (hi > 180) Seq((-180.0, hi - 360), (lo, 180.0))
        else Seq((lo, hi))
      }
    (math.max(-90, lat - dLat), math.min(90, lat + dLat), lonRanges)
  }

  /** inCircle search (the reference's pointDistance/inCircle mode,
    * GeoSpatial.java) — the circle's exact cap bounding box drives the
    * z-cell prune, the exact haversine ≤ radius predicate verifies.
    * Both engines filter on the ROUNDED distance, so the cell
    * granularity and ulp noise never change results. */
  def circleSearch(points: DataFrame, lat: Double, lon: Double,
                   radiusKm: Double, bits: Int = 10): DataFrame = {
    val (latLo, latHi, lonRanges) = capBounds(lat, lon, radiusKm)
    val cells = lonRanges
      .flatMap { case (lo, hi) => coveringCells(latLo, latHi, lo, hi, bits) }
      .distinct
    points
      .filter(zCell(col("lat"), col("lon"), bits).isInCollection(cells))
      .withColumn("dist_km", round(haversineKm(col("lat"), col("lon"), lat, lon), 6))
      .filter(col("dist_km") <= radiusKm)
  }

  /** 10-bit quantization of an epoch-time coordinate into [0, 1023]
    * over the corpus' configured time domain — the reference's
    * geospatial datatypes carry their per-dimension schema in config
    * (GeoSpatial.java datatype declarations). */
  def quantizeTime(t: Column, tMin: Long, tMax: Long): Column =
    least(lit(1023L), greatest(lit(0L),
      floor((t - lit(tMin)).cast("double") / lit((tMax - tMin + 1).toDouble)
        * lit(1024.0)).cast("long")))

  /** 30-bit Morton interleave of quantized (lat, lon, time) — the
    * reference's DEFAULT geospatial datatype is lat-lon-TIME
    * (com/bigdata/service/geospatial/GeoSpatial.java built-in
    * lat-lon-time literal): 10 bits per dimension, lat highest. */
  def zOrder3(lat: Column, lon: Column, t: Column,
              tMin: Long, tMax: Long): Column = {
    val ly = shiftright(quantize(lat, -90.0, 90.0), 6)   // 16 -> 10 bits
    val lx = shiftright(quantize(lon, -180.0, 180.0), 6)
    val lt = quantizeTime(t, tMin, tMax)
    (0 until 10).map { i =>
      shiftright(ly, i).bitwiseAND(lit(1L)) * lit(1L << (3 * i + 2)) +
        shiftright(lx, i).bitwiseAND(lit(1L)) * lit(1L << (3 * i + 1)) +
        shiftright(lt, i).bitwiseAND(lit(1L)) * lit(1L << (3 * i))
    }.reduce(_ + _)
  }

  /** Coarse spatiotemporal z-cell: top `bits` of the 30-bit key
    * (`bits` divisible by 3 — one share per dimension). */
  def zCell3(lat: Column, lon: Column, t: Column,
             tMin: Long, tMax: Long, bits: Int = 12): Column =
    shiftright(zOrder3(lat, lon, t, tMin, tMax), 30 - bits)

  /** Covering cells of a (bbox × time-range) block at `bits`
    * granularity — monotone quantization per axis, so the cube of
    * cells spanned by the quantized corners covers every inside
    * point; driver-side enumeration like [[coveringCells]]. */
  def coveringCells3(latMin: Double, latMax: Double,
                     lonMin: Double, lonMax: Double,
                     t0: Long, t1: Long, tMin: Long, tMax: Long,
                     bits: Int = 12): Seq[Long] = {
    require(bits > 0 && bits % 3 == 0 && bits <= 30,
      s"bits must be divisible by 3 in (0,30], got $bits")
    val per = bits / 3
    def q(v: Double, mn: Double, mx: Double): Long =
      math.min(65535L, math.max(0L, math.floor((v - mn) / (mx - mn) * 65536.0).toLong)) >> 6
    def qt(t: Long): Long =
      math.min(1023L, math.max(0L,
        math.floor((t - tMin).toDouble / (tMax - tMin + 1).toDouble * 1024.0).toLong))
    val shift = 10 - per
    val (y0, y1) = (q(latMin, -90, 90) >> shift, q(latMax, -90, 90) >> shift)
    val (x0, x1) = (q(lonMin, -180, 180) >> shift, q(lonMax, -180, 180) >> shift)
    // clamp query bounds into the declared domain BEFORE quantizing:
    // avoids Long overflow on open-ended (MinValue/MaxValue) bounds,
    // and keeps the edge cells (where out-of-domain points clamp to)
    // in the enumeration so the exact verify still sees them
    def clampT(t: Long) = math.min(math.max(t, tMin), tMax)
    val (w0, w1) = (qt(clampT(t0)) >> shift, qt(clampT(t1)) >> shift)
    def interleave(y: Long, x: Long, w: Long): Long =
      (0 until per).map { i =>
        (((y >> i) & 1L) << (3 * i + 2)) | (((x >> i) & 1L) << (3 * i + 1)) |
          (((w >> i) & 1L) << (3 * i))
      }.reduce(_ | _)
    for { y <- y0 to y1; x <- x0 to x1; w <- w0 to w1 } yield interleave(y, x, w)
  }

  /** Spatiotemporal search — the reference's lat-lon-time datatype
    * queried inRectangle + geo:timeStart/geo:timeEnd
    * (GeoSpatialServiceFactory.java time-range constraints): covering
    * 3D z-cells prune, the exact bbox ∧ time-interval predicate
    * verifies, so cell granularity never changes results. `points`
    * needs (k, lat, lon, t); (tMin, tMax) is the corpus' declared
    * time domain. */
  def spatioTemporalSearch(points: DataFrame,
                           latMin: Double, latMax: Double,
                           lonMin: Double, lonMax: Double,
                           t0: Long, t1: Long, tMin: Long, tMax: Long,
                           bits: Int = 12): DataFrame = {
    val cells = coveringCells3(latMin, latMax, lonMin, lonMax, t0, t1, tMin, tMax, bits)
    points
      .filter(zCell3(col("lat"), col("lon"), col("t"), tMin, tMax, bits)
        .isInCollection(cells))
      .filter(inBBox(col("lat"), col("lon"), latMin, latMax, lonMin, lonMax) &&
        col("t") >= t0 && col("t") <= t1)
  }

  /** Bounding-box search with z-cell pruning ahead of the exact
    * verify — the plan shape of the reference's GeoSpatial service
    * (ast/eval/GeoSpatialServiceFactory.java:133: z-order range scan,
    * then per-point filter). On a table partitioned/zone-mapped by
    * z-cell the IN-list prunes storage units; the bbox predicate then
    * verifies exactly, so the cell granularity never changes results. */
  def bboxSearch(points: DataFrame,
                 latMin: Double, latMax: Double,
                 lonMin: Double, lonMax: Double, bits: Int = 10): DataFrame = {
    val cells = coveringCells(latMin, latMax, lonMin, lonMax, bits)
    points
      .filter(zCell(col("lat"), col("lon"), bits).isInCollection(cells))
      .filter(inBBox(col("lat"), col("lon"), latMin, latMax, lonMin, lonMax))
  }
}
