package graft.operators

import org.apache.spark.sql.Column
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
}
