package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One declared coordinate component of a custom geospatial datatype:
  * its column name and value domain (values outside clamp to the
  * domain edge, like the built-in lat/lon quantizers). */
final case class GeoField(name: String, min: Double, max: Double) {
  require(max > min, s"geo field $name: max must exceed min")
}

/** Custom geospatial datatype configurations — the seam the reference
  * exposes as per-deployment datatype declarations
  * (bigdata-core/bigdata-rdf/src/java/com/bigdata/service/geospatial/
  * GeoSpatialDatatypeConfiguration.java:56: a JSON config names the
  * ordered components — latitude/longitude/time/custom fields with
  * their ranges — and the engine builds its z-order index over them).
  * Graft's two built-ins ([[Geo.zOrder]] lat-lon, [[Geo.zOrder3]]
  * lat-lon-time) are instances of this general form: k declared
  * fields, `bitsPerField` quantization bits each, Morton-interleaved
  * most-significant-field-first, searched by covering-cell prune +
  * exact verify — the identical plan shape, for ANY component schema,
  * so cell granularity never changes results.
  *
  * Scale: `zOrder` is a computed codegen column — partition or
  * zone-map the 100-TB point table by `zCell` and a range query reads
  * only the covering cells' storage units; the cell enumeration is
  * driver-side corner arithmetic (≤ 2^bits values, capped). */
final case class GeoDatatype(fields: Seq[GeoField], bitsPerField: Int = 8) {
  require(fields.nonEmpty, "GeoDatatype needs at least one field")
  require(fields.map(_.name).distinct.size == fields.size,
    "GeoDatatype field names must be distinct")
  require(bitsPerField >= 1 && bitsPerField <= 16,
    s"bitsPerField must be in [1,16], got $bitsPerField")
  require(fields.size * bitsPerField <= 60,
    s"total key bits ${fields.size * bitsPerField} exceed 60 (long-safe bound)")

  private val k = fields.size
  private val m = (1L << bitsPerField) - 1

  /** Quantize one component into [0, 2^bitsPerField − 1], clamped. */
  def quantize(c: Column, f: GeoField): Column =
    least(lit(m), greatest(lit(0L),
      floor((c - lit(f.min)) / lit(f.max - f.min) * lit((m + 1).toDouble))
        .cast("long")))

  /** k-D Morton key of the declared components (one column per field,
    * declaration order; field 0 takes the most significant bit of
    * each k-bit plane). */
  def zOrder(cols: Seq[Column]): Column = {
    require(cols.size == k, s"zOrder needs $k columns, got ${cols.size}")
    val qs = fields.zip(cols).map { case (f, c) => quantize(c, f) }
    (0 until bitsPerField).flatMap { i =>
      qs.zipWithIndex.map { case (q, j) =>
        shiftright(q, i).bitwiseAND(lit(1L)) * lit(1L << (k * i + (k - 1 - j)))
      }
    }.reduce(_ + _)
  }

  /** Coarse cell: top `bits` of the key (`bits` divisible by k — an
    * equal share per field, same contract as [[Geo.zCell3]]). */
  def zCell(cols: Seq[Column], bits: Int): Column = {
    requireBits(bits)
    shiftright(zOrder(cols), k * bitsPerField - bits)
  }

  // 18-bit cap: coveringCells enumerates up to 2^bits cells on the
  // DRIVER and the prune inlines them into the plan — 2^18 (256k,
  // collapsed to ranges before planning) is the most a filter should
  // ever carry; the built-in Geo queries use 10-12
  private def requireBits(bits: Int): Unit =
    require(bits > 0 && bits % k == 0 && bits <= math.min(k * bitsPerField, 18),
      s"bits must be divisible by $k in (0, ${math.min(k * bitsPerField, 18)}], got $bits")

  private def qLocal(v: Double, f: GeoField): Long =
    math.min(m, math.max(0L,
      math.floor((v - f.min) / (f.max - f.min) * (m + 1).toDouble).toLong))

  /** Covering cells of a per-field range block: quantization is
    * monotone per axis, so the k-cube of cells spanned by the
    * quantized corners covers every inside point — driver-side
    * enumeration, never a scan. Query bounds clamp into the declared
    * domain first (keeps edge cells, avoids overflow on open-ended
    * bounds — the [[Geo.coveringCells3]] lesson). */
  def coveringCells(ranges: Seq[(Double, Double)], bits: Int): Seq[Long] = {
    require(ranges.size == k, s"need $k ranges, got ${ranges.size}")
    requireBits(bits)
    val per = bits / k
    val shift = bitsPerField - per
    val spans: Seq[Seq[Long]] = fields.zip(ranges).map { case (f, (lo, hi)) =>
      def clamp(v: Double) = math.min(math.max(v, f.min), f.max)
      ((qLocal(clamp(lo), f) >> shift) to (qLocal(clamp(hi), f) >> shift)).toSeq
    }
    spans.foldLeft(Seq(Seq.empty[Long]))((acc, span) =>
        acc.flatMap(prefix => span.map(prefix :+ _)))
      .map { coords =>
        (0 until per).flatMap(i => coords.zipWithIndex.map { case (q, j) =>
          ((q >> i) & 1L) << (k * i + (k - 1 - j))
        }).reduce(_ | _)
      }
  }

  /** Range search over a points table carrying one column per declared
    * field: covering-cell prune ahead of the exact per-field range
    * verify (the GeoSpatialServiceFactory plan shape — z-range scan,
    * then per-point filter).
    *
    * The prune is PLAN-SIZE-BOUNDED two ways. Up to 2048 covering
    * cells it stays the `isInCollection` INSET — ONE hash-set probe of
    * the cell key per row (the r9 shape; an OR-chain of range
    * predicates here was measured 70x SLOWER because each predicate
    * duplicated the full bit-interleave key expression). Above that,
    * the sorted cells collapse into contiguous [lo, hi] runs (a full
    * Morton sub-square is one run), greedily coalesced across the
    * SMALLEST gaps down to ≤64 ranges — the reference's z-RANGE scans;
    * coalescing only widens the prune (extra cells admitted), and the
    * exact per-field filter behind it keeps results identical. The key
    * expression is projected ONCE into a helper column so the 64
    * BETWEENs compare a long, not 64 copies of the interleave.
    * Nothing cell-count-sized ever reaches the plan. */
  def rangeSearch(points: DataFrame, ranges: Seq[(Double, Double)],
                  bits: Int): DataFrame = {
    val cols = fields.map(f => col(f.name))
    val cells = coveringCells(ranges, bits).sorted
    val exact = fields.zip(ranges).map { case (f, (lo, hi)) =>
      col(f.name) >= lit(lo) && col(f.name) <= lit(hi)
    }.reduce(_ && _)
    if (cells.isEmpty) points.filter(lit(false))
    else if (cells.size <= 2048)
      points.filter(zCell(cols, bits).isInCollection(cells)).filter(exact)
    else {
      val runs = cells.foldLeft(Vector.empty[(Long, Long)]) {
        case (acc :+ ((lo, hi)), c) if c == hi + 1 => acc :+ (lo, hi + 1)
        case (acc, c)                              => acc :+ (c, c)
      }
      val maxRanges = 64
      val coalesced =
        if (runs.size <= maxRanges) runs
        else {
          // keep the (maxRanges-1) LARGEST gaps as separators; all
          // smaller gaps get absorbed into their neighboring range
          val gaps = runs.sliding(2).zipWithIndex.collect {
            case (Seq((_, h), (l, _)), i) => (l - h, i)
          }.toVector
          val keep = gaps.sortBy(-_._1).take(maxRanges - 1).map(_._2).toSet
          runs.zipWithIndex.foldLeft(Vector.empty[(Long, Long)]) {
            case (acc :+ ((lo, _)), ((_, hi), i)) if !keep.contains(i - 1) =>
              acc :+ (lo, hi) // absorb the small gap before run i
            case (acc, ((lo, hi), _)) => acc :+ (lo, hi)
          }
        }
      val zc = col("_graft_zcell")
      val prune = coalesced.map { case (lo, hi) =>
        if (lo == hi) zc === lit(lo) else zc.between(lit(lo), lit(hi))
      }.reduce(_ || _)
      points.withColumn("_graft_zcell", zCell(cols, bits))
        .filter(prune).filter(exact).drop("_graft_zcell")
    }
  }
}

object GeoDatatype {
  /** The built-in lat-lon datatype expressed through the config
    * system — bit-identical keys to [[Geo.zOrder]] (spec-asserted). */
  val latLon: GeoDatatype = GeoDatatype(
    Seq(GeoField("lat", -90, 90), GeoField("lon", -180, 180)), bitsPerField = 16)
}
