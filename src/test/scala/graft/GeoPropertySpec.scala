package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check, Parameters}
import graft.operators.Geo

/** Property proofs for the geospatial prune: z-cell pruning must never
  * lose a point (false negatives change RESULTS; false positives only
  * cost the exact verify). Driver-side math only — no Spark session. */
class GeoPropertySpec extends AnyFunSuite {

  private val lat = Gen.chooseNum(-90.0, 90.0)
  private val lon = Gen.chooseNum(-180.0, 180.0)

  /** Driver-side twin of Geo.zCell (same quantize + interleave). */
  private def zCell(la: Double, lo: Double, bits: Int): Long = {
    def q(v: Double, mn: Double, mx: Double): Long =
      math.min(65535L, math.max(0L, math.floor((v - mn) / (mx - mn) * 65536.0).toLong))
    val (ly, lx) = (q(la, -90, 90), q(lo, -180, 180))
    val z = (0 until 16).map { i =>
      (((ly >> i) & 1L) << (2 * i + 1)) | (((lx >> i) & 1L) << (2 * i))
    }.reduce(_ | _)
    z >> (32 - bits)
  }

  private def run(name: String, prop: Prop): Unit = {
    val r = check(Parameters.default.withMinSuccessfulTests(500), prop)
    assert(r.passed, s"$name: $r")
  }

  test("coveringCells never loses a point inside the box") {
    run("covering", forAll(lat, lat, lon, lon, lat, lon) {
      (la1, la2, lo1, lo2, pla, plo) =>
        val (latMin, latMax) = (math.min(la1, la2), math.max(la1, la2))
        val (lonMin, lonMax) = (math.min(lo1, lo2), math.max(lo1, lo2))
        // clamp the probe point into the box
        val p = (math.min(math.max(pla, latMin), latMax),
                 math.min(math.max(plo, lonMin), lonMax))
        val cells = Geo.coveringCells(latMin, latMax, lonMin, lonMax, 10).toSet
        cells.contains(zCell(p._1, p._2, 10))
    })
  }

  test("3D covering cells never lose a point inside the (bbox × interval) block") {
    val t = Gen.chooseNum(0L, 999L)
    // driver-side twin of Geo.zCell3 (quantize to 10 bits/dim + 3-way interleave)
    def zCell3(la: Double, lo: Double, tv: Long, bits: Int): Long = {
      def q(v: Double, mn: Double, mx: Double): Long =
        (math.min(65535L, math.max(0L, math.floor((v - mn) / (mx - mn) * 65536.0).toLong))) >> 6
      val qt = math.min(1023L, math.max(0L, math.floor(tv.toDouble / 1000.0 * 1024.0).toLong))
      val (ly, lx) = (q(la, -90, 90), q(lo, -180, 180))
      val z = (0 until 10).map { i =>
        (((ly >> i) & 1L) << (3 * i + 2)) | (((lx >> i) & 1L) << (3 * i + 1)) |
          (((qt >> i) & 1L) << (3 * i))
      }.reduce(_ | _)
      z >> (30 - bits)
    }
    run("covering3", forAll(lat, lat, lon, lon, Gen.zip(t, t), lat, lon, t) {
      (la1, la2, lo1, lo2, ts, pla, plo, pt) =>
        val (latMin, latMax) = (math.min(la1, la2), math.max(la1, la2))
        val (lonMin, lonMax) = (math.min(lo1, lo2), math.max(lo1, lo2))
        val (t0, t9) = (math.min(ts._1, ts._2), math.max(ts._1, ts._2))
        // clamp the probe into the block
        val p = (math.min(math.max(pla, latMin), latMax),
                 math.min(math.max(plo, lonMin), lonMax),
                 math.min(math.max(pt, t0), t9))
        val cells = Geo.coveringCells3(latMin, latMax, lonMin, lonMax,
          t0, t9, 0L, 999L, 12).toSet
        cells.contains(zCell3(p._1, p._2, p._3, 12))
    })
  }

  test("custom datatype: latLon config covering cells match the built-in") {
    import graft.operators.GeoDatatype
    run("latlon-config", forAll(lat, lat, lon, lon) { (la1, la2, lo1, lo2) =>
      val (latMin, latMax) = (math.min(la1, la2), math.max(la1, la2))
      val (lonMin, lonMax) = (math.min(lo1, lo2), math.max(lo1, lo2))
      val builtin = Geo.coveringCells(latMin, latMax, lonMin, lonMax, 10).toSet
      val config = GeoDatatype.latLon
        .coveringCells(Seq((latMin, latMax), (lonMin, lonMax)), 10).toSet
      builtin == config
    })
  }

  test("custom 3-field datatype: covering cells never lose an inside point") {
    import graft.operators.{GeoDatatype, GeoField}
    val alt = Gen.chooseNum(0.0, 5000.0)
    val dt = GeoDatatype(Seq(GeoField("x", -90, 90), GeoField("y", -180, 180),
      GeoField("alt", 0, 5000)), bitsPerField = 10)
    // driver-side twin of dt.zCell (1024-level quantize + 3-way interleave)
    def q(v: Double, mn: Double, mx: Double): Long =
      math.min(1023L, math.max(0L, math.floor((v - mn) / (mx - mn) * 1024.0).toLong))
    def cell(x: Double, y: Double, a: Double, bits: Int): Long = {
      val qs = Seq(q(x, -90, 90), q(y, -180, 180), q(a, 0, 5000))
      val z = (0 until 10).flatMap(i => qs.zipWithIndex.map { case (qq, j) =>
        ((qq >> i) & 1L) << (3 * i + (2 - j))
      }).reduce(_ | _)
      z >> (30 - bits)
    }
    run("custom3", forAll(Gen.zip(lat, lat, lon, lon), Gen.zip(alt, alt),
      Gen.zip(lat, lon, alt)) { case ((x1, x2, y1, y2), (a1, a2), (px, py, pa)) =>
      val (xMin, xMax) = (math.min(x1, x2), math.max(x1, x2))
      val (yMin, yMax) = (math.min(y1, y2), math.max(y1, y2))
      val (aMin, aMax) = (math.min(a1, a2), math.max(a1, a2))
      val p = (math.min(math.max(px, xMin), xMax),
               math.min(math.max(py, yMin), yMax),
               math.min(math.max(pa, aMin), aMax))
      val cells = dt.coveringCells(
        Seq((xMin, xMax), (yMin, yMax), (aMin, aMax)), 12).toSet
      cells.contains(cell(p._1, p._2, p._3, 12))
    })
  }

  test("circle bbox prune never loses a point within the radius") {
    val radius = Gen.chooseNum(1.0, 5000.0)
    run("circle", forAll(lat, lon, radius, lat, lon) { (cla, clo, r, pla, plo) =>
      // haversine distance, driver-side
      val rad = math.Pi / 180
      val sdlat = math.sin((pla - cla) * rad / 2)
      val sdlon = math.sin((plo - clo) * rad / 2)
      val a = sdlat * sdlat + math.cos(pla * rad) * math.cos(cla * rad) * sdlon * sdlon
      val dist = 2 * 6371.0 * math.asin(math.sqrt(a))
      // only points actually inside the circle constrain the prune
      if (dist > r) true
      else {
        // the SAME cap-bbox function circleSearch uses — the property
        // exercises production prune math, not a copy of it
        val (latLo, latHi, lonRanges) = Geo.capBounds(cla, clo, r)
        val cells = lonRanges
          .flatMap { case (lo, hi) => Geo.coveringCells(latLo, latHi, lo, hi, 10) }
          .toSet
        cells.contains(zCell(pla, plo, 10))
      }
    })
  }
}
