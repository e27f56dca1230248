package graft.geo

/** Coordinate reference systems for ST_Transform — closed-form
  * reprojection for the EPSG codes a spatial stack actually hits, computed
  * per-coordinate with no external library (the reference delegates all
  * SRID reprojection to PostGIS — reference: src/index.ts:44 finalresult).
  *
  * Supported (all on the WGS84 ellipsoid/datum, so no datum shift applies):
  *  - 4326            WGS84 geographic lon/lat (degrees)
  *  - 32601…32660     WGS84 / UTM zones 1N…60N (transverse Mercator)
  *  - 32701…32760     WGS84 / UTM zones 1S…60S
  *  - 3857            spherical Web Mercator
  *  - 3395            WGS84 World Mercator (ellipsoidal)
  *
  * The transverse-Mercator forward/inverse are the standard Snyder series
  * ("Map Projections: A Working Manual", USGS PP 1395, eqs. 8-9…8-25) —
  * sub-millimeter within a UTM zone's extent, round-trip ≪ 1e-9°.
  * Transforms between two projected systems route through geographic
  * lon/lat (inverse then forward).
  */
object Crs {

  // WGS84 ellipsoid
  private val A = 6378137.0
  private val F = 1.0 / 298.257223563
  private val E2 = F * (2.0 - F)           // first eccentricity squared
  private val EP2 = E2 / (1.0 - E2)        // second eccentricity squared
  private val E = math.sqrt(E2)

  /** A projection: forward (lon/lat degrees → x/y) and inverse. */
  sealed trait Proj {
    def forward(lon: Double, lat: Double): (Double, Double)
    def inverse(x: Double, y: Double): (Double, Double)
  }

  /** Geographic lon/lat — identity (degrees in, degrees out). */
  case object LonLat extends Proj {
    def forward(lon: Double, lat: Double): (Double, Double) = (lon, lat)
    def inverse(x: Double, y: Double): (Double, Double) = (x, y)
  }

  /** Spherical Web Mercator (EPSG:3857). */
  case object WebMercator extends Proj {
    private val R = 6378137.0
    def forward(lon: Double, lat: Double): (Double, Double) =
      (R * math.toRadians(lon),
        R * math.log(math.tan(math.Pi / 4 + math.toRadians(lat) / 2)))
    def inverse(x: Double, y: Double): (Double, Double) =
      (math.toDegrees(x / R),
        math.toDegrees(2 * math.atan(math.exp(y / R)) - math.Pi / 2))
  }

  /** Ellipsoidal Mercator (EPSG:3395, WGS84 World Mercator). */
  case object WorldMercator extends Proj {
    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val esin = E * math.sin(phi)
      val y = A * math.log(math.tan(math.Pi / 4 + phi / 2) *
        math.pow((1 - esin) / (1 + esin), E / 2))
      (A * math.toRadians(lon), y)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val t = math.exp(-y / A)
      var phi = math.Pi / 2 - 2 * math.atan(t)
      var i = 0
      while (i < 8) { // converges quadratically; 8 is far past double precision
        val esin = E * math.sin(phi)
        phi = math.Pi / 2 - 2 * math.atan(t * math.pow((1 - esin) / (1 + esin), E / 2))
        i += 1
      }
      (math.toDegrees(x / A), math.toDegrees(phi))
    }
  }

  /** Ellipsoidal transverse Mercator (UTM parameterization): central
    * meridian `lon0` degrees, scale 0.9996, false easting 500 km, false
    * northing 10 000 km in the southern hemisphere. */
  final case class TransverseMercator(lon0: Double, falseNorthing: Double) extends Proj {
    private val k0 = 0.9996
    private val FE = 500000.0
    private val lam0 = math.toRadians(lon0)

    // meridional arc M(φ) and its series constants (Snyder 3-21)
    private val m0 = 1 - E2 / 4 - 3 * E2 * E2 / 64 - 5 * E2 * E2 * E2 / 256
    private val m2 = 3 * E2 / 8 + 3 * E2 * E2 / 32 + 45 * E2 * E2 * E2 / 1024
    private val m4 = 15 * E2 * E2 / 256 + 45 * E2 * E2 * E2 / 1024
    private val m6 = 35 * E2 * E2 * E2 / 3072
    private def arc(phi: Double): Double =
      A * (m0 * phi - m2 * math.sin(2 * phi) + m4 * math.sin(4 * phi) - m6 * math.sin(6 * phi))

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val lam = math.toRadians(lon)
      val sinP = math.sin(phi); val cosP = math.cos(phi); val tanP = math.tan(phi)
      val n = A / math.sqrt(1 - E2 * sinP * sinP)
      val t = tanP * tanP
      val c = EP2 * cosP * cosP
      val a1 = (lam - lam0) * cosP
      val a2 = a1 * a1; val a3 = a2 * a1; val a4 = a2 * a2; val a5 = a4 * a1; val a6 = a3 * a3
      val x = FE + k0 * n * (a1 + (1 - t + c) * a3 / 6 +
        (5 - 18 * t + t * t + 72 * c - 58 * EP2) * a5 / 120)
      val y = falseNorthing + k0 * (arc(phi) + n * tanP * (a2 / 2 +
        (5 - t + 9 * c + 4 * c * c) * a4 / 24 +
        (61 - 58 * t + t * t + 600 * c - 330 * EP2) * a6 / 720))
      (x, y)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val m = (y - falseNorthing) / k0
      val mu = m / (A * m0)
      val e1 = (1 - math.sqrt(1 - E2)) / (1 + math.sqrt(1 - E2))
      val phi1 = mu +
        (3 * e1 / 2 - 27 * e1 * e1 * e1 / 32) * math.sin(2 * mu) +
        (21 * e1 * e1 / 16 - 55 * e1 * e1 * e1 * e1 / 32) * math.sin(4 * mu) +
        (151 * e1 * e1 * e1 / 96) * math.sin(6 * mu) +
        (1097 * e1 * e1 * e1 * e1 / 512) * math.sin(8 * mu)
      val sinP = math.sin(phi1); val cosP = math.cos(phi1); val tanP = math.tan(phi1)
      val c1 = EP2 * cosP * cosP
      val t1 = tanP * tanP
      val n1 = A / math.sqrt(1 - E2 * sinP * sinP)
      val r1 = A * (1 - E2) / math.pow(1 - E2 * sinP * sinP, 1.5)
      val d = (x - FE) / (n1 * k0)
      val d2 = d * d; val d3 = d2 * d; val d4 = d2 * d2; val d5 = d4 * d; val d6 = d3 * d3
      val phi = phi1 - (n1 * tanP / r1) * (d2 / 2 -
        (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * EP2) * d4 / 24 +
        (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * EP2 - 3 * c1 * c1) * d6 / 720)
      val lam = lam0 + (d - (1 + 2 * t1 + c1) * d3 / 6 +
        (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * EP2 + 24 * t1 * t1) * d5 / 120) / cosP
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** The projection for an EPSG code, when supported. */
  def forSrid(srid: Int): Option[Proj] = srid match {
    case 4326 => Some(LonLat)
    case 3857 => Some(WebMercator)
    case 3395 => Some(WorldMercator)
    case z if z >= 32601 && z <= 32660 => Some(TransverseMercator((z - 32600) * 6 - 183, 0.0))
    case z if z >= 32701 && z <= 32760 => Some(TransverseMercator((z - 32700) * 6 - 183, 10000000.0))
    case _ => None
  }

  /** lon/lat-routed point transform between two supported EPSG codes. */
  def transform(srcSrid: Int, dstSrid: Int): Option[(Double, Double) => (Double, Double)] =
    for (src <- forSrid(srcSrid); dst <- forSrid(dstSrid)) yield { (x: Double, y: Double) =>
      val (lon, lat) = src.inverse(x, y)
      dst.forward(lon, lat)
    }
}
