package graft.geo

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests: every codec must round-trip arbitrary geometries.
  * (Raw scalacheck Gen sampling; scalatestplus is not on the classpath.) */
class GeomPropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))

  private val coord: Gen[(Double, Double)] = for {
    // plausible projected/geographic magnitudes, 6-decimal grid to keep
    // text codecs exact
    x <- Gen.chooseNum(-180000000L, 180000000L).map(_ / 1e6)
    y <- Gen.chooseNum(-90000000L, 90000000L).map(_ / 1e6)
  } yield (x, y)

  private def mkPoint(xy: (Double, Double)) = GeomSerde.point(xy._1, xy._2)

  private val lineGen = Gen.nonEmptyListOf(coord).suchThat(_.size >= 2).map { cs =>
    GeomSerde.factory.createLineString(
      cs.map { case (x, y) => new org.locationtech.jts.geom.Coordinate(x, y) }.toArray)
  }

  private val boxGen = for {
    (x, y) <- coord
    w <- Gen.chooseNum(1, 1000000).map(_ / 1e4)
    h <- Gen.chooseNum(1, 1000000).map(_ / 1e4)
  } yield GeomSerde.fromWkb(graft.functions.GeoOps.stMakeEnvelope(x, y, x + w, y + h))

  test("WKB round-trips points, lines, boxes") {
    forAll(coord) { xy =>
      val g = mkPoint(xy)
      assert(GeomSerde.fromWkb(GeomSerde.toWkb(g)).equalsExact(g))
    }
    forAll(lineGen) { l =>
      assert(GeomSerde.fromWkb(GeomSerde.toWkb(l)).equalsExact(l))
    }
    forAll(boxGen) { b =>
      assert(GeomSerde.fromWkb(GeomSerde.toWkb(b)).equalsExact(b))
    }
  }

  test("WKT round-trips (shortest-repr doubles)") {
    forAll(coord) { xy =>
      val g = mkPoint(xy)
      assert(GeomSerde.fromWkt(GeomSerde.toWkt(g)).equalsExact(g))
    }
    forAll(lineGen) { l =>
      assert(GeomSerde.fromWkt(GeomSerde.toWkt(l)).equalsExact(l))
    }
  }

  test("GeoJSON round-trips") {
    forAll(coord) { xy =>
      val g = mkPoint(xy)
      assert(GeoJson.parse(GeoJson.write(g)).equalsExact(g))
    }
    forAll(boxGen) { b =>
      assert(GeoJson.parse(GeoJson.write(b)).equalsExact(b))
    }
  }

  test("grid cells always cover the envelope; cell id consistent") {
    import graft.functions.GeoOps
    // cell ≥ 0.5 keeps worst-case cover (100-unit box) under the
    // MaxCellsPerGeometry guard — oversized covers are a hard error now
    forAll(boxGen, Gen.chooseNum(5, 100).map(_ / 10.0)) { (b, cell) =>
      val wkb = GeomSerde.toWkb(b)
      val cells = GeoOps.gridCells(wkb, 0.0, cell).toLongArray().toSet
      val env = b.getEnvelopeInternal
      // every corner's cell is among the covering cells
      for ((x, y) <- Seq((env.getMinX, env.getMinY), (env.getMaxX, env.getMinY),
                         (env.getMinX, env.getMaxY), (env.getMaxX, env.getMaxY))) {
        assert(cells.contains(GeoOps.gridCellId(x, y, cell)))
      }
    }
  }

  test("minhash estimate tracks exact jaccard") {
    import graft.functions.TextOps
    import org.apache.spark.unsafe.types.UTF8String
    val words = Gen.listOfN(60, Gen.oneOf("spark", "scala", "query", "data", "join",
      "table", "row", "hash", "scan", "agg")).map(_.mkString(" "))
    forAll(words, words) { (a, b) =>
      val ua = UTF8String.fromString(a)
      val ub = UTF8String.fromString(b)
      val exact = TextOps.jaccardShingles(ua, ub, 5)
      val sa = TextOps.minhashSignature(ua, 5, 256).toLongArray()
      val sb = TextOps.minhashSignature(ub, 5, 256).toLongArray()
      val est = sa.zip(sb).count { case (x, y) => x == y } / 256.0
      assert(math.abs(est - exact) < 0.2) // 256 hashes → σ ≈ 0.031, 6σ bound
    }
  }
}
