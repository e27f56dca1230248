package graft.sources.mongo

import org.scalatest.funsuite.AnyFunSuite

class BsonSpec extends AnyFunSuite {

  test("canonical bytes: the spec's {hello: world} example") {
    // bsonspec.org's worked example:
    // \x16\x00\x00\x00 \x02 hello\x00 \x06\x00\x00\x00 world\x00 \x00
    val expected = Array[Byte](
      0x16, 0, 0, 0, 0x02, 'h', 'e', 'l', 'l', 'o', 0,
      0x06, 0, 0, 0, 'w', 'o', 'r', 'l', 'd', 0, 0)
    assert(Bson.fromJson("""{"hello": "world"}""").toSeq == expected.toSeq)
  }

  test("round-trips every JSON shape the selector/feature model uses") {
    val json =
      """{"find":"coll","filter":{"$and":[{"properties.grp":{"$eq":"1"}},{"geometry.coordinates.0":{"$gte":10.5}}]},""" +
        """"n":3,"big":9999999999,"neg":-2,"ok":true,"nothing":null,""" +
        """"arr":[1,"two",{"three":3.5}],"empty":{}}"""
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    assert(mapper.readTree(Bson.toJson(Bson.fromJson(json))) == mapper.readTree(json))
  }

  test("int32 / int64 / double pick the right BSON element types") {
    def typeByteOf(json: String): Byte = Bson.fromJson(json)(4)
    assert(typeByteOf("""{"v": 3}""") == 0x10)          // int32
    assert(typeByteOf("""{"v": 9999999999}""") == 0x12) // int64
    assert(typeByteOf("""{"v": 1.5}""") == 0x01)        // double
    // longFields forces int64 for small values — a real mongod rejects
    // an int32 getMore cursor id ("expected type 'long'")
    assert(Bson.fromJson("""{"getMore": 3}""", Set("getMore"))(4) == 0x12)
  }

  test("decodes the non-JSON types a real server stamps (ObjectId, datetime)") {
    // hand-built document: {_id: ObjectId(00..0b), ts: datetime 1000}
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x07); out.write("_id".getBytes); out.write(0)
    (0 until 12).foreach(out.write)
    out.write(0x09); out.write("ts".getBytes); out.write(0)
    out.write(Array[Byte](-24, 3, 0, 0, 0, 0, 0, 0)) // 1000 LE
    val body = out.toByteArray
    val doc = java.nio.ByteBuffer.allocate(body.length + 5)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(body.length + 5).put(body).put(0.toByte).array()
    val json = Bson.toJson(doc)
    assert(json.contains("\"_id\":\"000102030405060708090a0b\""), json)
    assert(json.contains("\"ts\":1000"), json)
  }

  test("binaryFields encode base64 text as BSON binary subtype 0") {
    // {"payload": <3 bytes 01 02 03>} — SASL payloads travel as binary,
    // and JSON cannot express the distinction (the longFields analog)
    val b64 = java.util.Base64.getEncoder.encodeToString(Array[Byte](1, 2, 3))
    val doc = Bson.fromJson(s"""{"payload": "$b64"}""", binaryFields = Set("payload"))
    assert(doc(4) == 0x05, doc.toSeq)                   // binary element type
    assert(doc.slice(13, 18).toSeq == Seq[Byte](3, 0, 0, 0, 0), doc.toSeq) // len + subtype 0
    assert(doc.slice(18, 21).toSeq == Seq[Byte](1, 2, 3))
    // decode answers the same base64 text → lossless round trip
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    assert(mapper.readTree(Bson.toJson(doc)).path("payload").asText() == b64)
    // without the marker the same JSON stays a plain string
    assert(Bson.fromJson(s"""{"payload": "$b64"}""")(4) == 0x02)
  }

  test("property: random JSON trees round-trip through the hardened " +
      "walker (the bounds guards admit every honest document)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val scalar: Gen[String] = Gen.oneOf(
      Gen.chooseNum(-1000000, 1000000).map(_.toString),
      Gen.chooseNum(-10L << 40, 10L << 40).map(_.toString),
      Gen.chooseNum(-9999, 9999).map(n => s"$n.25"),
      Gen.oneOf("true", "false", "null"),
      Gen.listOfN(4, Gen.alphaNumChar).map(s => s""""${s.mkString}""""))
    def tree(depth: Int): Gen[String] =
      if (depth == 0) scalar
      else Gen.frequency(
        3 -> scalar,
        2 -> Gen.chooseNum(0, 4).flatMap(n =>
          Gen.listOfN(n, tree(depth - 1)).map(_.mkString("[", ",", "]"))),
        2 -> Gen.chooseNum(0, 4).flatMap(n =>
          Gen.listOfN(n, Gen.zip(Gen.listOfN(3, Gen.alphaLowerChar), tree(depth - 1)))
            .map(_.zipWithIndex.map { case ((k, v), i) =>
              s""""${k.mkString}$i": $v""" }.mkString("{", ",", "}"))))
    val docGen = Gen.chooseNum(0, 5).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.listOfN(3, Gen.alphaLowerChar), tree(2)))
        .map(_.zipWithIndex.map { case ((k, v), i) =>
          s""""${k.mkString}$i": $v""" }.mkString("{", ",", "}")))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    var seed = Seed(77L)
    for (_ <- 1 to 200) {
      docGen.apply(Gen.Parameters.default, seed).foreach { json =>
        assert(mapper.readTree(Bson.toJson(Bson.fromJson(json))) ==
          mapper.readTree(json), json)
      }
      seed = seed.next
    }
  }

  test("hostile wire bytes: lying document/string/binary lengths reject " +
      "loudly before allocating or silently truncating") {
    import java.nio.{ByteBuffer, ByteOrder}
    def le(bs: ByteBuffer => ByteBuffer, size: Int): Array[Byte] =
      bs(ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)).array()
    def bad(doc: Array[Byte], needle: String): Unit = {
      val e = intercept[IllegalArgumentException] { Bson.toJson(doc) }
      assert(e.getMessage.toLowerCase.contains(needle), e.getMessage)
    }
    val hello = Bson.fromJson("""{"hello": "world"}""") // 22 valid bytes

    // document length claims far more than the buffer holds
    bad(le(_.putInt(1000).put(hello.drop(4)), hello.length), "out of bounds")
    // document length below the 5-byte minimum (0, negative)
    bad(le(_.putInt(0).put(hello.drop(4)), hello.length), "out of bounds")
    bad(le(_.putInt(-22).put(hello.drop(4)), hello.length), "out of bounds")
    // document length landing mid-document such that the walk overruns
    // the declared end and the NEXT byte read happens to be the real
    // terminator 0x00: without the position==end check this parsed
    // "successfully" while desynced for any following document in the
    // same wire buffer — the in-range lie is the dangerous one.
    // len=11 puts the declared end exactly on the field name's 0x00.
    val short = hello.clone(); short(0) = 11
    bad(short, "desync")
    // len=5 (empty-doc claim on a non-empty doc) trips the terminator
    // check instead — still loud
    val five = hello.clone(); five(0) = 5
    bad(five, "must end")
    // string length lying long / zero (must include its terminator)
    val sLong = hello.clone(); sLong(11) = 100
    bad(sLong, "out of bounds")
    val sZero = hello.clone(); sZero(11) = 0
    bad(sZero, "out of bounds")
    // binary element with a ~2 GiB declared payload: reject, never
    // allocate; and a negative one
    // 14 bytes: len(4) type(1) name"b\0"(2) binLen(4) subtype(1)
    // payload(1) docTerm(1) — binLen lies about the single payload byte
    def binDoc(n: Int): Array[Byte] = le(_.putInt(14).put(0x05.toByte)
      .put('b'.toByte).put(0.toByte).putInt(n).put(0.toByte)
      .put(0x42.toByte).put(0.toByte), 14)
    bad(binDoc(Int.MaxValue - 8), "out of bounds")
    bad(binDoc(-4), "out of bounds")
    // a well-formed doc still parses after all the guards
    assert(Bson.toJson(hello).contains("world"))
  }

  test("unknown element types fail loudly instead of desyncing") {
    val doc = java.nio.ByteBuffer.allocate(11).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(11).put(0x7F.toByte).put('x'.toByte).put(0.toByte)
      .putInt(0).array()
    val e = intercept[IllegalArgumentException] { Bson.toJson(doc) }
    assert(e.getMessage.contains("0x7f"), e.getMessage)
  }

  test("hostile nesting rejects loudly at the depth cap instead of " +
      "StackOverflowError, both decode and encode") {
    // a wire document nesting one 0x03 element per level: each level is
    // len(4) + type(1) + name"a\0"(2) …body… + term(1). Build inside-out.
    def nest(levels: Int): Array[Byte] = {
      var doc = java.nio.ByteBuffer.allocate(5)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(5).put(0.toByte).array()
      for (_ <- 1 to levels) {
        val len = 4 + 1 + 2 + doc.length + 1
        doc = java.nio.ByteBuffer.allocate(len)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          .putInt(len).put(0x03.toByte).put('a'.toByte).put(0.toByte)
          .put(doc).put(0.toByte).array()
      }
      doc
    }
    // under the cap: parses fine (MongoDB's own limit is 100 — nothing a
    // real server emits comes near 256)
    assert(Bson.toJson(nest(100)).contains("{"))
    val e = intercept[IllegalArgumentException] { Bson.toJson(nest(300)) }
    assert(e.getMessage.contains("nesting"), e.getMessage)
    // encoder side: a hostile deep JSON tree rejects the same way
    val deepJson = "{\"a\":" * 300 + "1" + "}" * 300
    val enc = intercept[Exception] { Bson.fromJson(deepJson) }
    assert(enc.getMessage != null &&
      (enc.getMessage.contains("nesting") || enc.getMessage.contains("depth")),
      enc.getMessage)
    // and an in-bounds tree still encodes after the guard
    assert(Bson.toJson(Bson.fromJson("{\"a\":{\"b\":[1,2]}}")).contains("\"b\""))
  }
}
