package graft.sources.mongo

import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets.UTF_8

/** The SCRAM client against the published RFC vectors — the proofs and
  * signatures are pinned byte-for-byte, so the Hi/HMAC/H plumbing cannot
  * drift from the specs it claims to implement. */
class ScramSpec extends AnyFunSuite {

  private val b64e = java.util.Base64.getEncoder
  private val b64d = java.util.Base64.getDecoder

  test("RFC 5802 SCRAM-SHA-1 worked example (low-level math)") {
    // user=user pass=pencil — the RFC feeds the raw password to Hi
    // (MongoDB's SHA-1 md5 derivation is layered on top, tested below)
    val salt = b64d.decode("QSXCR+Q6sek8bf92")
    val salted = Scram.hi(Scram.Sha1, "pencil".getBytes(UTF_8), salt, 4096)
    val clientKey = Scram.hmac(Scram.Sha1, salted, "Client Key".getBytes(UTF_8))
    val storedKey = Scram.h(Scram.Sha1, clientKey)
    val authMessage = ("n=user,r=fyko+d2lbbFgONRv9qkxdawL," +
      "r=fyko+d2lbbFgONRv9qkxdawL3rfcNHYJY1ZVvWVs7j,s=QSXCR+Q6sek8bf92,i=4096," +
      "c=biws,r=fyko+d2lbbFgONRv9qkxdawL3rfcNHYJY1ZVvWVs7j").getBytes(UTF_8)
    val clientSig = Scram.hmac(Scram.Sha1, storedKey, authMessage)
    val proof = clientKey.zip(clientSig).map { case (a, b) => (a ^ b).toByte }
    assert(b64e.encodeToString(proof) == "v0X8v3Bz2T0CJGbJQyF0X+HI4Ts=")
    val serverKey = Scram.hmac(Scram.Sha1, salted, "Server Key".getBytes(UTF_8))
    val serverSig = Scram.hmac(Scram.Sha1, serverKey, authMessage)
    assert(b64e.encodeToString(serverSig) == "rmF9pqV8S7suAoZWja4dJRkFsKQ=")
  }

  test("RFC 7677 SCRAM-SHA-256 worked example (full ClientSession)") {
    // SASLprep("pencil") is identity, so the session reproduces the RFC
    // conversation exactly
    val s = new Scram.ClientSession(Scram.Sha256, "user", "pencil", "rOprNGfwEbeRWgbNEkqO")
    assert(s.clientFirstMessage == "n,,n=user,r=rOprNGfwEbeRWgbNEkqO")
    val serverFirst = "r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0," +
      "s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096"
    val clientFinal = s.clientFinal(serverFirst)
    assert(clientFinal == "c=biws,r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0," +
      "p=dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ=")
    s.verifyServerFinal("v=6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4=")
    // a flipped signature byte MUST be refused (mutual auth)
    intercept[SecurityException] {
      val s2 = new Scram.ClientSession(Scram.Sha256, "user", "pencil", "rOprNGfwEbeRWgbNEkqO")
      s2.clientFinal(serverFirst)
      s2.verifyServerFinal("v=7rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4=")
    }
    // an e= error attribute is surfaced, not treated as a signature
    intercept[SecurityException] {
      val s3 = new Scram.ClientSession(Scram.Sha256, "user", "pencil", "rOprNGfwEbeRWgbNEkqO")
      s3.clientFinal(serverFirst)
      s3.verifyServerFinal("e=other-error")
    }
  }

  test("MongoDB SCRAM-SHA-1 salts hex(md5(user:mongo:password)), not the password") {
    // independent derivation of the md5 step
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest("user:mongo:pencil".getBytes(UTF_8)).map(b => f"$b%02x").mkString
    val salt = b64d.decode("QSXCR+Q6sek8bf92")
    val viaMongo = Scram.saltedPassword(Scram.Sha1, "user", "pencil", salt, 4096)
    val direct = Scram.hi(Scram.Sha1, md5hex.getBytes(UTF_8), salt, 4096)
    assert(viaMongo.sameElements(direct))
    // and it differs from the RFC's raw-password derivation
    assert(!viaMongo.sameElements(Scram.hi(Scram.Sha1, "pencil".getBytes(UTF_8), salt, 4096)))
  }

  test("Hi matches the JDK PBKDF2 implementation (independent cross-check)") {
    val salt = b64d.decode("W22ZaJ0SNY7soEsUEjb6gQ==")
    val mine = Scram.hi(Scram.Sha256, "pencil".getBytes(UTF_8), salt, 4096)
    val skf = javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
    val jdk = skf.generateSecret(new javax.crypto.spec.PBEKeySpec(
      "pencil".toCharArray, salt, 4096, 256)).getEncoded
    assert(mine.sameElements(jdk))
  }

  test("an unsupported mandatory extension fails the exchange (RFC 5802 m=)") {
    intercept[SecurityException] {
      new Scram.ClientSession(Scram.Sha256, "user", "pencil", "cnonce")
        .clientFinal("m=ext,r=cnonceXYZ,s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096")
    }
  }

  test("downgrade and replay defenses") {
    val s = new Scram.ClientSession(Scram.Sha256, "user", "pencil", "cnonce")
    // iteration count below 4096 = downgrade attempt
    intercept[IllegalArgumentException] {
      s.clientFinal("r=cnonceXYZ,s=W22ZaJ0SNY7soEsUEjb6gQ==,i=1")
    }
    // server nonce must EXTEND the client nonce
    intercept[IllegalArgumentException] {
      new Scram.ClientSession(Scram.Sha256, "user", "pencil", "cnonce")
        .clientFinal("r=stranger,s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096")
    }
    intercept[IllegalArgumentException] { // equal = no server entropy
      new Scram.ClientSession(Scram.Sha256, "user", "pencil", "cnonce")
        .clientFinal("r=cnonce,s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096")
    }
  }

  test("username escaping and SASLprep") {
    assert(Scram.escapeUsername("a=b,c") == "a=3Db=2Cc")
    assert(new Scram.ClientSession(Scram.Sha256, "a,b", "x", "n").clientFirstBare
      == "n=a=2Cb,r=n")
    // printable ASCII passes through
    assert(Scram.saslPrep("pencil!@# $%") == "pencil!@# $%")
    // non-ASCII space maps to space; soft hyphen maps to nothing
    assert(Scram.saslPrep("I X") == "I X")
    assert(Scram.saslPrep("I­X") == "IX")
    // NFKC: U+2168 ROMAN NUMERAL NINE → IX (the RFC 4013 example)
    assert(Scram.saslPrep("Ⅸ") == "IX")
    // prohibited output is refused, not silently dropped
    intercept[IllegalArgumentException](Scram.saslPrep("ab"))   // control
    intercept[IllegalArgumentException](Scram.saslPrep("ab"))   // private use
    intercept[IllegalArgumentException](Scram.saslPrep("a﷐b"))   // non-character
  }
}
