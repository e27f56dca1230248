package graft.sources.mongo

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** SCRAM client (RFC 5802 / RFC 7677) for the MongoDB wire path — the
  * session-establishment layer the round-8 client documented as a cut.
  * The reference's `MongoClient` authenticates in-driver
  * (extension/mongodb/mongo_extension.ts:1 `MongoClient(url)` — a
  * `mongodb://user:pass@…` URL turns into a SCRAM conversation inside
  * the driver); this is the same conversation over [[MongoWire]]'s
  * OP_MSG frames, implemented against the public RFCs and the MongoDB
  * authentication spec:
  *
  *  - SCRAM-SHA-256: salted password = Hi(SASLprep(password), salt, i)
  *    (RFC 7677; SASLprep per RFC 4013).
  *  - SCRAM-SHA-1: MongoDB's legacy derivation — the "password" fed to
  *    Hi is hex(md5(user + ":mongo:" + password)) (the historic
  *    MONGODB-CR digest), not the raw password.
  *
  * Everything here is pure (no sockets): [[ClientSession]] produces and
  * consumes the three SCRAM messages; [[MongoWire]] moves them as
  * `saslStart`/`saslContinue` payloads. Server-final verification is
  * mandatory — a proxy that cannot produce `v=` proves it never knew the
  * password, and the client MUST refuse to proceed (mutual auth).
  */
object Scram {

  sealed abstract class Mechanism(val name: String, val hashAlg: String, val hmacAlg: String)
  case object Sha1 extends Mechanism("SCRAM-SHA-1", "SHA-1", "HmacSHA1")
  case object Sha256 extends Mechanism("SCRAM-SHA-256", "SHA-256", "HmacSHA256")

  def hmac(mech: Mechanism, key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val mac = Mac.getInstance(mech.hmacAlg)
    mac.init(new SecretKeySpec(key, mech.hmacAlg))
    mac.doFinal(data)
  }

  def h(mech: Mechanism, data: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance(mech.hashAlg).digest(data)

  /** Hi(str, salt, i) — PBKDF2 with the mechanism's HMAC (RFC 5802 §2.2),
    * implemented directly (U1 = HMAC(str, salt ∥ INT(1)); Un = HMAC(str,
    * Un−1); Hi = U1 ⊕ … ⊕ Ui) so the byte-level password input is exact —
    * `SecretKeyFactory`'s char[] API would re-encode it. */
  def hi(mech: Mechanism, password: Array[Byte], salt: Array[Byte], iterations: Int): Array[Byte] = {
    require(iterations >= 1, s"Hi needs a positive iteration count, got $iterations")
    val mac = Mac.getInstance(mech.hmacAlg)
    mac.init(new SecretKeySpec(password, mech.hmacAlg))
    mac.update(salt)
    mac.update(Array[Byte](0, 0, 0, 1))
    var u = mac.doFinal()
    val out = u.clone()
    var i = 1
    while (i < iterations) {
      u = hmac(mech, password, u)
      var j = 0
      while (j < out.length) { out(j) = (out(j) ^ u(j)).toByte; j += 1 }
      i += 1
    }
    out
  }

  /** MongoDB's per-mechanism salted-password derivation (auth spec):
    * SHA-1 hashes the historic `user:mongo:password` md5 first, SHA-256
    * SASLpreps the raw password. */
  def saltedPassword(mech: Mechanism, username: String, password: String,
                     salt: Array[Byte], iterations: Int): Array[Byte] = mech match {
    case Sha1 =>
      val md5 = MessageDigest.getInstance("MD5")
        .digest(s"$username:mongo:$password".getBytes(UTF_8))
      val hex = md5.map(b => f"$b%02x").mkString
      hi(mech, hex.getBytes(UTF_8), salt, iterations)
    case Sha256 =>
      hi(mech, saslPrep(password).getBytes(UTF_8), salt, iterations)
  }

  /** SASLprep (RFC 4013) over the stringprep framework: map non-ASCII
    * spaces to space and drop the map-to-nothing set, NFKC-normalize,
    * reject prohibited output (control / private-use / non-character /
    * surrogate / display-altering / tagging code points), enforce the
    * bidi constraint. Printable-ASCII passwords pass through untouched. */
  def saslPrep(s: String): String = {
    if (s.forall(c => c >= 0x20 && c < 0x7f)) return s
    val mapped = new StringBuilder
    s.foreach { c =>
      if (isNonAsciiSpace(c)) mapped.append(' ')
      else if (!isMapToNothing(c)) mapped.append(c)
    }
    val norm = java.text.Normalizer.normalize(mapped, java.text.Normalizer.Form.NFKC)
    var i = 0
    while (i < norm.length) {
      val cp = norm.codePointAt(i)
      require(!isProhibited(cp),
        f"SASLprep: prohibited code point U+$cp%04X in password")
      i += Character.charCount(cp)
    }
    // RFC 3454 §6: RandALCat and LCat cannot mix; RandALCat text must
    // both start and end RandALCat
    val dirs = norm.codePoints().toArray.map(Character.getDirectionality(_))
    val hasRal = dirs.exists(d => d == Character.DIRECTIONALITY_RIGHT_TO_LEFT ||
      d == Character.DIRECTIONALITY_RIGHT_TO_LEFT_ARABIC)
    if (hasRal) {
      val isRal = (d: Byte) => d == Character.DIRECTIONALITY_RIGHT_TO_LEFT ||
        d == Character.DIRECTIONALITY_RIGHT_TO_LEFT_ARABIC
      require(!dirs.exists(_ == Character.DIRECTIONALITY_LEFT_TO_RIGHT) &&
        isRal(dirs.head) && isRal(dirs.last),
        "SASLprep: bidirectional constraint violated")
    }
    norm
  }

  private def isNonAsciiSpace(c: Char): Boolean = // RFC 3454 C.1.2
    c == 0x00A0 || c == 0x1680 || (c >= 0x2000 && c <= 0x200A) ||
      c == 0x202F || c == 0x205F || c == 0x3000

  private def isMapToNothing(c: Char): Boolean = // RFC 3454 B.1
    c == 0x00AD || c == 0x034F || c == 0x1806 ||
      (c >= 0x180B && c <= 0x180D) || (c >= 0x200B && c <= 0x200D) ||
      c == 0x2060 || (c >= 0xFE00 && c <= 0xFE0F) || c == 0xFEFF

  private def isProhibited(cp: Int): Boolean =
    (cp <= 0x001F) || cp == 0x007F ||                          // C.2.1 ASCII control
      (cp >= 0x0080 && cp <= 0x009F) || cp == 0x06DD || cp == 0x070F || // C.2.2
      cp == 0x180E || cp == 0x200C || cp == 0x200D || cp == 0x2028 || cp == 0x2029 ||
      (cp >= 0x2060 && cp <= 0x2063) || (cp >= 0x206A && cp <= 0x206F) ||
      cp == 0xFEFF || (cp >= 0xFFF9 && cp <= 0xFFFD) ||
      (cp >= 0xE000 && cp <= 0xF8FF) ||                        // C.3 private use (BMP)
      (cp >= 0xF0000 && cp <= 0xFFFFD) || (cp >= 0x100000 && cp <= 0x10FFFD) ||
      (cp >= 0xFDD0 && cp <= 0xFDEF) || (cp & 0xFFFE) == 0xFFFE || // C.4 non-characters
      (cp >= 0xD800 && cp <= 0xDFFF) ||                        // C.5 surrogates
      cp == 0xFFFD ||                                          // C.6 inappropriate
      (cp >= 0x1D173 && cp <= 0x1D17A) ||                      // C.2.2 musical controls
      (cp >= 0x2FF0 && cp <= 0x2FFB) ||                        // C.7 ideographic description
      cp == 0x0340 || cp == 0x0341 || cp == 0x200E || cp == 0x200F ||
      (cp >= 0x202A && cp <= 0x202E) ||                        // C.8 change display
      cp == 0xE0001 || (cp >= 0xE0020 && cp <= 0xE007F)        // C.9 tagging

  /** `=` and `,` cannot appear raw in a SCRAM attribute value. */
  def escapeUsername(u: String): String =
    u.replace("=", "=3D").replace(",", "=2C")

  private val b64e = java.util.Base64.getEncoder
  private val b64d = java.util.Base64.getDecoder

  def freshNonce(): String = {
    val b = new Array[Byte](24)
    new java.security.SecureRandom().nextBytes(b)
    b64e.encodeToString(b)
  }

  /** One SCRAM conversation as a pure message transformer. Usage:
    * send [[clientFirstMessage]], feed the reply to [[clientFinal]],
    * send its message, feed the reply to [[verifyServerFinal]]. */
  final class ClientSession(val mechanism: Mechanism, username: String,
                            password: String, clientNonce: String) {
    val clientFirstBare: String = s"n=${escapeUsername(username)},r=$clientNonce"
    def clientFirstMessage: String = "n,," + clientFirstBare

    private var expectedServerSignature: Array[Byte] = _

    /** server-first (`r=…,s=…,i=…`) → client-final (`c=biws,r=…,p=…`). */
    def clientFinal(serverFirst: String): String = {
      val attrs = parseAttrs(serverFirst)
      // RFC 5802 §5.1: m= reserves mandatory extensions — a client that
      // does not understand one MUST fail the exchange, not ignore it
      attrs.get("m").foreach(m => throw new SecurityException(
        s"SCRAM: server demands unsupported mandatory extension m=$m"))
      val nonce = attrs.getOrElse("r",
        throw new IllegalArgumentException(s"SCRAM server-first lacks r=: $serverFirst"))
      require(nonce.startsWith(clientNonce) && nonce.length > clientNonce.length,
        "SCRAM: server nonce must extend the client nonce (replay defense)")
      val salt = b64d.decode(attrs.getOrElse("s",
        throw new IllegalArgumentException("SCRAM server-first lacks s=")))
      val iterations = attrs.getOrElse("i",
        throw new IllegalArgumentException("SCRAM server-first lacks i=")).toInt
      require(iterations >= 4096,
        s"SCRAM: iteration count $iterations below the RFC minimum (downgrade attempt?)")

      val salted = saltedPassword(mechanism, username, password, salt, iterations)
      val clientKey = hmac(mechanism, salted, "Client Key".getBytes(UTF_8))
      val storedKey = h(mechanism, clientKey)
      val withoutProof = s"c=biws,r=$nonce" // biws = base64("n,,")
      val authMessage =
        s"$clientFirstBare,$serverFirst,$withoutProof".getBytes(UTF_8)
      val clientSig = hmac(mechanism, storedKey, authMessage)
      val proof = clientKey.clone()
      var j = 0
      while (j < proof.length) { proof(j) = (proof(j) ^ clientSig(j)).toByte; j += 1 }
      val serverKey = hmac(mechanism, salted, "Server Key".getBytes(UTF_8))
      expectedServerSignature = hmac(mechanism, serverKey, authMessage)
      s"$withoutProof,p=${b64e.encodeToString(proof)}"
    }

    /** server-final (`v=…`) — MUST be checked (mutual authentication);
      * constant-time compare. */
    def verifyServerFinal(serverFinal: String): Unit = {
      require(expectedServerSignature != null, "SCRAM: clientFinal not yet produced")
      val attrs = parseAttrs(serverFinal)
      attrs.get("e").foreach(e =>
        throw new SecurityException(s"SCRAM server reported error: $e"))
      val v = attrs.getOrElse("v",
        throw new SecurityException(s"SCRAM server-final lacks v=: $serverFinal"))
      if (!MessageDigest.isEqual(b64d.decode(v), expectedServerSignature))
        throw new SecurityException(
          "SCRAM server signature mismatch — the server does not know the password")
    }
  }

  private def parseAttrs(msg: String): Map[String, String] =
    msg.split(",").iterator.filter(_.length >= 2).map { kv =>
      kv.substring(0, 1) -> (if (kv.length > 2 && kv.charAt(1) == '=') kv.substring(2) else "")
    }.toMap
}
