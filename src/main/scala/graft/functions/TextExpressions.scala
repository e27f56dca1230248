package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types._

/** Catalyst expressions over [[TextOps]] kernels (same codegen-friendly
  * dispatch as the ST_* expressions). */

case class MinhashSignature(first: Expression, second: Expression, third: Expression)
    extends GeoTernary("TextOps.minhashSignature", Seq(StringType, IntegerType, IntegerType),
      ArrayType(LongType, containsNull = false)) {
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

case class JaccardShingles(first: Expression, second: Expression, third: Expression)
    extends GeoTernary("TextOps.jaccardShingles", Seq(StringType, StringType, IntegerType), DoubleType) {
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

case class SortedShingles(left: Expression, right: Expression)
    extends GeoBinary("TextOps.sortedShingles", Seq(StringType, IntegerType),
      ArrayType(LongType, containsNull = false)) {
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

// containsNull relaxed to true: file sources force nullable array
// elements on read (asNullable), and the frozen minhash index feeds these
// two kernels from parquet — the writer guarantees no null elements ever
// exist, the nullable declaration only placates the analyzer's cast check
case class ContainmentSorted(left: Expression, right: Expression)
    extends GeoBinary("TextOps.containmentSorted",
      Seq(ArrayType(LongType), ArrayType(LongType)), DoubleType) { // see JaccardSorted note
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

case class JaccardSorted(left: Expression, right: Expression)
    extends GeoBinary("TextOps.jaccardSorted",
      Seq(ArrayType(LongType), ArrayType(LongType)), DoubleType) {
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

case class MinhashBandHashes(left: Expression, right: Expression)
    extends GeoBinary("TextOps.minhashBandHashes",
      Seq(ArrayType(LongType, containsNull = false), IntegerType),
      ArrayType(LongType, containsNull = false)) {
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

case class SigMatchFraction(left: Expression, right: Expression)
    extends GeoBinary("TextOps.sigMatchFraction",
      Seq(ArrayType(LongType), ArrayType(LongType)), DoubleType) { // see JaccardSorted note
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

case class SigPrefix(left: Expression, right: Expression)
    extends GeoBinary("TextOps.sigPrefix",
      Seq(ArrayType(LongType, containsNull = false), IntegerType),
      ArrayType(IntegerType, containsNull = false)) {
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

case class SigMatchFractionInt(left: Expression, right: Expression)
    extends GeoBinary("TextOps.sigMatchFractionInt",
      Seq(ArrayType(IntegerType, containsNull = false), ArrayType(IntegerType, containsNull = false)), DoubleType) {
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

case class Simhash64(child: Expression)
    extends GeoUnary("TextOps.simhash64", StringType, LongType) {
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

case class RollingFingerprint(left: Expression, right: Expression)
    extends GeoBinary("TextOps.rollingFingerprint", Seq(StringType, IntegerType), StringType) {
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

case class RollingFingerprintFast(left: Expression, right: Expression)
    extends GeoBinary("TextOps.rollingFingerprintFast", Seq(StringType, IntegerType), StringType) {
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

case class WordWindowHashes(left: Expression, right: Expression)
    extends GeoBinary("TextOps.wordWindowHashes",
      Seq(ArrayType(StringType), IntegerType),
      ArrayType(LongType, containsNull = false)) {
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

case class NfcNormalize(child: Expression)
    extends GeoUnary("TextOps.nfcNormalize", StringType, StringType) {
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

case class NfkcNormalize(child: Expression)
    extends GeoUnary("TextOps.nfkcNormalize", StringType, StringType) {
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

case class LangId(child: Expression)
    extends GeoUnary("TextOps.langId", StringType, StringType) {
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

case class LangIdNb(child: Expression)
    extends GeoUnary("TextOps.langIdNb", StringType, StringType) {
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

case class DupLineFraction(child: Expression)
    extends GeoUnary("TextOps.dupLineFraction", StringType, DoubleType) {
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

case class TopTokenFraction(child: Expression)
    extends GeoUnary("TextOps.topTokenFraction", StringType, DoubleType) {
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

case class CosineSimilarity(left: Expression, right: Expression)
    extends GeoBinary("TextOps.cosineSimilarity",
      Seq(ArrayType(FloatType), ArrayType(FloatType)), DoubleType) {
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

case class HyperplaneBucket(left: Expression, right: Expression)
    extends GeoBinary("TextOps.hyperplaneBucket",
      Seq(ArrayType(FloatType), IntegerType), IntegerType) {
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

case class HyperplaneBuckets(first: Expression, second: Expression, third: Expression)
    extends GeoTernary("TextOps.hyperplaneBuckets",
      Seq(ArrayType(FloatType), IntegerType, IntegerType),
      ArrayType(IntegerType, containsNull = false)) {
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

/** PSL registered-domain of a bare host (see [[PublicSuffix]]): the
  * suffix-list lookup stays codegen'd — the compiled [[PslMatcher]] is
  * attached to the generated class via addReferenceObj, so a deployment
  * passing the full current PSL pays no per-row indirection beyond two
  * hash probes per host label. Returns "" for "no registrable domain"
  * (empty/malformed host or the host IS a public suffix); the Column
  * wrapper ([[graft.operators.TextAnalysis.urlDomain]]) NULLIFs that. */
case class RegisteredDomain(child: Expression,
                            matcher: PslMatcher = PublicSuffix.default)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: org.apache.spark.sql.types.DataType = StringType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() =
    GeoKernel.check(prettyName, Seq(StringType), children)
  override def nullSafeEval(input: Any): Any =
    PublicSuffix.registeredDomainWith(matcher,
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val m = ctx.addReferenceObj("pslMatcher", matcher, "graft.functions.PslMatcher")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PublicSuffix.registeredDomainWith($m, $c)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
