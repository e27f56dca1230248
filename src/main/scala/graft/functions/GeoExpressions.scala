package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

import java.lang.invoke.{MethodHandle, MethodHandles}

/** Native Catalyst expressions for the ST_* surface.
  *
  * Each expression delegates to a static kernel in [[GeoOps]]:
  *  - codegen emits a direct static call → the expression stays inside
  *    WholeStageCodegen (no UDF/serialization boundary);
  *  - interpreted eval goes through a cached MethodHandle.
  *
  * All are null-intolerant (SQL semantics: null in → null out).
  */
private[functions] object GeoKernel {
  private val lookup = MethodHandles.publicLookup()
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, MethodHandle]()

  def check(name: String, expected: Seq[org.apache.spark.sql.types.DataType],
            children: Seq[Expression]): TypeCheckResult = {
    val mismatch = expected.zip(children).zipWithIndex.collectFirst {
      case ((exp, child), i) if child.dataType != exp =>
        s"$name argument ${i + 1} expects ${exp.simpleString}, got ${child.dataType.simpleString}"
    }
    mismatch.map(TypeCheckResult.TypeCheckFailure).getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  def handle(method: String): MethodHandle =
    cache.computeIfAbsent(method, m => {
      val found = classOf[GeoOps.type].getMethods.filter(_.getName == m)
      require(found.length == 1, s"GeoOps.$m: expected exactly one overload, found ${found.length}")
      lookup.unreflect(found.head).bindTo(GeoOps)
    })
}

abstract class GeoUnary(method: String, inType: DataType, outType: DataType)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = outType
  override def checkInputDataTypes(): TypeCheckResult = GeoKernel.check(prettyName, Seq(inType), children)
  override def nullIntolerant: Boolean = true
  @transient private lazy val h = GeoKernel.handle(method)
  override def nullSafeEval(input: Any): Any = h.invokeWithArguments(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GeoOps.$method($c)")
}

abstract class GeoBinary(method: String, inTypes: Seq[DataType], outType: DataType)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = outType
  override def checkInputDataTypes(): TypeCheckResult = GeoKernel.check(prettyName, inTypes, children)
  override def nullIntolerant: Boolean = true
  @transient private lazy val h = GeoKernel.handle(method)
  override def nullSafeEval(a: Any, b: Any): Any = h.invokeWithArguments(a, b)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GeoOps.$method($a, $b)")
}

abstract class GeoTernary(method: String, inTypes: Seq[DataType], outType: DataType)
    extends TernaryExpression with Serializable {
  override def dataType: DataType = outType
  override def checkInputDataTypes(): TypeCheckResult = GeoKernel.check(prettyName, inTypes, children)
  override def nullIntolerant: Boolean = true
  @transient private lazy val h = GeoKernel.handle(method)
  override def nullSafeEval(a: Any, b: Any, c: Any): Any = h.invokeWithArguments(a, b, c)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) => s"graft.functions.GeoOps.$method($a, $b, $c)")
}

abstract class GeoQuaternary(method: String, inTypes: Seq[DataType], outType: DataType)
    extends QuaternaryExpression with Serializable {
  override def dataType: DataType = outType
  override def checkInputDataTypes(): TypeCheckResult = GeoKernel.check(prettyName, inTypes, children)
  override def nullIntolerant: Boolean = true
  @transient private lazy val h = GeoKernel.handle(method)
  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    h.invokeWithArguments(a, b, c, d)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) => s"graft.functions.GeoOps.$method($a, $b, $c, $d)")
}

// ---------------------------------------------------------------- constructors
case class StPoint(left: Expression, right: Expression)
    extends GeoBinary("stPoint", Seq(DoubleType, DoubleType), BinaryType) {
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}
case class StMakeEnvelope(first: Expression, second: Expression, third: Expression, fourth: Expression)
    extends GeoQuaternary("stMakeEnvelope", Seq(DoubleType, DoubleType, DoubleType, DoubleType), BinaryType) {
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression, d: Expression) =
    copy(a, b, c, d)
}
case class StGeomFromText(child: Expression) extends GeoUnary("stGeomFromText", StringType, BinaryType) {
  override protected def withNewChildInternal(c: Expression) = copy(c)
}
case class StGeomFromWKB(child: Expression) extends GeoUnary("stGeomFromWKB", BinaryType, BinaryType) {
  override protected def withNewChildInternal(c: Expression) = copy(c)
}
case class StGeomFromGeoJSON(child: Expression) extends GeoUnary("stGeomFromGeoJSON", StringType, BinaryType) {
  override protected def withNewChildInternal(c: Expression) = copy(c)
}
case class StGeomFromGML(child: Expression) extends GeoUnary("stGeomFromGML", StringType, BinaryType) {
  override protected def withNewChildInternal(c: Expression) = copy(c)
}
case class StGeomFromKML(child: Expression) extends GeoUnary("stGeomFromKML", StringType, BinaryType) {
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

// ---------------------------------------------------------------------- output
case class StAsText(child: Expression) extends GeoUnary("stAsText", BinaryType, StringType) {
  override protected def withNewChildInternal(c: Expression) = copy(c)
}
case class StAsGeoJSON(child: Expression) extends GeoUnary("stAsGeoJSON", BinaryType, StringType) {
  override protected def withNewChildInternal(c: Expression) = copy(c)
}
case class StAsBinary(child: Expression) extends GeoUnary("stAsBinary", BinaryType, BinaryType) {
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

// ------------------------------------------------------------------- accessors
case class StX(child: Expression) extends GeoUnary("stX", BinaryType, DoubleType) {
  override protected def withNewChildInternal(c: Expression) = copy(c)
}
case class StY(child: Expression) extends GeoUnary("stY", BinaryType, DoubleType) {
  override protected def withNewChildInternal(c: Expression) = copy(c)
}
case class StSrid(child: Expression) extends GeoUnary("stSrid", BinaryType, IntegerType) {
  override protected def withNewChildInternal(c: Expression) = copy(c)
}
case class StSetSrid(left: Expression, right: Expression)
    extends GeoBinary("stSetSrid", Seq(BinaryType, IntegerType), BinaryType) {
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}
case class StGeometryType(child: Expression) extends GeoUnary("stGeometryType", BinaryType, StringType) {
  override protected def withNewChildInternal(c: Expression) = copy(c)
}
case class StDimension(child: Expression) extends GeoUnary("stDimension", BinaryType, IntegerType) {
  override protected def withNewChildInternal(c: Expression) = copy(c)
}
case class StNumPoints(child: Expression) extends GeoUnary("stNumPoints", BinaryType, IntegerType) {
  override protected def withNewChildInternal(c: Expression) = copy(c)
}
case class StNumGeometries(child: Expression) extends GeoUnary("stNumGeometries", BinaryType, IntegerType) {
  override protected def withNewChildInternal(c: Expression) = copy(c)
}
case class StGeometryN(left: Expression, right: Expression)
    extends GeoBinary("stGeometryN", Seq(BinaryType, IntegerType), BinaryType) {
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}
case class StIsEmpty(child: Expression) extends GeoUnary("stIsEmpty", BinaryType, BooleanType) {
  override protected def withNewChildInternal(c: Expression) = copy(c)
}
case class StIsValid(child: Expression) extends GeoUnary("stIsValid", BinaryType, BooleanType) {
  override protected def withNewChildInternal(c: Expression) = copy(c)
}
case class StIsSimple(child: Expression) extends GeoUnary("stIsSimple", BinaryType, BooleanType) {
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

// -------------------------------------------------------------------- measures
case class StArea(child: Expression) extends GeoUnary("stArea", BinaryType, DoubleType) {
  override protected def withNewChildInternal(c: Expression) = copy(c)
}
case class StLength(child: Expression) extends GeoUnary("stLength", BinaryType, DoubleType) {
  override protected def withNewChildInternal(c: Expression) = copy(c)
}
case class StDistance(left: Expression, right: Expression)
    extends GeoBinary("stDistance", Seq(BinaryType, BinaryType), DoubleType) {
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}
case class StDWithin(first: Expression, second: Expression, third: Expression)
    extends GeoTernary("stDWithin", Seq(BinaryType, BinaryType, DoubleType), BooleanType) {
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

// ------------------------------------------------------------------ predicates
case class StWithin(left: Expression, right: Expression)
    extends GeoBinary("stWithin", Seq(BinaryType, BinaryType), BooleanType) {
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}
case class StContains(left: Expression, right: Expression)
    extends GeoBinary("stContains", Seq(BinaryType, BinaryType), BooleanType) {
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}
case class StIntersects(left: Expression, right: Expression)
    extends GeoBinary("stIntersects", Seq(BinaryType, BinaryType), BooleanType) {
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}
case class StDisjoint(left: Expression, right: Expression)
    extends GeoBinary("stDisjoint", Seq(BinaryType, BinaryType), BooleanType) {
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}
case class StTouches(left: Expression, right: Expression)
    extends GeoBinary("stTouches", Seq(BinaryType, BinaryType), BooleanType) {
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}
case class StOverlaps(left: Expression, right: Expression)
    extends GeoBinary("stOverlaps", Seq(BinaryType, BinaryType), BooleanType) {
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}
case class StCrosses(left: Expression, right: Expression)
    extends GeoBinary("stCrosses", Seq(BinaryType, BinaryType), BooleanType) {
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}
case class StEquals(left: Expression, right: Expression)
    extends GeoBinary("stEquals", Seq(BinaryType, BinaryType), BooleanType) {
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}
case class StCovers(left: Expression, right: Expression)
    extends GeoBinary("stCovers", Seq(BinaryType, BinaryType), BooleanType) {
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}
case class StCoveredBy(left: Expression, right: Expression)
    extends GeoBinary("stCoveredBy", Seq(BinaryType, BinaryType), BooleanType) {
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

// ----------------------------------------------------------------- geom → geom
case class StCentroid(child: Expression) extends GeoUnary("stCentroid", BinaryType, BinaryType) {
  override protected def withNewChildInternal(c: Expression) = copy(c)
}
case class StEnvelope(child: Expression) extends GeoUnary("stEnvelope", BinaryType, BinaryType) {
  override protected def withNewChildInternal(c: Expression) = copy(c)
}
case class StBoundary(child: Expression) extends GeoUnary("stBoundary", BinaryType, BinaryType) {
  override protected def withNewChildInternal(c: Expression) = copy(c)
}
case class StConvexHull(child: Expression) extends GeoUnary("stConvexHull", BinaryType, BinaryType) {
  override protected def withNewChildInternal(c: Expression) = copy(c)
}
case class StBuffer(left: Expression, right: Expression)
    extends GeoBinary("stBuffer", Seq(BinaryType, DoubleType), BinaryType) {
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}
case class StSimplify(left: Expression, right: Expression)
    extends GeoBinary("stSimplify", Seq(BinaryType, DoubleType), BinaryType) {
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}
case class StUnion(left: Expression, right: Expression)
    extends GeoBinary("stUnion", Seq(BinaryType, BinaryType), BinaryType) {
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}
case class StIntersection(left: Expression, right: Expression)
    extends GeoBinary("stIntersection", Seq(BinaryType, BinaryType), BinaryType) {
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}
case class StDifference(left: Expression, right: Expression)
    extends GeoBinary("stDifference", Seq(BinaryType, BinaryType), BinaryType) {
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}
case class StSymDifference(left: Expression, right: Expression)
    extends GeoBinary("stSymDifference", Seq(BinaryType, BinaryType), BinaryType) {
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}
