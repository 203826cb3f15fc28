package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions for the two row-level functions hot enough to
 * matter at 100 TB — both implement `doGenCode` so they stay inside
 * whole-stage codegen spans (a ScalaUDF would break the span and pay
 * catalyst<->scala conversion per row).
 */

/** extract_text(html binary) -> string: the deterministic HTML->text
  * extraction (F10; semantics in graft.text.TextExtract — byte-identical
  * per url, the BASELINE.json per-row invariant). */
case class ExtractText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def checkInputDataTypes() = {
    if (child.dataType == BinaryType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"extract_text requires binary input, got ${child.dataType}")
  }
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(graft.text.TextExtract.extractText(v.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.text.TextExtract.extractText($c))")
  override protected def withNewChildInternal(newChild: Expression): ExtractText = copy(newChild)
  override def prettyName: String = "extract_text"
}

/** fingerprint64(text string) -> long: polynomial rolling hash mod 2^61-1
  * (graft.ops.TextStats.fingerprint64) — document fingerprinting without
  * breaking codegen. */
case class Fingerprint64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  def inputTypes: Seq[DataType] = Seq(StringType)
  override def checkInputDataTypes() = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"fingerprint64 requires string input, got ${child.dataType}")
  }
  override def nullSafeEval(v: Any): Any =
    graft.ops.TextStats.fingerprint64(v.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.TextStats.fingerprint64($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 = copy(newChild)
  override def prettyName: String = "fingerprint64"
}

/** cosine_sim(a array<float>, b array<float>) -> double: dot/(|a|*|b|) with
  * double accumulators in array-index order — bit-identical to the
  * zip_with+aggregate formulation and to the sequential twin, but codegen'd
  * (the HOF form is interpreted and dominates LSH verify passes that score
  * hundreds of thousands of candidate pairs). */
case class CosineSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() = {
    def ok(t: DataType) = t.isInstanceOf[ArrayType] &&
      t.asInstanceOf[ArrayType].elementType == FloatType
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires two array<float> inputs, got ${left.dataType}, ${right.dataType}")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CosineSim.compute($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "cosine_sim"
}

object CosineSim {
  /** Summation order per accumulator = array index order, double precision —
    * the same operand sequences as the HOF form, hence identical bits. */
  def compute(a: org.apache.spark.sql.catalyst.util.ArrayData,
              b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

object GraftFunctions {
  import org.apache.spark.sql.graftbridge.Bridge
  def extract_text(c: Column): Column = Bridge.column(ExtractText(Bridge.expression(c)))
  def fingerprint64(c: Column): Column = Bridge.column(Fingerprint64(Bridge.expression(c)))
  def cosine_sim(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))

  /** Register for SQL use in an existing session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "extract_text", exprs => ExtractText(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fingerprint64", exprs => Fingerprint64(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSim(exprs.head, exprs(1)), "scala_udf")
  }
}

/** SparkSessionExtensions hook:
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("extract_text"),
      new ExpressionInfo(classOf[ExtractText].getName, "extract_text"),
      (exprs: Seq[Expression]) => ExtractText(exprs.head)))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("fingerprint64"),
      new ExpressionInfo(classOf[Fingerprint64].getName, "fingerprint64"),
      (exprs: Seq[Expression]) => Fingerprint64(exprs.head)))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSim(exprs.head, exprs(1))))
  }
}
