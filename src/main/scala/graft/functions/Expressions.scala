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

object GraftFunctions {
  import org.apache.spark.sql.graftbridge.Bridge
  def extract_text(c: Column): Column = Bridge.column(ExtractText(Bridge.expression(c)))
  def fingerprint64(c: Column): Column = Bridge.column(Fingerprint64(Bridge.expression(c)))

  /** Register for SQL use in an existing session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "extract_text", exprs => ExtractText(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fingerprint64", exprs => Fingerprint64(exprs.head), "scala_udf")
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
  }
}
