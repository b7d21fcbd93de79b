package graft.functions

import graft.analysis.Analyzer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the StandardAnalyzer chain:
  * `graft_terms(text)` returns the emitted terms as `array<string>`.
  *
  * This is the codegen extension tier of the engine (SURVEY.md §4.3 item 5):
  * `doGenCode` emits a static call, so the expression stays INSIDE
  * whole-stage codegen (no interpreted fallback) — the Spark-native analog
  * of the reference's Analyzer being consumed by codegen'd consumers.
  * The heavy index build keeps its typed mapPartitions path (it needs
  * per-term positions and custom encoding); this expression serves SQL-side
  * consumers (quality metrics, ad-hoc tokenization) on the same chain.
  */
case class AnalyzeTerms(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_terms needs a string argument, got ${child.dataType}")
  }

  override def nullSafeEval(input: Any): Any =
    AnalyzeTerms.termsArray(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AnalyzeTerms.termsArray($c)")

  override protected def withNewChildInternal(newChild: Expression): AnalyzeTerms =
    copy(child = newChild)

  override def prettyName: String = "graft_terms"
}

object AnalyzeTerms {
  /** Static entry the generated code calls. */
  def termsArray(text: UTF8String): ArrayData = {
    val ts = Analyzer.terms(if (text == null) "" else text.toString)
    val out = new Array[AnyRef](ts.length)
    var i = 0
    while (i < ts.length) { out(i) = UTF8String.fromString(ts(i)); i += 1 }
    new GenericArrayData(out)
  }
}

/** SparkSessionExtensions hook: `spark.sql.extensions=graft.functions.GraftExtensions`
  * registers the engine's native functions at session build
  * (the public extension API, SparkSessionExtensions.injectFunction).
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.analyzeTerms)
  }
}

/** Runtime registration for an already-built session (same builder the
  * extension injects).
  */
object GraftFunctions {
  val analyzeTerms: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_terms"),
    new ExpressionInfo(classOf[AnalyzeTerms].getName, "graft_terms"),
    (args: Seq[Expression]) => {
      require(args.size == 1, "graft_terms(text)")
      AnalyzeTerms(args.head)
    })

  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = analyzeTerms
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
