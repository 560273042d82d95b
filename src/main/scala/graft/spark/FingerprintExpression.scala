package graft.spark

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst-native `doc_fingerprint(text STRING) → BIGINT`: the
  * Karp-Rabin min-sampled rolling-hash fingerprint as a FULLY
  * CODEGEN'D expression — `doGenCode` emits a direct static call, so
  * the hash participates in whole-stage codegen with no UDF
  * serialization boundary (the tier the builder guide prefers over
  * Scala UDFs for scalar functions; contrast ExtractText, whose
  * heavyweight kernel makes CodegenFallback the right call).
  */
case class DocFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"doc_fingerprint requires STRING input, got ${child.dataType.sql}")
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "doc_fingerprint"

  override def nullSafeEval(input: Any): Any =
    DocFingerprint.compute(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.spark.DocFingerprint.compute($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): DocFingerprint =
    copy(child = newChild)
}

object DocFingerprint {

  /** The kernel — identical math to the round-1 UDF (min-sampled
    * 16-char rolling FNV-style hash) so fingerprints are stable across
    * the API migration. */
  def compute(text: String): Long = {
    if (text == null || text.isEmpty) return 0L
    val B = 1099511628211L
    var h = 0xcbf29ce484222325L
    var minH = Long.MaxValue
    var pow = 1L
    val w = 16
    var k = 0
    while (k < w) { pow *= B; k += 1 }
    var i = 0
    while (i < text.length) {
      h = h * B + text.charAt(i)
      if (i >= w) h -= pow * text.charAt(i - w)
      if (i >= w - 1) {
        val mixed = h ^ (h >>> 33)
        if (mixed < minH) minH = mixed
      }
      i += 1
    }
    if (minH == Long.MaxValue) h else minH
  }

  /** Column-API entry. */
  def of(c: Column): Column =
    org.apache.spark.sql.GraftSqlShim.column(
      DocFingerprint(org.apache.spark.sql.GraftSqlShim.expression(c)))

  /** SQL registration: `SELECT doc_fingerprint(text) FROM docs`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "doc_fingerprint", exprs => DocFingerprint(exprs.head), "scala_udf")
}
