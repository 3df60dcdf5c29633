package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** HashingTF-exact term → feature index: `nonNegativeMod(
  * Murmur3.hashUnsafeBytes2(utf8, seed=42), dims)` — the same function
  * MLlib's `HashingTF` (hash version 2) applies during training, so a
  * model trained with MLlib scores identically through the scan-speed
  * path. NOT the same as SQL `hash()`: catalyst's Murmur3 uses
  * `hashUnsafeBytes` (tail bytes mixed one by one), HashingTF uses
  * `hashUnsafeBytes2` (tail mixed as a word) — they diverge on terms
  * whose UTF-8 length isn't a multiple of 4, which is why
  * [[graft.ops.QualityClassifier.scoreWithWeights]] needs this native
  * expression instead of `pmod(hash(t), dims)`.
  */
case class TermIndex(child: Expression, dims: Int) extends UnaryExpression {
  require(dims > 0, "dims must be positive")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"term_index expects a string input, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val u = v.asInstanceOf[UTF8String]
    val h = Murmur3_x86_32.hashUnsafeBytes2(u.getBaseObject, u.getBaseOffset, u.numBytes(), 42)
    ((h % dims) + dims) % dims
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val h = ctx.freshName("h")
      s"""
         |int $h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes2(
         |  $c.getBaseObject(), $c.getBaseOffset(), $c.numBytes(), 42);
         |${ev.value} = (($h % $dims) + $dims) % $dims;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "term_index"
}
