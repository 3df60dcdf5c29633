package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Engine-portable polynomial string hash as a native expression:
  * `h = (h*31 + codePoint(c)) mod 1e9+7` over the string's code points.
  *
  * Exactly the fold of the Column-API HOF form
  * (`aggregate(filter(split(s,'')), 0L, (a,c) => (a*31+ascii(c))%p)`) and
  * of the DuckDB oracle
  * (`list_reduce(list_prepend(0, list_transform(string_split(s,''),
  * ascii)), …)`) — all three agree on ASCII/BMP input, which is the
  * corpus contract. Native because (a) the SQL registry can't inject
  * Column-combinator trees, and (b) one generated loop beats four
  * nested HOF lambdas per row.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"poly_hash expects a string input, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    PolyHash.compute(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $s = $c.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $h = ($h * 31L + $cp) % 1000000007L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "poly_hash"
}

object PolyHash {

  def compute(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

  def apply(s: Column): Column = GraftShims.column(PolyHash(GraftShims.expression(s)))
}
