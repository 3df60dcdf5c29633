package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** [[PolyHash]] of every k-token sliding gram, straight from the TOKEN
  * ARRAY — one generated loop per document, no gram strings ever
  * materialized.
  *
  * Value contract: element i equals `PolyHash(tok[i] ' ' … tok[i+k-1])`
  * — the single-space join is folded as code point 32 between tokens,
  * so the output is bit-equal to hashing `concat_ws(" ", …)` grams (the
  * `shinglesFromTokens` → `polyHash` composition, and the DuckDB
  * oracle's `tk[i] || ' ' || …` form). Documents shorter than k tokens
  * yield an empty array (the downstream explode drops them, exactly as
  * the empty gram list did).
  *
  * Why native: the Column-API formulation builds every gram STRING
  * through an interpreted `transform` + `concat_ws` before the (already
  * native) hash even runs — per-element lambda dispatch plus one string
  * allocation per gram, measured as the dominant cost of the portable
  * MinHash path (~4 s of a 5 s signature pass at sf0.1). Duplicate
  * grams are NOT removed here: every consumer takes per-document MINS
  * of the hashes, and min over a multiset equals min over its set, so
  * the distinct the string form applied was semantically inert.
  *
  * A null token element contributes nothing — neither chars nor a
  * separator slot — exactly `concat_ws`'s null handling, so the
  * bit-equality holds even for caller-supplied arrays with nulls
  * ([[graft.ops.TextAnalysis.tokens]] itself never produces one).
  */
case class PolyGramHashes(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"poly_gram_hashes needs k >= 1, got $k")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"poly_gram_hashes expects array<string> input, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = math.max(0, n - k + 1)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0L
      var wrote = false
      var j = 0
      while (j < k) {
        // concat_ws semantics exactly: a null element contributes
        // NOTHING — neither its chars nor a separator slot
        if (!arr.isNullAt(i + j)) {
          if (wrote) h = (h * 31L + 32L) % 1000000007L
          wrote = true
          val s = arr.getUTF8String(i + j).toString
          var ci = 0
          while (ci < s.length) {
            val cp = s.codePointAt(ci)
            h = (h * 31L + cp) % 1000000007L
            ci += Character.charCount(cp)
          }
        }
        j += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val s = ctx.freshName("s")
      val ci = ctx.freshName("ci")
      val cp = ctx.freshName("cp")
      val wrote = ctx.freshName("wrote")
      s"""
         |int $n = $c.numElements();
         |int $m = $n - ${k - 1}; if ($m < 0) $m = 0;
         |long[] $out = new long[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  long $h = 0L;
         |  boolean $wrote = false;
         |  for (int $j = 0; $j < $k; $j++) {
         |    if (!$c.isNullAt($i + $j)) {
         |      if ($wrote) $h = ($h * 31L + 32L) % 1000000007L;
         |      $wrote = true;
         |      java.lang.String $s = $c.getUTF8String($i + $j).toString();
         |      int $ci = 0;
         |      while ($ci < $s.length()) {
         |        int $cp = $s.codePointAt($ci);
         |        $h = ($h * 31L + $cp) % 1000000007L;
         |        $ci += java.lang.Character.charCount($cp);
         |      }
         |    }
         |  }
         |  $out[$i] = $h;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "poly_gram_hashes"
}

object PolyGramHashes {
  def apply(toks: Column, k: Int): Column =
    GraftShims.column(PolyGramHashes(GraftShims.expression(toks), k))
}
