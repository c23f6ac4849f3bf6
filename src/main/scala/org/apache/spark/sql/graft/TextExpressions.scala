// Hosted inside the org.apache.spark.sql package scope — same rationale as
// VectorExpressions: native Expressions need private[sql] API surface.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the repo-convention rolling text hash
  * `h = (h*31 + codepoint) mod 1e9+7`, folded left-to-right over the
  * string's characters.
  *
  * The composed form — `aggregate(filter(split(c, ""), _ =!= ""), 0L,
  * (h, ch) => pmod(h*31 + ascii(ch), P))` — is a higher-order expression
  * chain that Spark evaluates INTERPRETED: per character it materializes a
  * one-char string, binds lambda variables, and tree-walks a pmod
  * expression. That chain sits under every token hash, which sits under
  * every shingle, which sits under the whole dedup family (d2/d3/d4/d5/
  * d7/d9) — the hottest scalar in the text tier. This expression is the
  * identical fold as one compiled loop.
  *
  * Parity notes: the old form's `ascii(one-char string)` is the char's
  * code point for everything in the BMP (and the DuckDB twin's `ascii` is
  * the code point outright), so this iterates CODE POINTS — bitwise-equal
  * results on BMP text, and aligned with the oracle beyond it. Empty and
  * null inputs behave exactly as before (0 and null).
  */
case class StringRollHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = LongType

  override def prettyName: String = "roll_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      h = (h * 31L + cp) % 1000000007L
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $s = $c.toString();
         |long $h = 0L;
         |for (int $i = 0; $i < $s.length(); ) {
         |  int $cp = $s.codePointAt($i);
         |  $i += java.lang.Character.charCount($cp);
         |  $h = ($h * 31L + $cp) % 1000000007L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): StringRollHash = copy(child = newChild)
}

object TextExpressions {
  /** Codegen'd rolling-hash column — drop-in for the HOF fold. */
  def rollHash(c: Column): Column =
    ExpressionUtils.column(StringRollHash(ExpressionUtils.expression(c)))

  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  val rollHashDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("roll_hash"),
    new ExpressionInfo(classOf[StringRollHash].getName, "roll_hash"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "roll_hash takes exactly 1 argument")
      StringRollHash(children.head)
    })
}
