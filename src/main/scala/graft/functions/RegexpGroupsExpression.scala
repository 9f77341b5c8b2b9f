package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All capture groups of one regex match in ONE pass — the kernel behind
  * `IrcParser.parse` / `p1_regex_extract` (r21). The declarative form runs
  * `regexp_extract(line, pat, i)` once per group, and each call is a FULL
  * regex match of the same pattern over the same line — the 5-group message
  * parse paid five matches per line (three in the parse→stream path). This
  * expression runs the match once and returns `array<string>` of all
  * capture groups, with `regexp_extract`'s exact per-group semantics:
  * first-match (`find()`), unmatched optional group → "", no match at all →
  * all-"" (regexp_extract returns "" for both cases). Callers read groups
  * with `element_at(g, i)` — group i at array position i, 1-based, exactly
  * regexp_extract's numbering.
  *
  * The pattern must be a literal (compiled once per expression instance,
  * like Spark's own RegExpExtract when the pattern is foldable).
  * CodegenFallback, like [[CharEntropySum]]: the regex engine dominates the
  * row cost; what matters is running it once, not inlining the call.
  *
  * NULL contract: null line → null array (standard null propagation), same
  * as regexp_extract's null → null.
  */
case class RegexpGroups(subject: Expression, regexp: Expression)
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = subject
  override def right: Expression = regexp

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "regexp_groups"

  // enforce the documented literal-pattern contract at analysis time (r21
  // ADVICE #3, mirroring Spark's RegExpExtractBase): a non-foldable or null
  // regexp would otherwise NPE (or compile nonsense) at first row evaluation
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (subject.dataType != StringType || regexp.dataType != StringType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string operands, got " +
          s"${subject.dataType.simpleString} and ${regexp.dataType.simpleString}")
    } else if (!regexp.foldable || regexp.eval() == null) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a non-null literal pattern " +
          "(it is compiled once per expression instance)")
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }
  }

  @transient private lazy val pattern: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(
      regexp.eval(null).asInstanceOf[UTF8String].toString)

  override def nullSafeEval(s: Any, r: Any): Any = {
    val m = pattern.matcher(s.asInstanceOf[UTF8String].toString)
    val n = m.groupCount()
    val out = new Array[Any](n)
    if (m.find()) {
      var i = 0
      while (i < n) {
        val g = m.group(i + 1)
        out(i) = UTF8String.fromString(if (g == null) "" else g)
        i += 1
      }
    } else {
      var i = 0
      while (i < n) { out(i) = UTF8String.fromString(""); i += 1 }
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(subject = newLeft, regexp = newRight)
}
