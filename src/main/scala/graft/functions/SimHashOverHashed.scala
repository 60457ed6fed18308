package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The full `bits`-bit SimHash signature over a hashed-token array in
  * ONE primitive loop — value-identical (HashingSpec-pinned) to the
  * composable form the DuckDB twin still uses:
  *
  * {{{
  *   sum over j of: CASE WHEN aggregate(hsh, 0L,
  *     (acc, h) -> acc + IF(((h >> j) & 1) = 1, 1, -1)) >= 0
  *   THEN 1 << j ELSE 0 END
  * }}}
  *
  * which evaluates `bits` separate higher-order folds per row (64 for
  * the production signature). Edge semantics preserved exactly: an
  * EMPTY array leaves every bit-count at 0, and 0 >= 0 sets the bit —
  * the all-ones signature; a NULL element falls through the comparison
  * to the `otherwise(-1)` branch, contributing -1 to EVERY bit; a NULL
  * array yields a NULL signature (null-intolerant unary). */
case class SimHashOverHashed(child: Expression, bits: Int)
    extends UnaryExpression {

  require(bits > 0 && bits <= 64, s"bits out of range: $bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected array<bigint> input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    SimHashOverHashed.sig(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHashOverHashed.sig($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashOverHashed {

  def apply(c: org.apache.spark.sql.Column, bits: Int)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftShim.column(
      new SimHashOverHashed(org.apache.spark.sql.GraftShim.expression(c), bits))

  /** One pass: per element update all bit counts, then assemble the
    * signature from the sign of each count. */
  def sig(hashed: ArrayData, bits: Int): Long = {
    val counts = new Array[Int](bits)
    val n = hashed.numElements()
    var i = 0
    while (i < n) {
      if (hashed.isNullAt(i)) {
        // null element: the composable form's `when` comparison is null,
        // so it takes the -1 branch for every bit
        var j = 0
        while (j < bits) { counts(j) -= 1; j += 1 }
      } else {
        val h = hashed.getLong(i)
        var j = 0
        while (j < bits) {
          counts(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (counts(j) >= 0) out |= 1L << j
      j += 1
    }
    out
  }
}
