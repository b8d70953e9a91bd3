package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Integer squared-L2 argmin over a driver-collected quantized centroid
  * table — [[NearestCellCos]]'s exact-integer sibling, used by the IVF-PQ
  * coarse assign (q80) where vectors and centroids are 1e6-unit BIGINT
  * coordinate arrays and distances are EXACT integers. Ties break to the
  * lowest cell id, matching the former min_by/(d2, cell) ordering, so
  * results stay oracle-identical while the assignment runs as one fused
  * per-row loop in the scan — no candidate expansion, no aggregate, no
  * shuffle. */
case class NearestCellL2(child: Expression,
                         cells: Array[Long], cqas: Array[Array[Long]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_cell_l2 expects array<bigint>, got ${t.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_cell_l2"

  def compute(x: ArrayData): Long = {
    var bestCell = Long.MaxValue
    var bestD2 = Long.MaxValue
    var c = 0
    while (c < cqas.length) {
      val cent = cqas(c)
      val n = math.min(x.numElements(), cent.length)
      var acc = 0L
      var i = 0
      while (i < n) {
        val dd = x.getLong(i) - cent(i)
        acc += dd * dd
        i += 1
      }
      if (acc < bestD2 || (acc == bestD2 && cells(c) < bestCell)) {
        bestD2 = acc
        bestCell = cells(c)
      }
      c += 1
    }
    bestCell
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCellL2", this,
      classOf[NearestCellL2].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellL2 =
    copy(child = newChild)
}

object NearestCellL2 {
  import org.apache.spark.sql.graft.ColumnBridge
  def column(qa: Column, cells: Array[Long],
             cqas: Array[Array[Long]]): Column =
    ColumnBridge.column(
      NearestCellL2(ColumnBridge.expression(qa), cells, cqas))
}
