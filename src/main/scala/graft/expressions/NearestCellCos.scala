package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StructField, StructType}

/** Argmax-cosine coarse-quantizer assignment as ONE native expression over
  * a driver-collected centroid table (SURVEY.md §4.3; the VERDICT r4
  * "better still" upgrade over the min_by aggregate): instead of
  * expanding every vector into C broadcast-join candidate rows and
  * collapsing them again, the whole argmax runs inside the scan's
  * whole-stage-codegen pipeline — no join, no aggregate, no shuffle, no
  * per-candidate row materialization. The centroid matrix (C ≈ √n rows:
  * ~3e4 × 64 doubles ≈ 15 MB at n = 1e9) ships to executors once via the
  * expression's reference object — the same O(√n) driver/executor
  * footprint the broadcast join had.
  *
  * Semantics are IDENTICAL to the former row_number()/max_by pick, so the
  * DuckDB oracle (which still scores the cross join) hash-matches:
  *   dot   = Σ_i floor(emb[i]·cent[i]·1e9 + 0.5)   (exact BIGINT)
  *   ccos  = dot / sqrt((nq · cnq) as double)        (one IEEE divide)
  *   winner = max by (ccos, -cell)                   (cell ids unique)
  * The embedding side is array<float> (the corpus layout); centroids are
  * doubles (k-means means are rebuilt from integer sums — q61).
  */
case class NearestCellCos(emb: Expression, nq: Expression,
                          cells: Array[Long], cents: Array[Array[Double]],
                          cnqs: Array[Long]) extends Expression {

  override def children: Seq[Expression] = Seq(emb, nq)
  override def nullable: Boolean = emb.nullable || nq.nullable
  override def dataType: DataType = StructType(Seq(
    StructField("cell", LongType, nullable = false),
    StructField("ccos", DoubleType, nullable = false)))
  override def prettyName: String = "nearest_cell_cos"

  override def checkInputDataTypes(): TypeCheckResult =
    if (emb.dataType == ArrayType(FloatType, containsNull = true) ||
        emb.dataType == ArrayType(FloatType, containsNull = false))
      if (nq.dataType == LongType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"nearest_cell_cos norm must be bigint, got ${nq.dataType.catalogString}")
    else TypeCheckResult.TypeCheckFailure(
      s"nearest_cell_cos expects array<float>, got ${emb.dataType.catalogString}")

  /** The fused scan loop: C × D quantized products, running (ccos, -cell)
    * max. Called from both interpreted eval and generated code. */
  def compute(x: ArrayData, nqv: Long): InternalRow = {
    var bestCell = Long.MaxValue
    var bestCos = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val n = math.min(x.numElements(), cent.length)
      var acc = 0L
      var i = 0
      while (i < n) {
        acc += math.floor(x.getFloat(i).toDouble * cent(i) * 1e9 + 0.5).toLong
        i += 1
      }
      val ccos = acc.toDouble / math.sqrt((nqv * cnqs(c)).toDouble)
      if (ccos > bestCos || (ccos == bestCos && cells(c) < bestCell)) {
        bestCos = ccos
        bestCell = cells(c)
      }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestCell, bestCos))
  }

  override def eval(input: InternalRow): Any = {
    val e = emb.eval(input)
    if (e == null) return null
    val n = nq.eval(input)
    if (n == null) return null
    compute(e.asInstanceOf[ArrayData], n.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the centroid scan is a plain Scala method on the expression object;
    // generated code calls through a reference obj, staying inside the
    // whole-stage pipeline (no interpreted-projection fallback)
    val ref = ctx.addReferenceObj("nearestCellCos", this,
      classOf[NearestCellCos].getName)
    val embCode = emb.genCode(ctx)
    val nqCode = nq.genCode(ctx)
    val row = classOf[InternalRow].getName
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(code =
      code"""
         |${embCode.code}
         |${nqCode.code}
         |boolean ${ev.isNull} = ${embCode.isNull} || ${nqCode.isNull};
         |$row ${ev.value} = null;
         |if (!${ev.isNull}) {
         |  ${ev.value} = ($row) $ref.compute(${embCode.value}, ${nqCode.value});
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NearestCellCos =
    copy(emb = newChildren(0), nq = newChildren(1))
}

object NearestCellCos {
  import org.apache.spark.sql.graft.ColumnBridge
  /** Wrap as a Column (classic-runtime bridge). */
  def column(emb: Column, nq: Column,
             cells: Array[Long], cents: Array[Array[Double]],
             cnqs: Array[Long]): Column =
    ColumnBridge.column(NearestCellCos(
      ColumnBridge.expression(emb), ColumnBridge.expression(nq),
      cells, cents, cnqs))
}
