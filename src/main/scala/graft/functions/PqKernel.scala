package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused native kernels for the IVF-PQ serving path (optimization
  * round 16, guide §1.2 "per-task work" + §7.3 "driver planning").
  *
  * The composed-builtin formulation of ivfPqTopK built, per row, 16
  * subspace slices, 16 sliced norms, 16 argmax-of-8-literal-struct
  * assignments and 16 8-entry ADC tables out of ~7,000 Catalyst
  * expression nodes carrying 128 literal centroid arrays. The VALUES
  * were right and the per-row arithmetic codegen'd — but every
  * DataFrame transformation downstream re-analyzed that whole tree,
  * and at nSub=16 the measured sf0.1 cost of sim_topk_ivf_pq was
  * ~1.5-1.9 s of pure driver-side plan construction/analysis per run
  * (PqPhaseProfile: build 3.8 s of the 5.5 s median, of which training
  * is only ~0.4 s), before any task ran.
  *
  * These three expressions compute the identical values in ONE tree
  * node each. Arithmetic is the same audited chain (VecCodec: toFix12
  * per-product rounding, exact long accumulation with the BigDecimal
  * overflow fallback, round4 HALF_UP cosines) and the assignment
  * semantics mirror `greatest(centroidStructsOn(...))` exactly: null
  * cosine (zero norm on either side) loses to any value, ties resolve
  * to the smallest cid, an all-null row lands in the smallest cid.
  * Bit-parity with the composed form is locked in SimilaritySpec and
  * by the sim_* oracle gate keys (hash compare at sf0.001/sf0.01).
  *
  * Model state (the trained books) rides on the expression as plain
  * constructor data — one reference object in generated code — instead
  * of 128 array literals in the tree.
  */
object PqKernel {

  /** [cellCid, code_0 .. code_{nSub-1}] per row (all cids as longs). */
  def codes(emb: Column, coarse: Seq[(Long, Array[Double])],
      subs: Seq[Seq[(Long, Array[Double])]]): Column =
    ColumnBridge.column(PqCodes(ColumnBridge.expression(emb),
      coarse.map { case (cid, ce) => (cid, ce.toSeq) },
      subs.map(_.map { case (cid, ce) => (cid, ce.toSeq) })))

  /** ADC tables: adc(m)(i) = exact-decimal dot of subspace-m slice
    * against sub-centroid i (book order) — the dotLit(pe_m, ce) values. */
  def adcTables(emb: Column,
      subs: Seq[Seq[(Long, Array[Double])]]): Column =
    ColumnBridge.column(PqAdcTables(ColumnBridge.expression(emb),
      subs.map(_.map { case (cid, ce) => (cid, ce.toSeq) })))

  /** Top-`nProbe` coarse cells by (cosine desc, cid asc), null
    * cosines last — the sort_array(centroidStructs, desc).take(nProbe)
    * values. */
  def probeCells(emb: Column, coarse: Seq[(Long, Array[Double])],
      nProbe: Int): Column =
    ColumnBridge.column(IvfProbeCells(ColumnBridge.expression(emb),
      coarse.map { case (cid, ce) => (cid, ce.toSeq) }, nProbe))

  private[functions] def checkEmb(dt: DataType): Option[Boolean] = dt match {
    case ArrayType(FloatType, _) => Some(true)
    case ArrayType(DoubleType, _) => Some(false)
    case _ => None
  }

  /** Assignment for one group over a slice [off, off+len) of the row
    * vector: the greatest(struct(cs, -cid)) chain. `cents` carry
    * (cid, centroid, centroidNorm). Returns the winning cid. */
  private[functions] def assignSlice(a: ArrayData, aFloat: Boolean,
      off: Int, len: Int,
      cents: Array[(Long, Array[Double], Double)]): Long = {
    val sn = math.sqrt(VecCodec.dotDecSliceSelf(a, aFloat, off, len))
    var bestCid = cents(0)._1 // all-null: smallest cid (cents ascend)
    var bestCs = 0.0
    var hasBest = false
    var ci = 0
    while (ci < cents.length) {
      val (cid, ce, cn) = cents(ci)
      if (cn != 0.0 && sn != 0.0) {
        val cs = VecCodec.round4(
          VecCodec.dotDecSliceConst(a, aFloat, off, ce) / (cn * sn))
        if (!hasBest || cs > bestCs) { hasBest = true; bestCs = cs; bestCid = cid }
      }
      ci += 1
    }
    bestCid
  }
}

/** See [[PqKernel.codes]]. Output: array<long> of length 1 + nSub. */
case class PqCodes(child: Expression,
    coarse: Seq[(Long, Seq[Double])],
    subs: Seq[Seq[(Long, Seq[Double])]]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_codes"
  override def toString: String = s"pq_codes($child)"
  override protected def stringArgs: Iterator[Any] = Iterator(child)

  override def checkInputDataTypes(): TypeCheckResult =
    PqKernel.checkEmb(child.dataType) match {
      case Some(_) => TypeCheckResult.TypeCheckSuccess
      case None => TypeCheckResult.TypeCheckFailure(
        s"pq_codes requires array<float|double>, got ${child.dataType}")
    }

  @transient private lazy val aFloat = PqKernel.checkEmb(child.dataType).get
  @transient private lazy val coarseArr: Array[(Long, Array[Double], Double)] =
    coarse.map { case (cid, ce) =>
      val a = ce.toArray
      (cid, a, math.sqrt(VecCodec.dotDecConst(a, a)))
    }.toArray
  @transient private lazy val subArr: Array[Array[(Long, Array[Double], Double)]] =
    subs.map(_.map { case (cid, ce) =>
      val a = ce.toArray
      (cid, a, math.sqrt(VecCodec.dotDecConst(a, a)))
    }.toArray).toArray
  @transient private lazy val subDim = subs.head.head._2.length

  def evalRow(a: ArrayData): ArrayData = {
    val dim = a.numElements()
    val out = new Array[Long](1 + subArr.length)
    out(0) = PqKernel.assignSlice(a, aFloat, 0, dim, coarseArr)
    var m = 0
    while (m < subArr.length) {
      out(m + 1) = PqKernel.assignSlice(a, aFloat, m * subDim, subDim, subArr(m))
      m += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = evalRow(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodes", this, classOf[PqCodes].getName)
    defineCodeGen(ctx, ev, c => s"$ref.evalRow($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

/** See [[PqKernel.adcTables]]. Output: array<array<double>>. */
case class PqAdcTables(child: Expression,
    subs: Seq[Seq[(Long, Seq[Double])]]) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_adc_tables"
  override def toString: String = s"pq_adc_tables($child)"
  override protected def stringArgs: Iterator[Any] = Iterator(child)

  override def checkInputDataTypes(): TypeCheckResult =
    PqKernel.checkEmb(child.dataType) match {
      case Some(_) => TypeCheckResult.TypeCheckSuccess
      case None => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_tables requires array<float|double>, got ${child.dataType}")
    }

  @transient private lazy val aFloat = PqKernel.checkEmb(child.dataType).get
  @transient private lazy val subArr: Array[Array[Array[Double]]] =
    subs.map(_.map(_._2.toArray).toArray).toArray
  @transient private lazy val subDim = subs.head.head._2.length

  def evalRow(a: ArrayData): ArrayData = {
    val tables = new Array[Any](subArr.length)
    var m = 0
    while (m < subArr.length) {
      val book = subArr(m)
      val t = new Array[Double](book.length)
      var i = 0
      while (i < book.length) {
        t(i) = VecCodec.dotDecSliceConst(a, aFloat, m * subDim, book(i))
        i += 1
      }
      tables(m) = new GenericArrayData(t)
      m += 1
    }
    new GenericArrayData(tables)
  }

  override def nullSafeEval(v: Any): Any = evalRow(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdcTables].getName)
    defineCodeGen(ctx, ev, c => s"$ref.evalRow($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcTables =
    copy(child = newChild)
}

/** See [[PqKernel.probeCells]]. Output: array<long> of length nProbe. */
case class IvfProbeCells(child: Expression,
    coarse: Seq[(Long, Seq[Double])], nProbe: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ivf_probe_cells"
  override def toString: String = s"ivf_probe_cells($child, $nProbe)"
  override protected def stringArgs: Iterator[Any] = Iterator(child, nProbe)

  override def checkInputDataTypes(): TypeCheckResult =
    PqKernel.checkEmb(child.dataType) match {
      case Some(_) if nProbe >= 1 && nProbe <= coarse.size =>
        TypeCheckResult.TypeCheckSuccess
      case Some(_) => TypeCheckResult.TypeCheckFailure(
        s"ivf_probe_cells: nProbe $nProbe out of range 1..${coarse.size}")
      case None => TypeCheckResult.TypeCheckFailure(
        s"ivf_probe_cells requires array<float|double>, got ${child.dataType}")
    }

  @transient private lazy val aFloat = PqKernel.checkEmb(child.dataType).get
  @transient private lazy val coarseArr: Array[(Long, Array[Double], Double)] =
    coarse.map { case (cid, ce) =>
      val a = ce.toArray
      (cid, a, math.sqrt(VecCodec.dotDecConst(a, a)))
    }.toArray

  def evalRow(a: ArrayData): ArrayData = {
    val dim = a.numElements()
    val sn = math.sqrt(VecCodec.dotDecSliceSelf(a, aFloat, 0, dim))
    // (hasCs, cs, cid) per centroid, then the sort_array(desc) order:
    // cs desc with nulls LAST, ties (and among nulls) cid asc
    val k = coarseArr.length
    val cs = new Array[Double](k)
    val has = new Array[Boolean](k)
    var ci = 0
    while (ci < k) {
      val (_, ce, cn) = coarseArr(ci)
      if (cn != 0.0 && sn != 0.0) {
        cs(ci) = VecCodec.round4(
          VecCodec.dotDecSliceConst(a, aFloat, 0, ce) / (cn * sn))
        has(ci) = true
      }
      ci += 1
    }
    val idx = (0 until k).sortWith { (i, j) =>
      if (has(i) && has(j)) {
        if (cs(i) != cs(j)) cs(i) > cs(j)
        else coarseArr(i)._1 < coarseArr(j)._1
      } else if (has(i) != has(j)) has(i)
      else coarseArr(i)._1 < coarseArr(j)._1
    }
    new GenericArrayData(idx.take(nProbe).map(i => coarseArr(i)._1).toArray)
  }

  override def nullSafeEval(v: Any): Any = evalRow(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("probeCells", this, classOf[IvfProbeCells].getName)
    defineCodeGen(ctx, ev, c => s"$ref.evalRow($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): IvfProbeCells =
    copy(child = newChild)
}
