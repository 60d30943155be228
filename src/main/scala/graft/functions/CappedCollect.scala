package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded posting-list buffer for [[CappedCollect]]: collects longs
  * until one past `cap`, then flips to OVERFLOWED and stores nothing
  * further — the state is ≤ cap+1 longs per group NO MATTER the
  * group's row count, which is what lets a df-ceiling posting-list
  * candidate generator run as ONE aggregation instead of a
  * count-census + join + collect chain (the census existed only to
  * keep a corpus-common key from materializing its full posting list
  * in the collect's unbounded buffer; the cap enforces that bound
  * inside the aggregate itself, map-side partials included). */
final class CappedLongList(val cap: Int) extends Serializable {
  private[functions] var vs = new Array[Long](math.min(cap + 1, 8))
  private[functions] var n = 0
  private[functions] var overflowed = false

  def add(v: Long): Unit = {
    if (overflowed) return
    if (n > cap - 1) { overflowed = true; vs = null; return }
    if (n == vs.length)
      vs = java.util.Arrays.copyOf(vs, math.min(vs.length * 2, cap + 1))
    vs(n) = v
    n += 1
  }

  def merge(other: CappedLongList): Unit = {
    if (overflowed) return
    if (other.overflowed || n + other.n > cap) {
      overflowed = true; vs = null; return
    }
    if (n + other.n > vs.length)
      vs = java.util.Arrays.copyOf(vs, math.min(cap + 1,
        math.max(vs.length * 2, n + other.n)))
    System.arraycopy(other.vs, 0, vs, n, other.n)
    n += other.n
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(overflowed)
    if (!overflowed) {
      out.writeInt(n)
      var i = 0
      while (i < n) { out.writeLong(vs(i)); i += 1 }
    }
    out.flush()
    bos.toByteArray
  }
}

object CappedLongList {
  def deserialize(bytes: Array[Byte], cap: Int): CappedLongList = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val l = new CappedLongList(cap)
    if (in.readBoolean()) { l.overflowed = true; l.vs = null }
    else {
      val n = in.readInt()
      var i = 0
      while (i < n) { l.add(in.readLong()); i += 1 }
    }
    l
  }
}

/** `capped_collect(col, cap)` -> ARRAY<BIGINT> | NULL: collect_list
  * over an integral column that gives up — returning NULL — the
  * moment the group exceeds `cap` values, with the partial-aggregate
  * state bounded at cap+1 longs. NULLs in the input are skipped (the
  * collect_list convention). Element order is ARRIVAL order (merge
  * order of partials): callers must treat the array as a SET — the
  * intended consumer is posting-list pair expansion, whose unordered
  * x<y pairs are order-invariant. */
case class CappedCollect(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CappedLongList] with UnaryLike[Expression] {

  require(cap >= 1, s"capped_collect cap must be >= 1, got $cap")

  override def prettyName: String = "capped_collect"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"capped_collect requires an integral argument, got $other")
  }

  override def createAggregationBuffer(): CappedLongList = new CappedLongList(cap)

  override def update(buffer: CappedLongList, input: InternalRow): CappedLongList = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Number].longValue())
    buffer
  }

  override def merge(buffer: CappedLongList, other: CappedLongList): CappedLongList = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: CappedLongList): Any =
    if (buffer.overflowed) null
    else new GenericArrayData(java.util.Arrays.copyOf(buffer.vs, buffer.n))

  override def serialize(buffer: CappedLongList): Array[Byte] = buffer.serialize()

  override def deserialize(bytes: Array[Byte]): CappedLongList =
    CappedLongList.deserialize(bytes, cap)

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollect =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollect =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): CappedCollect =
    copy(child = newChild)
}
