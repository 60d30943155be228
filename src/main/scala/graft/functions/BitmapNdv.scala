package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Exact distinct-value count of an integral ID-like column WITHOUT
  * exchanging the values — the ClickHouse `groupBitmap` / Druid
  * bitmap-NDV move, hand-rolled (zero dependencies) as a two-level
  * bitmap: values split into (v >>> 16, low 16 bits); each high key
  * owns a dense 8 KiB bitmap container.
  *
  * Why it exists: an exact `count(DISTINCT id)` over a mostly-unique
  * key is the worst case for the partial-aggregate shape — map-side
  * dedup removes nothing and the exchange carries EVERY value (r11:
  * 9.3 s of profile_events' 10.4 s at 100M events was the event_id
  * branch; a shuffle-first mapPartitions variant still paid 7.6 s, so
  * the exchange itself is the bill). A bitmap partial is bounded by
  * the VALUE RANGE the partition touches (8 KiB per 65,536-value
  * span), not its row count — sequentially-assigned IDs make partials
  * a few hundred KiB at any row count, and the merge is word-wise OR.
  * On a 1000-executor cluster the exchange drops from O(rows) to
  * O(partials x spans x 8 KiB) bytes.
  *
  * Bounds (documented contract, enforced loudly): memory per partial
  * is 8 KiB per touched 65,536-value span, capped at
  * [[NdvBitmap.MaxContainers]] spans (512 MiB — an ID space up to
  * ~4.3e9 dense values). A wider or adversarially sparse 64-bit
  * column (e.g. raw hashes) fails with a clear message directing the
  * caller to count(DISTINCT _)'s exchange shape — [[graft.ops.Profile]]
  * applies bitmap_ndv only to integral columns and documents the
  * trade. NULLs are skipped, exactly like count(DISTINCT).
  *
  * Runs as a [[TypedImperativeAggregate]] (ObjectHashAggregate): the
  * per-row update is one JVM call on an already-decoded long, with
  * the last-hit container memoized so runs of nearby IDs skip the
  * hash map. The non-codegen cost is irrelevant next to the exchange
  * it removes (measured: profile_events fell 10.4 s to ~2.5 s at 100M
  * events).
  */
final class NdvBitmap extends Serializable {

  import NdvBitmap._

  // open-addressed long->container table (power-of-two capacity,
  // linear probing, grow at 1/2 load). NOT java.util.HashMap: a
  // boxed java.lang.Long key allocates PER ROW once the last-hit memo
  // stops covering (random-order keys, e.g. a user_id column — r11:
  // the boxing regressed the sketch-merge exact referent it was meant
  // to speed up). vals(i) == null marks an empty slot; keys(i) is
  // meaningful only where vals(i) != null, so key 0 needs no sentinel.
  private var keys = new Array[Long](64)
  private var vals = new Array[Array[Long]](64)
  private var used = 0
  private var lastKey: Long = Long.MinValue
  private var lastC: Array[Long] = null

  private def slotOf(key: Long): Int = {
    val h = key * -7046029254386353131L // Fibonacci-style scramble
    var i = ((h ^ (h >>> 32)).toInt) & (keys.length - 1)
    while (vals(i) != null && keys(i) != key) i = (i + 1) & (keys.length - 1)
    i
  }

  private def grow(): Unit = {
    val ok = keys; val ov = vals
    keys = new Array[Long](ok.length << 1)
    vals = new Array[Array[Long]](ov.length << 1)
    var j = 0
    while (j < ok.length) {
      if (ov(j) != null) {
        val i = slotOf(ok(j))
        keys(i) = ok(j); vals(i) = ov(j)
      }
      j += 1
    }
  }

  /** Container for `key`, created if absent (loud past the cap). */
  private def containerFor(key: Long): Array[Long] = {
    var i = slotOf(key)
    if (vals(i) == null) {
      if (used >= MaxContainers)
        throw new IllegalStateException(
          s"bitmap_ndv: more than $MaxContainers distinct 65536-value " +
            "spans — the column's value range is too wide or sparse for " +
            "a bitmap profile; use count(DISTINCT col) for this column")
      if ((used + 1) * 2 > keys.length) { grow(); i = slotOf(key) }
      keys(i) = key
      vals(i) = new Array[Long](1024)
      used += 1
    }
    vals(i)
  }

  def add(v: Long): Unit = {
    val key = v >>> 16
    val low = (v & 0xFFFFL).toInt
    var c = if (key == lastKey) lastC else null
    if (c == null) {
      c = containerFor(key)
      lastKey = key
      lastC = c
    }
    c(low >>> 6) |= (1L << low)
  }

  def merge(other: NdvBitmap): Unit = {
    var j = 0
    while (j < other.vals.length) {
      val b = other.vals(j)
      if (b != null) {
        val mine = containerFor(other.keys(j))
        var i = 0
        while (i < 1024) { mine(i) |= b(i); i += 1 }
      }
      j += 1
    }
    lastKey = Long.MinValue
    lastC = null
  }

  def cardinality: Long = {
    var n = 0L
    var j = 0
    while (j < vals.length) {
      val bm = vals(j)
      if (bm != null) {
        var i = 0
        while (i < 1024) { n += java.lang.Long.bitCount(bm(i)); i += 1 }
      }
      j += 1
    }
    n
  }

  /** Wire form: container count, then per container key(8B) + a
    * sparse word list (word count, then (index: 2B, word: 8B) pairs) —
    * a partition that touched few values in a span ships only its
    * nonzero words, so partial size tracks touched values, not spans. */
  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(used)
    var j = 0
    while (j < vals.length) {
      val bm = vals(j)
      if (bm != null) {
        out.writeLong(keys(j))
        var nz = 0
        var i = 0
        while (i < 1024) { if (bm(i) != 0L) nz += 1; i += 1 }
        out.writeShort(nz)
        i = 0
        while (i < 1024) {
          if (bm(i) != 0L) { out.writeShort(i); out.writeLong(bm(i)) }
          i += 1
        }
      }
      j += 1
    }
    out.flush()
    bos.toByteArray
  }

  private[functions] def putWord(key: Long, idx: Int, word: Long): Unit = {
    val c = containerFor(key)
    c(idx) |= word
  }

  /** OR a SERIALIZED bitmap (the [[serialize]] wire form) into this
    * one without materializing a second NdvBitmap — the partial-merge
    * path of [[BitmapMergeNdv]], where inputs are pre-built partials
    * (one per upstream task), never per-row values. */
  def mergeBytes(bytes: Array[Byte]): Unit = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val key = in.readLong()
      var nz = in.readShort().toInt
      while (nz > 0) {
        val idx = in.readShort().toInt
        putWord(key, idx, in.readLong())
        nz -= 1
      }
      i += 1
    }
  }
}

object NdvBitmap {

  /** Worst-case memory cap: 65,536 containers x 8 KiB = 512 MiB per
    * partial — covers any ID space up to ~4.3e9 dense values. */
  val MaxContainers = 65536

  def deserialize(bytes: Array[Byte]): NdvBitmap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val bm = new NdvBitmap()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val key = in.readLong()
      var nz = in.readShort().toInt
      while (nz > 0) {
        val idx = in.readShort().toInt
        bm.putWord(key, idx, in.readLong())
        nz -= 1
      }
      i += 1
    }
    bm
  }
}

/** `bitmap_ndv(col)` -> BIGINT: exact count(DISTINCT col) for integral
  * columns via [[NdvBitmap]] partials. See the class doc for the
  * range/memory contract. */
case class BitmapNdv(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[NdvBitmap] with UnaryLike[Expression] {

  override def prettyName: String = "bitmap_ndv"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bitmap_ndv requires an integral argument, got $other")
  }

  override def createAggregationBuffer(): NdvBitmap = new NdvBitmap()

  override def update(buffer: NdvBitmap, input: InternalRow): NdvBitmap = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Number].longValue())
    buffer
  }

  override def merge(buffer: NdvBitmap, other: NdvBitmap): NdvBitmap = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: NdvBitmap): Any = buffer.cardinality

  override def serialize(buffer: NdvBitmap): Array[Byte] = buffer.serialize()

  override def deserialize(bytes: Array[Byte]): NdvBitmap =
    NdvBitmap.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapNdv =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BitmapNdv =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): BitmapNdv =
    copy(child = newChild)
}

/** `bitmap_merge_ndv(bin)` -> BIGINT: cardinality of the union of
  * SERIALIZED [[NdvBitmap]] partials (the [[NdvBitmap.serialize]] wire
  * form) — the re-aggregation half of a two-stage bitmap plan where an
  * upstream pass already built per-task bitmaps (e.g. the
  * dictionary-rollup kernel, graft.ops.DictRollup). Input row count is
  * the PARTIAL count (tasks x open groups), never the data row count,
  * so the per-row deserialize cost is state-scale. */
case class BitmapMergeNdv(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[NdvBitmap] with UnaryLike[Expression] {

  override def prettyName: String = "bitmap_merge_ndv"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bitmap_merge_ndv requires a binary serialized bitmap, got $other")
  }

  override def createAggregationBuffer(): NdvBitmap = new NdvBitmap()

  override def update(buffer: NdvBitmap, input: InternalRow): NdvBitmap = {
    val v = child.eval(input)
    if (v != null) buffer.mergeBytes(v.asInstanceOf[Array[Byte]])
    buffer
  }

  override def merge(buffer: NdvBitmap, other: NdvBitmap): NdvBitmap = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: NdvBitmap): Any = buffer.cardinality

  override def serialize(buffer: NdvBitmap): Array[Byte] = buffer.serialize()

  override def deserialize(bytes: Array[Byte]): NdvBitmap =
    NdvBitmap.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapMergeNdv =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BitmapMergeNdv =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): BitmapMergeNdv =
    copy(child = newChild)
}
