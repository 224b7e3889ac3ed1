package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `graft_topk(v, k)` — native bounded top-k aggregate: the k largest
  * doubles per group, returned as a descending-sorted array.
  *
  * Scale shape: each partial buffer is a SIZE-K MIN-HEAP (the heap root is
  * the smallest retained value, so an incoming value either displaces the
  * root in O(log k) or is rejected in O(1)). Partials merge heap-into-heap,
  * so the map-side combine ships at most k doubles per (partition, group) —
  * the sort-window formulation of group top-k sorts EVERY row of every
  * group through a per-group sort before discarding all but k. Planned as
  * ObjectHashAggregate with a compact serialized form (k doubles).
  *
  * Ties: values compare by value alone; equal doubles are interchangeable,
  * so the emitted (sorted) array is deterministic even under ties. NULL
  * inputs are skipped, mirroring SQL aggregate semantics. Doubles compare
  * in the java.lang.Double total order (NaN greatest), matching Spark's
  * sort-desc ranking of NaN above all values. */
case class TopKDoubles(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[java.lang.Double]] {

  require(k > 0, s"graft_topk: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_topk"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double argument, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): java.util.PriorityQueue[java.lang.Double] =
    new java.util.PriorityQueue[java.lang.Double](k + 1)

  private def offer(heap: java.util.PriorityQueue[java.lang.Double], d: Double): Unit = {
    if (heap.size < k) heap.add(d)
    else if (java.lang.Double.compare(heap.peek(), d) < 0) { heap.poll(); heap.add(d); () }
  }

  override def update(
      heap: java.util.PriorityQueue[java.lang.Double],
      input: InternalRow): java.util.PriorityQueue[java.lang.Double] = {
    val v = child.eval(input)
    if (v != null) offer(heap, v.asInstanceOf[Double])
    heap
  }

  override def merge(
      a: java.util.PriorityQueue[java.lang.Double],
      b: java.util.PriorityQueue[java.lang.Double]): java.util.PriorityQueue[java.lang.Double] = {
    val it = b.iterator()
    while (it.hasNext) offer(a, it.next())
    a
  }

  override def eval(heap: java.util.PriorityQueue[java.lang.Double]): Any = {
    // Non-destructive: window frames evaluate the same buffer once per
    // output row (UnboundedWindowFunctionFrame), so copy the heap out
    // instead of polling it empty (cf. Percentile/ApproximatePercentile).
    val arr = new Array[Double](heap.size)
    val it = heap.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr) // ascending, NaN last — total order
    var lo = 0
    var hi = arr.length - 1
    while (lo < hi) { val t = arr(lo); arr(lo) = arr(hi); arr(hi) = t; lo += 1; hi -= 1 }
    new GenericArrayData(arr)
  }

  override def serialize(heap: java.util.PriorityQueue[java.lang.Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * heap.size)
    bb.putInt(heap.size)
    val it = heap.iterator()
    while (it.hasNext) bb.putDouble(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[java.lang.Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val heap = createAggregationBuffer()
    var i = 0
    while (i < n) { heap.add(bb.getDouble); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKDoubles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKDoubles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKDoubles =
    copy(child = newChildren.head)
}

/** `graft_latest(struct)` — max over an orderable struct as a TYPED
  * IMPERATIVE aggregate, so the planner picks ObjectHashAggregate (a hash
  * map of per-key buffers) instead of the SortAggregate that Spark 4
  * forces on every declarative min/max with a var-length buffer
  * (struct/string/binary). For the latest-row-per-key shape that
  * difference is the whole story at scale: SortAggregate SORTS the full
  * input on both sides of the exchange (measured 7.7 GB of sort spill on
  * dv_sat_current's 60M-row history at the sf10/16 GiB stress run), while
  * the hash map does one insert per first-seen key and one struct compare
  * per repeat — and struct compares only happen on key collisions, so the
  * interpreted ordering is off the hot path.
  *
  * Ordering is Spark's own struct ordering (field by field, left to
  * right), identical to `max(struct(...))` — callers put the version
  * ordering prefix first and the payload after, exactly as
  * [[graft.dv.DvOps.latestRowsProjected]] documents. NULL structs are
  * skipped; an all-null group evaluates to NULL.
  *
  * Memory posture: the per-task map holds one compact UnsafeRow per
  * distinct key. Callers must size
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` to the
  * per-task key cardinality they can afford (the repo's session builders
  * use 1M ≈ a few hundred MB worst case per task); past the threshold the
  * operator falls back to sort-based aggregation for the remaining input —
  * the exact behavior SortAggregate has from row one, so the fallback is
  * never worse than the shape it replaces. */
case class MaxStruct(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.spark.sql.catalyst.expressions.UnsafeRow] {

  private def structType = child.dataType.asInstanceOf[org.apache.spark.sql.types.StructType]

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = child.dataType
  override def prettyName: String = "graft_latest"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: org.apache.spark.sql.types.StructType
        if org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(s) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an orderable struct argument, got ${other.catalogString}")
  }

  // Buffers and candidates are FLAT field rows (struct fields at the top
  // level), so one codegen'd ordering over `structType` serves update and
  // merge alike. Codegen'd natural ascending ordering == the interpreted
  // struct ordering (field by field, NaN greatest, nulls first) — pinned by
  // AggSpec's property test against the sort-window formulation.
  @transient private lazy val ord =
    org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering.create(structType)
  @transient private lazy val toUnsafe =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(structType)

  /** Hot-path projection: when the child is a literal struct constructor
    * (every repo caller — [[graft.dv.DvOps.latestRowsProjected]] builds
    * `struct(ordering..., payload...)`), evaluate the FIELD expressions
    * straight off the input row through one codegen'd UnsafeProjection —
    * skipping the interpreted CreateNamedStruct eval that boxes every
    * field into a GenericInternalRow per input row, and landing directly
    * in the flat UnsafeRow layout the buffer uses (no second projection
    * on a win). Any other child shape falls back to eval + project. */
  @transient private lazy val fastProj: org.apache.spark.sql.catalyst.expressions.UnsafeProjection =
    child match {
      case cns: org.apache.spark.sql.catalyst.expressions.CreateNamedStruct =>
        org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(cns.valExprs)
      case _ => null
    }

  override def createAggregationBuffer(): org.apache.spark.sql.catalyst.expressions.UnsafeRow = null

  override def update(
      buf: org.apache.spark.sql.catalyst.expressions.UnsafeRow,
      input: InternalRow): org.apache.spark.sql.catalyst.expressions.UnsafeRow = {
    if (fastProj ne null) {
      // CreateNamedStruct is never null-valued, so no null skip on this path.
      val row = fastProj(input)
      if (buf == null || ord.compare(row, buf) > 0) row.copy() else buf
    } else {
      val v = child.eval(input)
      if (v == null) buf
      else {
        val row = v.asInstanceOf[InternalRow]
        if (buf == null || ord.compare(row, buf) > 0) toUnsafe(row).copy() else buf
      }
    }
  }

  override def merge(
      a: org.apache.spark.sql.catalyst.expressions.UnsafeRow,
      b: org.apache.spark.sql.catalyst.expressions.UnsafeRow): org.apache.spark.sql.catalyst.expressions.UnsafeRow =
    if (b == null) a else if (a == null || ord.compare(b, a) > 0) b else a

  override def eval(buf: org.apache.spark.sql.catalyst.expressions.UnsafeRow): Any = buf

  override def serialize(buf: org.apache.spark.sql.catalyst.expressions.UnsafeRow): Array[Byte] =
    if (buf == null) Array.emptyByteArray else buf.getBytes

  override def deserialize(bytes: Array[Byte]): org.apache.spark.sql.catalyst.expressions.UnsafeRow =
    if (bytes.isEmpty) null
    else {
      val row = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(structType.size)
      row.pointTo(bytes, bytes.length)
      row
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): MaxStruct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MaxStruct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MaxStruct =
    copy(child = newChildren.head)
}
