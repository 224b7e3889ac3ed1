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
