package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, Descending, Expression, InterpretedOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.{GraftExprBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Bounded per-group top-k buffer: a size-capped heap of copied
  * struct rows, ordered by the OWNING expression's keep-order. The
  * heap is a MAX-heap under that order (head = worst kept row), so an
  * incoming row either replaces the head or is dropped in O(log k)
  * with no allocation on the common reject path. */
final class TopKRowsBuffer(ord: Ordering[InternalRow], k: Int) {
  private[functions] val heap =
    new java.util.PriorityQueue[InternalRow](k + 1, ord.reverse)

  /** Offer one row; copies ONLY when the row is kept (update streams
    * thousands of candidates per kept row — the copy is the rare
    * path). `preCopied = true` skips the copy (merge/deserialize feed
    * rows this buffer may own outright). */
  def offer(r: InternalRow, preCopied: Boolean = false): Unit = {
    if (heap.size < k) { heap.add(if (preCopied) r else r.copy()); () }
    else if (ord.compare(r, heap.peek) < 0) {
      heap.poll()
      heap.add(if (preCopied) r else r.copy())
      ()
    }
  }

  /** Kept rows, best-first under the keep-order. */
  def sorted(): Array[InternalRow] = {
    val arr = heap.toArray(new Array[InternalRow](heap.size))
    java.util.Arrays.sort(arr, ord)
    arr
  }
}

/** Distributed per-group top-k as a typed aggregate (VERDICT r17 #1):
  * `topk_structs(struct(metric, id, ...), k)` keeps each group's k
  * smallest struct rows under the lexicographic field order (the
  * FIRST field optionally descending), returned best-first as
  * `array<struct>`.
  *
  * This replaces the `row_number() over (partition by qid order by
  * metric, id) <= k` shortlist shape on every broadcast-kNN path: the
  * window puts ALL n corpus candidates for one query into ONE task's
  * sort — a single-reducer billion-row sort at the scale the narrow
  * (qid, id, metric) projection exists to serve. As an aggregate, the
  * partial update keeps a bounded k-row heap per (group, partition)
  * MAP-SIDE, the shuffle moves only those k-row buffers, and the
  * final merge per group touches ≤ partitions × k rows — no global
  * per-group sort anywhere in the plan (OpsSpec asserts the routed
  * plans are Window-free).
  *
  * Determinism: callers pass a struct whose fields form a TOTAL order
  * (every kNN site orders by (metric, id) with ids unique per group),
  * so the kept set and its order are exactly the windowed top-k's —
  * the routed hash gates (e01/e14/e20/e06...) must and do still hash.
  * Field comparison is [[InterpretedOrdering]] over the struct's
  * types — the SAME per-type orderings (nan-safe doubles: NaN
  * greatest, -0.0 == 0.0) the window exec's sort uses, so ties and
  * float edge cases resolve identically to the plan this replaces.
  *
  * Null ordering matches the window defaults (asc = nulls first,
  * desc = nulls last); the kNN callers filter null metrics out before
  * ranking, same as before. */
final case class TopKStructs(child: Expression, k: Int,
    descFirst: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKRowsBuffer] with UnaryLike[Expression] {

  require(k >= 1, s"topk_structs: k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case st: StructType
        if st.fields.nonEmpty && st.fields.forall(f =>
          org.apache.spark.sql.catalyst.expressions.RowOrdering
            .isOrderable(f.dataType)) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a non-empty struct of orderable fields, " +
        s"got ${dt.catalogString}")
  }

  private lazy val structType = child.dataType.asInstanceOf[StructType]

  /** Keep-order: lexicographic over the struct's fields, field 0
    * direction per `descFirst` — the window's (metric [desc], id asc,
    * ...) recipe, compared with Spark's own per-type orderings. */
  private lazy val keepOrd: Ordering[InternalRow] = new InterpretedOrdering(
    structType.fields.toIndexedSeq.zipWithIndex.map { case (f, i) =>
      SortOrder(BoundReference(i, f.dataType, f.nullable),
        if (i == 0 && descFirst) Descending else Ascending)
    })

  // serialize-side projection; apply() reuses one row buffer, so every
  // result is copied to bytes before the next call (per-task instance:
  // the plan deserializes per task, the Percentile precedent)
  private lazy val proj = UnsafeProjection.create(structType)

  override def createAggregationBuffer(): TopKRowsBuffer =
    new TopKRowsBuffer(keepOrd, k)

  override def update(b: TopKRowsBuffer, input: InternalRow): TopKRowsBuffer = {
    val v = child.eval(input)
    if (v != null) b.offer(v.asInstanceOf[InternalRow])
    b
  }

  override def merge(b: TopKRowsBuffer, o: TopKRowsBuffer): TopKRowsBuffer = {
    val it = o.heap.iterator()
    while (it.hasNext) b.offer(it.next(), preCopied = true)
    b
  }

  override def eval(b: TopKRowsBuffer): Any =
    new GenericArrayData(b.sorted().asInstanceOf[Array[Any]])

  override def serialize(b: TopKRowsBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val rows = b.sorted()
    out.writeInt(rows.length)
    rows.foreach { r =>
      val bytes = proj.apply(r).getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKRowsBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      val row = new UnsafeRow(structType.length)
      row.pointTo(arr, len)
      b.offer(row, preCopied = true)
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKStructs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKStructs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): TopKStructs =
    copy(child = newChild)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def prettyName: String = "topk_structs"
}

/** Column-API entry point for [[TopKStructs]]. */
object TopKFunctions {
  def topKStructs(entry: Column, k: Int, descFirst: Boolean): Column =
    ExpressionUtils.column(TopKStructs(
      ExpressionUtils.expression(entry), k, descFirst).toAggregateExpression())
}
