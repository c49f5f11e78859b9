package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native aggregate functions.
  *
  * TopKByScore replaces the `row_number() OVER (PARTITION BY q ORDER BY
  * score DESC)` + `rnk <= k` idiom for top-k-per-group. The window form
  * shuffles EVERY scored candidate row to its group's partition and
  * sorts there — at 100 TB the shuffle is |corpus|·|queries| rows. As a
  * TypedImperativeAggregate, partial aggregation runs map-side: each
  * input partition reduces to ≤ k rows per group before the exchange,
  * so the shuffle carries at most |partitions|·|groups|·k heap entries
  * and nothing is globally sorted (O(n log k) streaming instead).
  */
object AggExpressions {

  /** Bounded top-k buffer: binary min-heap keyed "worst first" so the
    * eviction candidate is O(1). Ordering: higher score wins; equal
    * scores break ties to the LOWER id (matching
    * `ORDER BY score DESC, id ASC`). Scores compare under Spark SQL's
    * total ordering: NaN above every double (ranks first under desc),
    * -0.0 equal to 0.0 (normalized on insert). */
  final class TopKBuffer(val k: Int) {
    var size = 0
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)

    // a is worse than b ⇔ a ranks after b in (score desc, id asc);
    // java.lang.Double.compare gives the NaN-greatest total order
    private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
      val c = java.lang.Double.compare(s1, s2)
      c < 0 || (c == 0 && i1 > i2)
    }

    private def siftUp(pos0: Int): Unit = {
      var pos = pos0
      while (pos > 0) {
        val parent = (pos - 1) >> 1
        if (worse(scores(pos), ids(pos), scores(parent), ids(parent))) {
          swap(pos, parent); pos = parent
        } else return
      }
    }

    private def siftDown(pos0: Int): Unit = {
      var pos = pos0
      while (true) {
        val l = 2 * pos + 1; val r = l + 1
        var worst = pos
        if (l < size && worse(scores(l), ids(l), scores(worst), ids(worst))) worst = l
        if (r < size && worse(scores(r), ids(r), scores(worst), ids(worst))) worst = r
        if (worst == pos) return
        swap(pos, worst); pos = worst
      }
    }

    private def swap(a: Int, b: Int): Unit = {
      val ts = scores(a); scores(a) = scores(b); scores(b) = ts
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }

    def add(score0: Double, id: Long): Unit = {
      val score = if (score0 == 0.0) 0.0 else score0   // -0.0 ≡ 0.0 in SQL
      if (size < k) {
        scores(size) = score; ids(size) = id; size += 1
        siftUp(size - 1)
      } else if (worse(scores(0), ids(0), score, id)) {
        scores(0) = score; ids(0) = id
        siftDown(0)
      }
    }

    def mergeFrom(other: TopKBuffer): Unit = {
      var i = 0
      while (i < other.size) { add(other.scores(i), other.ids(i)); i += 1 }
    }

    /** (score, id) pairs ranked best-first — sorted with the same
      * comparator the heap uses, so ranking is consistent with
      * admission/eviction even for NaN. */
    def sorted: Array[(Double, Long)] =
      (0 until size).map(i => (scores(i), ids(i)))
        .sortWith { case ((s1, i1), (s2, i2)) => worse(s2, i2, s1, i1) }
        .toArray
  }

  /** Top-k (id, score) pairs per group as array<struct<rnk, id, score>>,
    * ranked by (score desc, id asc) — the window `row_number` ordering
    * contract, minus the global per-group sort. Two deliberate
    * differences from the window form, both on degenerate input: rows
    * with a null score or id are dropped (the window would rank them
    * last), and NaN scores rank first under Spark's NaN-greatest total
    * order (identical to the window). */
  case class TopKByScore(score: Expression, id: Expression, k: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[TopKBuffer]
      with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
    require(k > 0, s"TopKByScore: k must be positive, got $k")

    override def children: Seq[Expression] = Seq(score, id)
    // analysis-time coercion: int/float scores and int ids arrive as
    // double/long, so SQL-surface calls can't ClassCastException the
    // executors
    override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("rnk", LongType, nullable = false),
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
      containsNull = false)

    override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

    override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
      val s = score.eval(input)
      val i = id.eval(input)
      if (s != null && i != null)
        b.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
      b
    }

    override def merge(b: TopKBuffer, other: TopKBuffer): TopKBuffer = {
      b.mergeFrom(other); b
    }

    override def eval(b: TopKBuffer): Any = {
      val ranked = b.sorted
      new GenericArrayData(ranked.zipWithIndex.map { case ((s, i), r) =>
        InternalRow((r + 1).toLong, i, s)
      }.toArray[Any])
    }

    override def serialize(b: TopKBuffer): Array[Byte] = {
      val buf = ByteBuffer.allocate(4 + 16 * b.size)
      buf.putInt(b.size)
      var i = 0
      while (i < b.size) { buf.putDouble(b.scores(i)); buf.putLong(b.ids(i)); i += 1 }
      buf.array()
    }

    override def deserialize(bytes: Array[Byte]): TopKBuffer = {
      val buf = ByteBuffer.wrap(bytes)
      val n = buf.getInt
      val b = new TopKBuffer(k)
      var i = 0
      while (i < n) { b.add(buf.getDouble, buf.getLong); i += 1 }
      b
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): TopKByScore =
      copy(score = newChildren(0), id = newChildren(1))
  }

  /** Aggregate column: top-k (score desc, id asc) pairs of a group. */
  def top_k_by_score(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(TopKByScore(
      ColumnBridge.expression(score), ColumnBridge.expression(id), k)
      .toAggregateExpression())

  /** Element-wise sum buffer for [[VectorSumLong]]; width fixed by the
    * first observed vector. */
  final class VecSumBuffer { var v: Array[Long] = _ }

  /** Element-wise sum of array<bigint> vectors — the embedding-pooling
    * aggregate. The posexplode alternative shuffles n·dim scalar rows to
    * compute the same thing; as a TypedImperativeAggregate the partial
    * sums run map-side and the exchange carries ONE dim-length vector
    * per (group × input partition). Null rows are skipped; a width
    * mismatch inside a group fails fast — a silently mis-shaped centroid
    * is the same bug class Similarity's dimGuard exists to prevent. Null
    * elements contribute zero. */
  case class VectorSumLong(child: Expression,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[VecSumBuffer]
      with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

    override def children: Seq[Expression] = Seq(child)
    override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
    override def nullable: Boolean = true
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def createAggregationBuffer(): VecSumBuffer = new VecSumBuffer

    private def addInto(b: VecSumBuffer, a: ArrayData): Unit = {
      val n = a.numElements()
      if (b.v == null) b.v = new Array[Long](n)
      else require(b.v.length == n,
        s"vector_sum_long: width mismatch ${b.v.length} vs $n within one group")
      var i = 0
      while (i < n) { if (!a.isNullAt(i)) b.v(i) += a.getLong(i); i += 1 }
    }

    override def update(b: VecSumBuffer, input: InternalRow): VecSumBuffer = {
      val a = child.eval(input)
      if (a != null) addInto(b, a.asInstanceOf[ArrayData])
      b
    }

    override def merge(b: VecSumBuffer, other: VecSumBuffer): VecSumBuffer = {
      if (other.v != null) {
        if (b.v == null) b.v = other.v
        else {
          require(b.v.length == other.v.length,
            s"vector_sum_long: width mismatch ${b.v.length} vs ${other.v.length}")
          var i = 0
          while (i < b.v.length) { b.v(i) += other.v(i); i += 1 }
        }
      }
      b
    }

    override def eval(b: VecSumBuffer): Any =
      if (b.v == null) null else new GenericArrayData(b.v.map(x => x: Any))

    override def serialize(b: VecSumBuffer): Array[Byte] = {
      val n = if (b.v == null) -1 else b.v.length
      val buf = ByteBuffer.allocate(4 + 8 * math.max(n, 0))
      buf.putInt(n)
      var i = 0
      while (i < n) { buf.putLong(b.v(i)); i += 1 }
      buf.array()
    }

    override def deserialize(bytes: Array[Byte]): VecSumBuffer = {
      val buf = ByteBuffer.wrap(bytes)
      val n = buf.getInt
      val b = new VecSumBuffer
      if (n >= 0) {
        b.v = new Array[Long](n)
        var i = 0
        while (i < n) { b.v(i) = buf.getLong; i += 1 }
      }
      b
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumLong =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): VectorSumLong =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): VectorSumLong =
      copy(child = newChildren(0))
  }

  /** Aggregate column: element-wise sum of long vectors. */
  def vector_sum_long(vec: Column): Column =
    ColumnBridge.column(VectorSumLong(ColumnBridge.expression(vec))
      .toAggregateExpression())
}
