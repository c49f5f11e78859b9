package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Count-min sketch: the bounded-memory heavy-hitter/frequency summary
  * (Cormode & Muthukrishnan 2005). A d×w counter matrix replaces the
  * full (token → count) table; point estimates overcount (never
  * undercount) by at most ~N/w with probability 1−(1/2)^d.
  *
  * Why an aggregate, not a groupBy: at 100 TB the distinct-token
  * relation is itself huge; the sketch reduces to d·w longs per input
  * partition map-side, so the exchange carries ONE fixed-size matrix per
  * partition regardless of vocabulary or corpus size — the same
  * bounded-state contract as HLL (`approx_count_distinct`), but for
  * frequencies.
  *
  * Engine portability: bucket hashes are Kirsch-Mitzenmacher over one
  * md5 per token — hash_j(t) = (u + j·l) mod 2³¹−1 with u/l =
  * `md5_number_upper/lower(t) mod 2³¹−1` — exactly the ShingleMinHash
  * recipe, so a DuckDB oracle reproduces every bucket (and therefore
  * every estimate) bit-for-bit.
  */
object SketchExpressions {

  val M: Long = 2147483647L // 2^31 - 1

  /** (u mod M, l mod M) of the md5 digest — little-endian uint64 of
    * bytes [0,8) and [8,16), ≡ DuckDB md5_number_upper/lower. */
  private def md5UL(tok: String, md: MessageDigest): (Long, Long) = {
    md.reset()
    val d = md.digest(tok.getBytes("UTF-8"))
    var u = 0L; var l = 0L
    var b = 7
    while (b >= 0) {
      u = (u << 8) | (d(b) & 0xffL)
      l = (l << 8) | (d(b + 8) & 0xffL)
      b -= 1
    }
    (java.lang.Long.remainderUnsigned(u, M), java.lang.Long.remainderUnsigned(l, M))
  }

  /** Row-j bucket of `tok` in a width-`w` sketch. */
  def bucket(tok: String, j: Int, w: Int, md: MessageDigest): Int = {
    val (u, l) = md5UL(tok, md)
    (((u + j * l) % M) % w).toInt
  }

  final class CmsBuffer(val d: Int, val w: Int) {
    val m = new Array[Long](d * w)
  }

  /** count_min_sketch_agg(tok, cnt): fold (token, count) rows into the
    * d×w matrix, emitted as array<bigint> of length d·w (row-major).
    * Null tokens/counts are skipped (tokenizers emit none; degenerate
    * input shouldn't poison the sketch). */
  case class CountMinSketchAgg(tok: Expression, cnt: Expression, d: Int, w: Int,
                               mutableAggBufferOffset: Int = 0,
                               inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[CmsBuffer]
      with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
    require(d > 0 && w > 0, s"count_min_sketch_agg: need d>0, w>0; got d=$d w=$w")

    override def children: Seq[Expression] = Seq(tok, cnt)
    override def inputTypes: Seq[DataType] = Seq(StringType, LongType)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def createAggregationBuffer(): CmsBuffer = new CmsBuffer(d, w)

    @transient private lazy val md = MessageDigest.getInstance("MD5")

    override def update(b: CmsBuffer, input: InternalRow): CmsBuffer = {
      val t = tok.eval(input)
      val c = cnt.eval(input)
      if (t != null && c != null) {
        val s = t.toString
        val n = c.asInstanceOf[Long]
        var j = 0
        while (j < d) { b.m(j * w + bucket(s, j, w, md)) += n; j += 1 }
      }
      b
    }

    override def merge(b: CmsBuffer, o: CmsBuffer): CmsBuffer = {
      var i = 0
      while (i < b.m.length) { b.m(i) += o.m(i); i += 1 }
      b
    }

    override def eval(b: CmsBuffer): Any =
      new GenericArrayData(b.m.map(Long.box).toArray[Any])

    override def serialize(b: CmsBuffer): Array[Byte] = {
      val buf = ByteBuffer.allocate(8 * b.m.length)
      var i = 0
      while (i < b.m.length) { buf.putLong(b.m(i)); i += 1 }
      buf.array()
    }

    override def deserialize(bytes: Array[Byte]): CmsBuffer = {
      val buf = ByteBuffer.wrap(bytes)
      val b = new CmsBuffer(d, w)
      var i = 0
      while (i < b.m.length) { b.m(i) = buf.getLong; i += 1 }
      b
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketchAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketchAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): CountMinSketchAgg =
      copy(tok = newChildren(0), cnt = newChildren(1))
  }

  def count_min_sketch_agg(tok: Column, cnt: Column, d: Int, w: Int): Column =
    ColumnBridge.column(CountMinSketchAgg(
      ColumnBridge.expression(tok), ColumnBridge.expression(cnt), d, w)
      .toAggregateExpression())

  /** cms_estimate(sketch, tok): min over the d rows of the token's
    * bucket — the CMS point estimate. Evaluated per probe row (a
    * bounded top-k relation), so CodegenFallback md5 cost is immaterial.
    */
  case class CmsEstimate(sketch: Expression, tok: Expression, d: Int, w: Int)
      extends BinaryExpression with CodegenFallback {
    override def left: Expression = sketch
    override def right: Expression = tok
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "cms_estimate"

    @transient private lazy val md = MessageDigest.getInstance("MD5")

    override protected def nullSafeEval(sk: Any, t: Any): Any = {
      val a = sk.asInstanceOf[ArrayData]
      require(a.numElements() == d * w,
        s"cms_estimate: sketch has ${a.numElements()} cells, expected ${d * w}")
      val s = t.toString
      var est = Long.MaxValue
      var j = 0
      while (j < d) {
        val v = a.getLong(j * w + bucket(s, j, w, md))
        if (v < est) est = v
        j += 1
      }
      est
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): CmsEstimate =
      copy(sketch = newLeft, tok = newRight)
  }

  def cms_estimate(sketch: Column, tok: Column, d: Int, w: Int): Column =
    ColumnBridge.column(CmsEstimate(
      ColumnBridge.expression(sketch), ColumnBridge.expression(tok), d, w))
}
