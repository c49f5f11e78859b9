package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expressions for product quantization (Jégou, Douze,
  * Schmid — "Product Quantization for Nearest Neighbor Search", TPAMI
  * 2011): the byte-per-subspace vector representation that makes
  * 100 TB-scale ANN serving memory-feasible. A d-dim float vector
  * (4·d bytes) compresses to m small codes (`array<int>` in flight via
  * [[PqEncode]]; exactly m bytes at rest via [[PqEncodeBytes]] — the
  * index-resident faiss uint8 layout, ks ≤ 256), and the
  * asymmetric-distance scan touches ONLY codes — O(m) adds per
  * candidate via a per-query lookup table instead of O(d) multiplies
  * over raw floats.
  *
  * All three expressions follow the [[VectorExpressions.NearestCell]]
  * treatment: the trained codebook cube lives in the expression
  * instance and reaches generated code through the codegen reference
  * table (`addReferenceObj`), so janino never compiles m·ks·ds double
  * literals; real `doGenCode` keeps the scan inside whole-stage
  * codegen. Arithmetic order contract (shared with the DuckDB oracle):
  * per-subspace squared-L2 accumulates d-ascending left-associative
  * over `diff·diff` terms; the ADC total accumulates s-ascending
  * left-associative; argmin breaks ties to the lowest code. The
  * generated loops replicate `nullSafeEval` exactly, so codes and
  * distances are bit-identical across the interpreted path, the
  * codegen path, and the oracle's embedded-literal SQL.
  *
  * Short-vector contract (the [[VectorExpressions.SrpBucket]]
  * convention): the expressions themselves encode a vector with fewer
  * than m·ds elements to all-zero codes / an all-zero LUT rather than
  * raising — but every [[graft.ops.Pq]] encode/LUT site now precedes
  * them with a PER-ROW width filter (`Pq.widthGuarded`, the LSH
  * dimGuard convention) that raises loudly on short vectors, so the
  * zero-code branch is unreachable through the public operators; it
  * remains the expressions' own behavior only for direct expression
  * use. Vectors LONGER than m·ds prefix-encode over their first m·ds
  * dims.
  */
object PqExpressions {

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"expected array<float|double>, got $other")
  }

  /** Shared codegen for the per-subspace argmin loop — the ONE source
    * of the encode arithmetic both [[PqEncode]] (int codes) and
    * [[PqEncodeBytes]] (byte codes) emit, so the bit-identity contract
    * with the oracle cannot silently fork between the two output
    * types. Returns (outVar, code); `out` is a filled
    * `elemJavaType[m]` (all zeros for the short-vector guard case). */
  private def encodeLoopCode(ctx: CodegenContext, v: String,
                             cube: Array[Array[Array[Double]]],
                             isFloat: Boolean,
                             elemJavaType: String): (String, String) = {
    val cb = ctx.addReferenceObj("pqCodebooks", cube, "double[][][]")
    val m = cube.length
    val ds = cube(0)(0).length
    val out = ctx.freshName("codes")
    val s = ctx.freshName("s")
    val off = ctx.freshName("off")
    val book = ctx.freshName("book")
    val best = ctx.freshName("best")
    val bestDist = ctx.freshName("bestDist")
    val j = ctx.freshName("j")
    val c = ctx.freshName("c")
    val dist = ctx.freshName("dist")
    val d = ctx.freshName("d")
    val x = ctx.freshName("x")
    val diff = ctx.freshName("diff")
    val load =
      if (isFloat) s"(double) $v.getFloat($off + $d)"
      else s"$v.getDouble($off + $d)"
    (out, s"""
        $elemJavaType[] $out = new $elemJavaType[$m];
        if ($v.numElements() >= ${m * ds}) {
          for (int $s = 0; $s < $m; $s++) {
            int $off = $s * $ds;
            double[][] $book = $cb[$s];
            int $best = 0;
            double $bestDist = java.lang.Double.POSITIVE_INFINITY;
            for (int $j = 0; $j < $book.length; $j++) {
              double[] $c = $book[$j];
              double $dist = 0.0;
              for (int $d = 0; $d < $ds; $d++) {
                double $x = $load;
                double $diff = $x - $c[$d];
                $dist += $diff * $diff;
              }
              if ($dist < $bestDist) { $bestDist = $dist; $best = $j; }
            }
            $out[$s] = ($elemJavaType) $best;
          }
        }
        """)
  }

  /** Per-subspace argmin code over a fixed codebook cube:
    * codes[s] = argmin_j Σ_d (vec[s·ds+d] − cb[s][j][d])², ties to the
    * lowest j. Output `array<int>` of length m. */
  case class PqEncode(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullIntolerant: Boolean = true

    @transient private lazy val cube: Array[Array[Array[Double]]] =
      codebooks.map(_.map(_.toArray).toArray).toArray
    @transient private lazy val ds = cube(0)(0).length
    @transient private lazy val isFloat = elemIsFloat(child)

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val m = cube.length
      val codes = new Array[Int](m)
      if (v.numElements() >= m * ds) {
        var s = 0
        while (s < m) {
          val off = s * ds
          val book = cube(s)
          var best = 0
          var bestDist = java.lang.Double.POSITIVE_INFINITY
          var j = 0
          while (j < book.length) {
            val c = book(j)
            var dist = 0.0
            var d = 0
            while (d < ds) {
              val x = if (isFloat) v.getFloat(off + d).toDouble
                      else v.getDouble(off + d)
              val diff = x - c(d)
              dist += diff * diff
              d += 1
            }
            if (dist < bestDist) { bestDist = dist; best = j }
            j += 1
          }
          codes(s) = best
          s += 1
        }
      }
      new GenericArrayData(codes)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val (out, code) = encodeLoopCode(ctx, v, cube, isFloat, "int")
        s"""
        $code
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        """
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Per-query ADC lookup table: lut[s·ks + j] = Σ_d (vec[s·ds+d] −
    * cb[s][j][d])² — the query's squared-L2 to every codebook entry,
    * computed ONCE per query row so each candidate costs m adds.
    * Output `array<double>` of length m·ks. */
  case class PqLut(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullIntolerant: Boolean = true

    @transient private lazy val cube: Array[Array[Array[Double]]] =
      codebooks.map(_.map(_.toArray).toArray).toArray
    @transient private lazy val ds = cube(0)(0).length
    @transient private lazy val ks = cube(0).length
    @transient private lazy val isFloat = elemIsFloat(child)

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val m = cube.length
      val lut = new Array[Double](m * ks)
      if (v.numElements() >= m * ds) {
        var s = 0
        while (s < m) {
          val off = s * ds
          val book = cube(s)
          var j = 0
          while (j < book.length) {
            val c = book(j)
            var dist = 0.0
            var d = 0
            while (d < ds) {
              val x = if (isFloat) v.getFloat(off + d).toDouble
                      else v.getDouble(off + d)
              val diff = x - c(d)
              dist += diff * diff
              d += 1
            }
            lut(s * ks + j) = dist
            j += 1
          }
          s += 1
        }
      }
      new GenericArrayData(lut)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val cb = ctx.addReferenceObj("pqCodebooks", cube, "double[][][]")
        val m = cube.length
        val lut = ctx.freshName("lut")
        val s = ctx.freshName("s")
        val off = ctx.freshName("off")
        val book = ctx.freshName("book")
        val j = ctx.freshName("j")
        val c = ctx.freshName("c")
        val dist = ctx.freshName("dist")
        val d = ctx.freshName("d")
        val x = ctx.freshName("x")
        val diff = ctx.freshName("diff")
        val load =
          if (isFloat) s"(double) $v.getFloat($off + $d)"
          else s"$v.getDouble($off + $d)"
        s"""
        double[] $lut = new double[${m * ks}];
        if ($v.numElements() >= ${m * ds}) {
          for (int $s = 0; $s < $m; $s++) {
            int $off = $s * $ds;
            double[][] $book = $cb[$s];
            for (int $j = 0; $j < $book.length; $j++) {
              double[] $c = $book[$j];
              double $dist = 0.0;
              for (int $d = 0; $d < $ds; $d++) {
                double $x = $load;
                double $diff = $x - $c[$d];
                $dist += $diff * $diff;
              }
              $lut[$s * $ks + $j] = $dist;
            }
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($lut);
        """
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Asymmetric distance: Σ_s lut[s·ks + codes[s]], s-ascending — the
    * O(m) per-candidate ADC sum over a [[PqLut]] table and a
    * [[PqEncode]] code row. `ks` must match the LUT's stride. */
  case class PqAdc(left: Expression, right: Expression, ks: Int)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(a: Any, b: Any): Any = {
      val lut = a.asInstanceOf[ArrayData]
      val codes = b.asInstanceOf[ArrayData]
      val m = codes.numElements()
      var acc = 0.0
      var s = 0
      while (s < m) {
        acc += lut.getDouble(s * ks + codes.getInt(s))
        s += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val m = ctx.freshName("m")
        val acc = ctx.freshName("acc")
        val s = ctx.freshName("s")
        s"""
        int $m = $b.numElements();
        double $acc = 0.0;
        for (int $s = 0; $s < $m; $s++) {
          $acc += $a.getDouble($s * $ks + $b.getInt($s));
        }
        ${ev.value} = $acc;
        """
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** [[PqEncode]] emitting the packed byte-per-code form: `binary` of
    * exactly m bytes (requires ks ≤ 256 — the faiss uint8 layout).
    * Identical argmin arithmetic; code j stores as the unsigned byte
    * j. This is the INDEX-resident representation ([[graft.ops.Pq]]
    * persists it), cutting the serve-scan bytes to m per row where
    * the int-array form pays parquet's int encoding. */
  case class PqEncodeBytes(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
      extends UnaryExpression {
    import org.apache.spark.sql.types.BinaryType
    require(codebooks.head.length <= 256,
      s"PqEncodeBytes: ks=${codebooks.head.length} exceeds one byte")
    override def dataType: DataType = BinaryType
    override def nullIntolerant: Boolean = true

    @transient private lazy val inner = PqEncode(child, codebooks)

    override def nullSafeEval(input: Any): Any = {
      val codes = inner.nullSafeEval(input).asInstanceOf[ArrayData]
      val out = new Array[Byte](codes.numElements())
      var s = 0
      while (s < out.length) { out(s) = codes.getInt(s).toByte; s += 1 }
      out
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val (out, code) = encodeLoopCode(ctx, v,
          codebooks.map(_.map(_.toArray).toArray).toArray,
          elemIsFloat(child), "byte")
        s"""
        $code
        ${ev.value} = $out;
        """
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** [[PqAdc]] over packed byte codes: Σ_s lut[s·ks + (codes[s] & 0xFF)],
    * s-ascending — identical sums, binary-resident candidate side. */
  case class PqAdcBytes(left: Expression, right: Expression, ks: Int)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(a: Any, b: Any): Any = {
      val lut = a.asInstanceOf[ArrayData]
      val codes = b.asInstanceOf[Array[Byte]]
      var acc = 0.0
      var s = 0
      while (s < codes.length) {
        acc += lut.getDouble(s * ks + (codes(s) & 0xFF))
        s += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val acc = ctx.freshName("acc")
        val s = ctx.freshName("s")
        s"""
        double $acc = 0.0;
        for (int $s = 0; $s < $b.length; $s++) {
          $acc += $a.getDouble($s * $ks + (($b[$s]) & 0xFF));
        }
        ${ev.value} = $acc;
        """
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  def pq_encode(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(vec), codebooks))

  def pq_encode_bytes(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(PqEncodeBytes(ColumnBridge.expression(vec), codebooks))

  def pq_adc_bytes(lut: Column, codes: Column, ks: Int): Column =
    ColumnBridge.column(PqAdcBytes(
      ColumnBridge.expression(lut), ColumnBridge.expression(codes), ks))

  def pq_lut(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(PqLut(ColumnBridge.expression(vec), codebooks))

  def pq_adc(lut: Column, codes: Column, ks: Int): Column =
    ColumnBridge.column(PqAdc(
      ColumnBridge.expression(lut), ColumnBridge.expression(codes), ks))
}
