package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for embedding math.
  *
  * Spark's higher-order functions (`aggregate`, `zip_with`) are
  * CodegenFallback: every evaluation allocates intermediate arrays and
  * interprets the lambda. For an all-pairs similarity join that is the
  * entire runtime. These expressions generate a tight fused Java loop
  * instead (whole-stage-codegen friendly), turning the brute-force
  * cosine stage from interpreter-bound to memory-bandwidth-bound.
  *
  * Float math note: elements are widened to double and accumulated in
  * index order — the same fold order as `aggregate(zip_with(...))` and
  * DuckDB's list_dot_product, so results stay bit-identical to the
  * oracle formulation.
  */
object VectorExpressions {

  private def elemKind(e: Expression): DataType = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => t
    case other => throw new IllegalArgumentException(
      s"expected array<float|double>, got $other")
  }

  private def loadExpr(arr: String, i: String, t: DataType): String = t match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case _         => s"$arr.getDouble($i)"
  }

  /** Σ x_i·y_i over two numeric arrays (double accumulator). */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val lt = elemKind(left); val rt = elemKind(right)
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        val xi = if (lt == FloatType) x.getFloat(i).toDouble else x.getDouble(i)
        val yi = if (rt == FloatType) y.getFloat(i).toDouble else y.getDouble(i)
        acc += xi * yi
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double ${ev.value}Acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          ${ev.value}Acc += (${loadExpr(a, i, elemKind(left))}) * (${loadExpr(b, i, elemKind(right))});
        }
        ${ev.value} = ${ev.value}Acc;
        """
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Fused cosine similarity: one pass accumulating x·y, x·x, y·y, then
    * xy / (sqrt(xx) * sqrt(yy)) — the same arithmetic shape as computing
    * the three dot products separately, with a third of the traversals. */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val lt = elemKind(left); val rt = elemKind(right)
      val n = math.min(x.numElements(), y.numElements())
      var xy = 0.0; var xx = 0.0; var yy = 0.0
      var i = 0
      while (i < n) {
        val xi = if (lt == FloatType) x.getFloat(i).toDouble else x.getDouble(i)
        val yi = if (rt == FloatType) y.getFloat(i).toDouble else y.getDouble(i)
        xy += xi * yi; xx += xi * xi; yy += yi * yi
        i += 1
      }
      // zero-magnitude vectors: similarity 0, not NaN (NaN sorts above
      // every double in Spark, which would rank a zero vector as the
      // nearest neighbor of everything)
      if (xx == 0.0 || yy == 0.0) 0.0
      else xy / (math.sqrt(xx) * math.sqrt(yy))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val xy = ctx.freshName("xy")
        val xx = ctx.freshName("xx")
        val yy = ctx.freshName("yy")
        val xv = ctx.freshName("xv")
        val yv = ctx.freshName("yv")
        s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $xy = 0.0; double $xx = 0.0; double $yy = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xv = ${loadExpr(a, i, elemKind(left))};
          double $yv = ${loadExpr(b, i, elemKind(right))};
          $xy += $xv * $yv; $xx += $xv * $xv; $yy += $yv * $yv;
        }
        ${ev.value} = ($xx == 0.0 || $yy == 0.0) ? 0.0
          : $xy / (java.lang.Math.sqrt($xx) * java.lang.Math.sqrt($yy));
        """
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** argmax over a fixed centroid set of cosine(vec, centroid_i), ties to
    * the lowest cell; zero-magnitude pairs score 0 (as CosineSimilarity).
    * The centroid matrix lives in the expression INSTANCE and reaches
    * generated code through the codegen reference table
    * (`addReferenceObj`) — an array-of-struct-literals formulation
    * would embed nlist×dim double literals into the source janino must
    * compile (seconds before the first row), while a reference is one
    * array load. Real `doGenCode` since round 10: the argmax
    * previously ran as CodegenFallback (a virtual call + boxing per
    * row, and it broke whole-stage fusion around the assignment scan),
    * which at the raised derived caps — nlist ∝ maxTrain — made the
    * O(nlist·dim) per-row assignment the dominant semDedup/IVF cost.
    * The generated loop replicates nullSafeEval's arithmetic order
    * exactly, so cell ids stay bit-identical to the interpreted path
    * and to the oracle's unrolled CTE argmax. */
  case class NearestCell(child: Expression, centroids: Seq[Seq[Double]])
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.types.IntegerType
    override def dataType: DataType = IntegerType
    override def nullIntolerant: Boolean = true

    @transient private lazy val matrix: Array[Array[Double]] =
      centroids.map(_.toArray).toArray
    @transient private lazy val norms: Array[Double] =
      matrix.map(c => math.sqrt(c.map(x => x * x).sum))
    @transient private lazy val isFloat = elemKind(child) == FloatType

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val n = v.numElements()
      val vec = new Array[Double](n)
      var d = 0
      var nv = 0.0
      while (d < n) {
        val x = if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)
        vec(d) = x; nv += x * x; d += 1
      }
      val normV = math.sqrt(nv)
      var best = 0; var bestCos = -2.0
      var i = 0
      while (i < matrix.length) {
        val c = matrix(i)
        val m = math.min(c.length, n)
        var dotCv = 0.0
        d = 0
        while (d < m) { dotCv += c(d) * vec(d); d += 1 }
        val cos = if (norms(i) == 0.0 || normV == 0.0) 0.0
                  else dotCv / (norms(i) * normV)
        if (cos > bestCos) { bestCos = cos; best = i }
        i += 1
      }
      best
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val m = ctx.addReferenceObj("centroidMatrix", matrix, "double[][]")
        val nrm = ctx.addReferenceObj("centroidNorms", norms, "double[]")
        val n = ctx.freshName("n")
        val vec = ctx.freshName("vec")
        val nv = ctx.freshName("nv")
        val d = ctx.freshName("d")
        val x = ctx.freshName("x")
        val normV = ctx.freshName("normV")
        val best = ctx.freshName("best")
        val bestCos = ctx.freshName("bestCos")
        val i = ctx.freshName("i")
        val c = ctx.freshName("c")
        val mm = ctx.freshName("mm")
        val dot = ctx.freshName("dot")
        val cos = ctx.freshName("cos")
        val load =
          if (isFloat) s"(double) $v.getFloat($d)" else s"$v.getDouble($d)"
        s"""
        int $n = $v.numElements();
        double[] $vec = new double[$n];
        double $nv = 0.0;
        for (int $d = 0; $d < $n; $d++) {
          double $x = $load;
          $vec[$d] = $x; $nv += $x * $x;
        }
        double $normV = java.lang.Math.sqrt($nv);
        int $best = 0; double $bestCos = -2.0;
        for (int $i = 0; $i < $m.length; $i++) {
          double[] $c = $m[$i];
          int $mm = java.lang.Math.min($c.length, $n);
          double $dot = 0.0;
          for (int $d = 0; $d < $mm; $d++) { $dot += $c[$d] * $vec[$d]; }
          double $cos = ($nrm[$i] == 0.0 || $normV == 0.0)
            ? 0.0 : $dot / ($nrm[$i] * $normV);
          if ($cos > $bestCos) { $bestCos = $cos; $best = $i; }
        }
        ${ev.value} = $best;
        """
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** SRP bucket key: `planes` sign bits of deterministic hyperplane
    * projections, packed into an int — the native twin of the composed
    * `Σ_d element_at(vec, d+1) · c_{p,d}` column tree, which at
    * planes×dim = 9×64 is a 576-node expression janino must compile
    * and evaluate per corpus row (the dominant cost of the ANN paths'
    * corpus side at 200k vectors). Bit-identical contract with the
    * composed form, which the DuckDB oracles replicate:
    * double-widened, d-ascending LEFT-ASSOCIATIVE accumulation per
    * plane, bit set on proj ≥ 0; a vector shorter than `dim` nulls
    * every plane's sum in the composed form (non-ANSI element_at) and
    * therefore buckets to 0 — reproduced here explicitly (the dim
    * guard raises before this matters in every caller).
    * The plane matrix reaches generated code via the codegen reference
    * table (`addReferenceObj`, the NearestCell treatment — real
    * `doGenCode` since round 10): literal embedding would hand janino
    * planes×dim doubles to compile, CodegenFallback broke whole-stage
    * fusion around the corpus-side bucket scan. The generated loops
    * replicate nullSafeEval's accumulation order, keeping buckets
    * bit-identical to the interpreted path, the composed column form,
    * and the oracles' embedded-literal SQL. */
  case class SrpBucket(child: Expression, dim: Int, planes: Int,
                       matrix: Seq[Seq[Double]])
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.types.IntegerType
    override def dataType: DataType = IntegerType
    override def nullIntolerant: Boolean = true

    @transient private lazy val m: Array[Array[Double]] =
      matrix.map(_.toArray).toArray
    @transient private lazy val isFloat = elemKind(child) == FloatType

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      if (v.numElements() < dim) return 0
      val vec = new Array[Double](dim)
      var d = 0
      while (d < dim) {
        vec(d) = if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)
        d += 1
      }
      var bucket = 0
      var p = 0
      while (p < planes) {
        val c = m(p)
        var proj = 0.0
        d = 0
        while (d < dim) { proj += vec(d) * c(d); d += 1 }
        if (proj >= 0) bucket += (1 << p)
        p += 1
      }
      bucket
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val mRef = ctx.addReferenceObj("srpPlaneMatrix", m, "double[][]")
        val vec = ctx.freshName("vec")
        val d = ctx.freshName("d")
        val bucket = ctx.freshName("bucket")
        val p = ctx.freshName("p")
        val c = ctx.freshName("c")
        val proj = ctx.freshName("proj")
        val load =
          if (isFloat) s"(double) $v.getFloat($d)" else s"$v.getDouble($d)"
        s"""
        if ($v.numElements() < $dim) {
          ${ev.value} = 0;
        } else {
          double[] $vec = new double[$dim];
          for (int $d = 0; $d < $dim; $d++) { $vec[$d] = $load; }
          int $bucket = 0;
          for (int $p = 0; $p < $planes; $p++) {
            double[] $c = $mRef[$p];
            double $proj = 0.0;
            for (int $d = 0; $d < $dim; $d++) { $proj += $vec[$d] * $c[$d]; }
            if ($proj >= 0) { $bucket += (1 << $p); }
          }
          ${ev.value} = $bucket;
        }
        """
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Residual of a vector against its assigned cell's centroid:
    * out[d] = vec[d] − centroids[cell][d], d over the centroid width —
    * the per-vector subtraction faiss's IVFADC (`by_residual`) encodes
    * instead of the raw vector, so the PQ codebooks only have to cover
    * the within-cell displacement distribution (much tighter than the
    * global one — the standard recall lever at small nprobe).
    * Output `array<double>`; float inputs widen per element BEFORE the
    * subtraction (double − double, one IEEE op), which is exactly the
    * `CAST(embedding AS DOUBLE[])[d] − <literal>` arithmetic the DuckDB
    * oracle runs, so residuals are bit-identical across engines.
    * A vector shorter than the centroid width yields all-zero output
    * (the [[SrpBucket]] convention — [[graft.ops.Pq]] width-guards
    * every caller before this matters); longer vectors use their first
    * `width` elements. The centroid matrix rides the codegen reference
    * table like [[NearestCell]]'s. */
  case class CellResidual(left: Expression, right: Expression,
                          centroids: Seq[Seq[Double]])
      extends BinaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullIntolerant: Boolean = true

    @transient private lazy val matrix: Array[Array[Double]] =
      centroids.map(_.toArray).toArray
    @transient private lazy val width = matrix(0).length
    @transient private lazy val isFloat = elemKind(left) == FloatType

    override def nullSafeEval(a: Any, b: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      val c = matrix(b.asInstanceOf[Int])
      val out = new Array[Double](width)
      if (v.numElements() >= width) {
        var d = 0
        while (d < width) {
          val x = if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)
          out(d) = x - c(d)
          d += 1
        }
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (v, cell) => {
        val m = ctx.addReferenceObj("residualCentroids", matrix, "double[][]")
        val c = ctx.freshName("c")
        val out = ctx.freshName("out")
        val d = ctx.freshName("d")
        val load =
          if (isFloat) s"(double) $v.getFloat($d)" else s"$v.getDouble($d)"
        s"""
        double[] $c = $m[$cell];
        double[] $out = new double[$width];
        if ($v.numElements() >= $width) {
          for (int $d = 0; $d < $width; $d++) {
            $out[$d] = ($load) - $c[$d];
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        """
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** y = R·x: the OPQ rotation (Ge, He, Ke, Sun — CVPR 2013) applied
    * before PQ encoding, so the codebooks quantize a space whose
    * variance is balanced across subspaces instead of whatever axes
    * the embedding happened to ship with. Output `array<double>`;
    * component r = Σ_d R(r)(d)·x(d), accumulated in ascending d with
    * one multiply and one add per term (no FMA) — the identical
    * left-assoc component sums the DuckDB oracle embeds as literal
    * `R*e[d]` chains, so rotated values are bit-identical across
    * engines. Float inputs widen per element before the multiply
    * ([[CellResidual]]'s convention); the input vector materializes
    * into a local array once, so the d² inner loop reads primitives.
    * Short-vector/width conventions follow [[CellResidual]] (all-zero
    * output below `width`; extra elements ignored); the matrix rides
    * the codegen reference table. */
  case class Rotate(child: Expression, rotation: Seq[Seq[Double]])
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullIntolerant: Boolean = true

    @transient private lazy val matrix: Array[Array[Double]] =
      rotation.map(_.toArray).toArray
    @transient private lazy val width = matrix(0).length
    @transient private lazy val rows = matrix.length
    @transient private lazy val isFloat = elemKind(child) == FloatType

    /** Public so generated code runs the SAME loop as interpreted eval
      * (identical by construction — the [[graft.functions
      * .BpeExpressions.BpeSegment]] treatment). */
    def rotate(v: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
      val out = new Array[Double](rows)
      if (v.numElements() >= width) {
        val x = new Array[Double](width)
        var d = 0
        while (d < width) {
          x(d) = if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)
          d += 1
        }
        var r = 0
        while (r < rows) {
          val row = matrix(r)
          var acc = 0.0
          d = 0
          while (d < width) { acc += row(d) * x(d); d += 1 }
          out(r) = acc
          r += 1
        }
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    override def nullSafeEval(input: Any): Any =
      rotate(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val ref = ctx.addReferenceObj("rotateExpr", this, classOf[Rotate].getName)
        s"${ev.value} = $ref.rotate($v);"
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** IEEE 754 binary16 bits of a float, round-to-nearest-even — the
    * JDK 20 `Float.floatToFloat16` contract, implemented here because
    * the build targets Java 17. Normal halves round on the 13 dropped
    * mantissa bits (ties to even, carry may cross a binade — correct);
    * values ≥ 2^16 (and binade-carry from [65520, 65536)) become
    * ±Inf; sub-2^-14 values round into the subnormal-half grid
    * (quantum 2^-24, RNE, underflow to signed zero); NaN canonicalizes
    * to 0x7e00|sign. Validated element-for-element against numpy
    * float16 on the full sf0.01 embeddings corpus plus the
    * boundary/tie/subnormal edge set (Fp16 spec pins the edges). */
  private[functions] def halfBits(f: Float): Short = {
    val bits = java.lang.Float.floatToIntBits(f)
    val sign = (bits >>> 16) & 0x8000
    val v = bits & 0x7fffffff
    if (v >= 0x47800000) { // ≥ 2^16: overflow → Inf; NaN stays NaN
      if (v > 0x7f800000) (sign | 0x7e00).toShort
      else (sign | 0x7c00).toShort
    } else if (v >= 0x38800000) { // normal half range [2^-14, 65536)
      val e = (v >>> 23) - 112
      var half = sign | (e << 10) | ((v >>> 13) & 0x3ff)
      val rem = v & 0x1fff
      if (rem > 0x1000 || (rem == 0x1000 && (half & 1) == 1)) half += 1
      half.toShort
    } else { // subnormal half / underflow-to-zero range
      val s = 126 - (v >>> 23)
      if (v == 0 || s > 25) sign.toShort
      else {
        val mant = (v & 0x7fffff) | 0x800000
        var m = mant >>> s
        val hp = 1L << (s - 1)
        val rem = mant & ((1L << s) - 1)
        if (rem > hp || (rem == hp && (m & 1) == 1)) m += 1
        // m may carry to 1024 = the smallest NORMAL half's encoding
        // (exponent 1, mantissa 0) — exactly right bit-wise
        (sign | m.toInt).toShort
      }
    }
  }

  /** Exact double value of binary16 bits — every half is exactly
    * representable as a double, so decode is lossless: subnormals are
    * m·2⁻²⁴ (both factors exact), normals (1 + m/1024)·2^(e−15)
    * (sum ≤ 2 exact, power-of-two scale exact). */
  private[functions] def halfToDouble(h: Short): Double = {
    val bits = h & 0xffff
    val neg = (bits & 0x8000) != 0
    val e = (bits >>> 10) & 0x1f
    val m = bits & 0x3ff
    val mag =
      if (e == 0) m * 5.9604644775390625e-8 // 2^-24
      else if (e == 31) { if (m == 0) Double.PositiveInfinity else Double.NaN }
      else (1.0 + m / 1024.0) * math.pow(2.0, e - 15)
    if (neg) -mag else mag
  }

  /** array<float|double> → binary: each element RNE-rounded to IEEE
    * binary16 ([[halfBits]]; double inputs first cast to float — one
    * extra RNE, matching how a float-stored corpus would arrive) and
    * packed little-endian, 2 bytes per element. The at-rest form of
    * refine vectors in an IVF-PQ index ([[graft.ops.Pq
    * .buildIvfPqIndex]] `refineHalf`): 2 bytes/dim where the source
    * relation stores 4–8 — the refine stage's bytes story at 100 TB.
    * Deterministic bit-for-bit (pure integer bit manipulation). */
  case class Fp16Pack(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.types.BinaryType
    override def dataType: DataType = BinaryType
    override def nullIntolerant: Boolean = true

    // analysis-time refusal (the Fp16Unpack convention): a wrong-typed
    // SQL call must fail in the analyzer, not as an elemKind throw
    // from inside a running task
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType | DoubleType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"Fp16Pack expects array<float|double>, got $other")
      }

    @transient private lazy val isFloat = elemKind(child) == FloatType

    /** Public so generated code runs the SAME loop as interpreted eval
      * (the [[Rotate]] treatment). */
    def pack(input: ArrayData): Array[Byte] = {
      val n = input.numElements()
      val out = new Array[Byte](2 * n)
      var i = 0
      while (i < n) {
        val f = if (isFloat) input.getFloat(i) else input.getDouble(i).toFloat
        val h = halfBits(f)
        out(2 * i) = (h & 0xff).toByte
        out(2 * i + 1) = ((h >> 8) & 0xff).toByte
        i += 1
      }
      out
    }

    override def nullSafeEval(input: Any): Any =
      pack(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val ref = ctx.addReferenceObj("fp16PackExpr", this, classOf[Fp16Pack].getName)
        s"${ev.value} = $ref.pack($v);"
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** binary ([[Fp16Pack]] layout) → array<double>: lossless decode of
    * the packed halves ([[halfToDouble]]). Decoded doubles are EXACT,
    * so downstream cosine arithmetic is reproducible cross-engine —
    * the DuckDB oracle derives the identical values by RNE arithmetic
    * (round_even at the half quantum) instead of bit twiddling. */
  case class Fp16Unpack(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.types.BinaryType
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullIntolerant: Boolean = true

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == BinaryType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"Fp16Unpack expects binary, got ${child.dataType}")

    def unpack(b: Array[Byte]): org.apache.spark.sql.catalyst.util.GenericArrayData = {
      val n = b.length / 2
      val out = new Array[Double](n)
      var i = 0
      while (i < n) {
        val h = ((b(2 * i) & 0xff) | ((b(2 * i + 1) & 0xff) << 8)).toShort
        out(i) = halfToDouble(h)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    override def nullSafeEval(input: Any): Any =
      unpack(input.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val ref = ctx.addReferenceObj("fp16UnpackExpr", this, classOf[Fp16Unpack].getName)
        s"${ev.value} = $ref.unpack($v);"
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def fp16_pack(vec: Column): Column =
    ColumnBridge.column(Fp16Pack(ColumnBridge.expression(vec)))

  def fp16_unpack(bytes: Column): Column =
    ColumnBridge.column(Fp16Unpack(ColumnBridge.expression(bytes)))

  def rotate(vec: Column, rotation: Seq[Seq[Double]]): Column =
    ColumnBridge.column(Rotate(ColumnBridge.expression(vec), rotation))

  def cell_residual(vec: Column, cell: Column,
                    centroids: Seq[Seq[Double]]): Column =
    ColumnBridge.column(CellResidual(ColumnBridge.expression(vec),
      ColumnBridge.expression(cell), centroids))

  def srp_bucket(vec: Column, dim: Int, planes: Int,
                 matrix: Seq[Seq[Double]]): Column =
    ColumnBridge.column(SrpBucket(ColumnBridge.expression(vec), dim, planes, matrix))

  def nearest_cell(vec: Column, centroids: Seq[Seq[Double]]): Column =
    ColumnBridge.column(NearestCell(ColumnBridge.expression(vec), centroids))

  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def cosine_similarity(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
