package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StringType, StructField, StructType}

/** Native Catalyst expression for the float-vector dot product — the
  * hot inner loop of similarity search (SURVEY §2.2 Q13/Q16-Q17).
  *
  * The composable alternative (`aggregate(zip_with(...))`) evaluates
  * interpreted lambdas with per-element boxing; this expression
  * participates in whole-stage codegen as a tight primitive loop over
  * the columnar array data — ~2 orders of magnitude less overhead on
  * a 64-dim embedding, which is what makes brute-force scoring viable
  * as the exact baseline at scale.
  *
  * Accumulation is a sequential left-to-right double fold — the same
  * order as the interpreted form and the DuckDB oracle, so results are
  * bit-identical.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  // analysis-time typing: non-float arrays (e.g. array<double> or
  // array<int> literals) are coerced, anything non-array is rejected
  // with a clear AnalysisException instead of a codegen ClassCastException.
  // (Declared as Seq[DataType] — a covariant override — because
  // AbstractDataType itself is private[sql] in Spark 4's Scala signature.)
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native codegen rolling hash over a string's code points:
  * `acc = (acc * 31 + codePoint) % 2147483647`, the q38 document
  * fingerprint. Replaces the composable
  * `aggregate(split(text, ''), ...)` form, whose higher-order lambda
  * evaluates INTERPRETED per character with a per-element array slot —
  * this expression is a tight primitive loop inside whole-stage
  * codegen. Semantics match the lambda form exactly (split('') keeps
  * surrogate pairs together, ascii() yields the code point — so:
  * iterate CODE POINTS), which RollingHashSpec proves by equivalence.
  */
case class RollingHash(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {
  // non-string arguments are coerced (or rejected) during analysis,
  // matching the lambda form it replaced (which implicit-cast via ascii)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val acc = ctx.freshName("acc")
      s"""
         |java.lang.String $s = $c.toString();
         |long $acc = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $acc = ($acc * 31L + $cp) % 2147483647L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  def hash(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % 2147483647L
      i += Character.charCount(cp)
    }
    acc
  }
}

/** Shared fixed-point vector arithmetic of the q113/q114/q117/q119
  * family (round-16 optimization): one quantization definition —
  * `round(x.toDouble * 2^scaleBits)` with Spark's Round semantics
  * (BigDecimal.valueOf, HALF_UP), cast to long — used by all three
  * native expressions below so the fused forms cannot drift from the
  * composable `transform(c, x -> round(x * s) cast long)` they
  * replaced (VectorFixedPointSpec pins row-for-row equivalence).
  */
private[graft] object VecFx {
  def quantize(x: Float, s: Long): Long =
    java.math.BigDecimal.valueOf(x.toDouble * s)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong

  def quantizeArr(a: ArrayData, s: Long): Array[Long] = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = quantize(a.getFloat(i), s); i += 1 }
    out
  }

  /** Σ (quantize(emb_i) − sq_i)² over min(dims) — the zip_with/
    * aggregate chain's semantics (zip_with pads the shorter side with
    * nulls, which the composable form would turn into a null distance;
    * inputs here always agree on dims, and the spec pins the shared
    * case).
    */
  def d2(emb: ArrayData, sq: ArrayData, s: Long): Long = {
    val n = math.min(emb.numElements(), sq.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = quantize(emb.getFloat(i), s) - sq.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }
}

/** `vec_quantize_fx(embedding, scaleBits)` → array<long>: the fixed-
  * point quantization `transform(embedding, x -> cast(round(cast(x as
  * double) * 2^scaleBits) as long))` as one primitive loop (the
  * interpreted higher-order form paid a lambda dispatch + BigDecimal
  * boxing per element per row).
  */
case class VecQuantizeFx(child: Expression, scaleBits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vec_quantize_fx"
  override protected def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      VecFx.quantizeArr(input.asInstanceOf[ArrayData], 1L << scaleBits))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `vec_l2q(embedding, sq, scaleBits)` → long: quantize + squared-L2
  * against a long vector in one pass — the per-row distance of the
  * centroid-outlier gate (q119).
  */
case class VecL2Q(left: Expression, right: Expression, scaleBits: Int)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "vec_l2q"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecFx.d2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      1L << scaleBits)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `l2q_argmin(embedding, seeds, scaleBits)` → struct<d2: long,
  * cid: int>: the k-means assignment argmin (q114/q117) — nearest
  * seed by quantized squared L2, ties to the smaller cid (exactly the
  * `element_at(array_sort(transform(seeds, struct(d2, cid))), 1)`
  * chain it replaces, which sorted k structs per row through
  * interpreted lambdas). Seeds are read by field ORDINAL (0: int cid,
  * 1: array<long> sq), matching both the `typedlit(Seq[(Int,
  * Seq[Long])])` literal and any struct<cid, sq> column.
  */
case class L2QArgmin(left: Expression, right: Expression, scaleBits: Int)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("d2", org.apache.spark.sql.types.LongType, nullable = false),
    StructField("cid", org.apache.spark.sql.types.IntegerType, nullable = false)))
  override def prettyName: String = "l2q_argmin"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val emb = a.asInstanceOf[ArrayData]
    val seeds = b.asInstanceOf[ArrayData]
    val s = 1L << scaleBits
    val vq = VecFx.quantizeArr(emb, s)
    var bestD = Long.MaxValue
    var bestC = Int.MaxValue
    var i = 0
    val k = seeds.numElements()
    while (i < k) {
      val row = seeds.getStruct(i, 2)
      val cid = row.getInt(0)
      val sq = row.getArray(1)
      val n = math.min(vq.length, sq.numElements())
      var acc = 0L
      var j = 0
      while (j < n) { val d = vq(j) - sq.getLong(j); acc += d * d; j += 1 }
      if (acc < bestD || (acc == bestD && cid < bestC)) {
        bestD = acc; bestC = cid
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(bestD, bestC)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registration of graft's native functions — both as a runtime helper
  * and as a [[SparkSessionExtensions]] hook
  * (`spark.sql.extensions=graft.functions.GraftSparkExtensions`).
  */
object GraftFunctions {
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => VecDot(args(0), args(1))),
    (FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (args: Seq[Expression]) => RollingHash(args(0))),
    (FunctionIdentifier("chunked_decode"),
      new ExpressionInfo(classOf[ChunkedDecode].getName, "chunked_decode"),
      (args: Seq[Expression]) => ChunkedDecode(args(0))),
    (FunctionIdentifier("inflate_body"),
      new ExpressionInfo(classOf[InflateBody].getName, "inflate_body"),
      (args: Seq[Expression]) => InflateBody(args(0), args(1))),
    (FunctionIdentifier("http_frame"),
      new ExpressionInfo(classOf[HttpFrame].getName, "http_frame"),
      (args: Seq[Expression]) => HttpFrame(args(0))),
    (FunctionIdentifier("warc_records"),
      new ExpressionInfo(classOf[WarcRecords].getName, "warc_records"),
      (args: Seq[Expression]) => WarcRecords(args(0))),
    (FunctionIdentifier("gzip_transport"),
      new ExpressionInfo(classOf[GzipTransport].getName, "gzip_transport"),
      (args: Seq[Expression]) => GzipTransport(args(0))),
    (FunctionIdentifier("deflate_transport"),
      new ExpressionInfo(classOf[DeflateTransport].getName, "deflate_transport"),
      (args: Seq[Expression]) => DeflateTransport(args(0))),
    (FunctionIdentifier("zstd_transport"),
      new ExpressionInfo(classOf[ZstdTransport].getName, "zstd_transport"),
      (args: Seq[Expression]) => ZstdTransport(args(0))),
    (FunctionIdentifier("remove_dots"),
      new ExpressionInfo(classOf[RemoveDots].getName, "remove_dots"),
      (args: Seq[Expression]) => RemoveDots(args(0))),
    (FunctionIdentifier("canonical_url"),
      new ExpressionInfo(classOf[CanonicalUrl].getName, "canonical_url"),
      (args: Seq[Expression]) => CanonicalUrl(args(0))),
    (FunctionIdentifier("resolved_url"),
      new ExpressionInfo(classOf[ResolvedUrl].getName, "resolved_url"),
      (args: Seq[Expression]) => ResolvedUrl(args(0), args(1), args(2))),
    (FunctionIdentifier("url_path"),
      new ExpressionInfo(classOf[UrlPath].getName, "url_path"),
      (args: Seq[Expression]) => UrlPath(args(0))),
    (FunctionIdentifier("minhash_bands"),
      new ExpressionInfo(classOf[MinhashBands].getName, "minhash_bands"),
      (args: Seq[Expression]) => MinhashBands(args(0),
        GraftFunctions.intLit(args(1), "minhash_bands.numHashes"),
        GraftFunctions.intLit(args(2), "minhash_bands.bandSize"),
        GraftFunctions.intLit(args(3), "minhash_bands.shingleSize"))),
    (FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[Simhash60].getName, "simhash60"),
      (args: Seq[Expression]) => Simhash60(args(0),
        GraftFunctions.intLit(args(1), "simhash60.bits"))),
    (FunctionIdentifier("winnow_fps"),
      new ExpressionInfo(classOf[WinnowFps].getName, "winnow_fps"),
      (args: Seq[Expression]) => WinnowFps(args(0),
        GraftFunctions.intLit(args(1), "winnow_fps.k"),
        GraftFunctions.intLit(args(2), "winnow_fps.w"))),
    (FunctionIdentifier("vec_quantize_fx"),
      new ExpressionInfo(classOf[VecQuantizeFx].getName, "vec_quantize_fx"),
      (args: Seq[Expression]) => VecQuantizeFx(args(0),
        GraftFunctions.intLit(args(1), "vec_quantize_fx.scaleBits"))),
    (FunctionIdentifier("vec_l2q"),
      new ExpressionInfo(classOf[VecL2Q].getName, "vec_l2q"),
      (args: Seq[Expression]) => VecL2Q(args(0), args(1),
        GraftFunctions.intLit(args(2), "vec_l2q.scaleBits"))),
    (FunctionIdentifier("l2q_argmin"),
      new ExpressionInfo(classOf[L2QArgmin].getName, "l2q_argmin"),
      (args: Seq[Expression]) => L2QArgmin(args(0), args(1),
        GraftFunctions.intLit(args(2), "l2q_argmin.scaleBits"))))

  /** Geometry arguments of the signature functions must be integer
    * LITERALS — they shape the expression, they are not data.
    */
  private[functions] def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** Idempotent in-session registration. */
  def register(spark: SparkSession): Unit = all.foreach { case (id, info, builder) =>
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}

/** `--conf spark.sql.extensions=graft.functions.GraftSparkExtensions`
  * installs graft's native functions AND its plan-level extension (the
  * as-of join: strategy + pruning rule) into every session built with
  * the conf; [[org.apache.spark.sql.GraftPlanBridge.installPlanning]]
  * is the runtime equivalent for sessions that already exist.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.PruneAsOfJoin)
  }
}
