package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, StringType}

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
        GraftFunctions.intLit(args(2), "winnow_fps.w"))))

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
