package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The URL algebra of the crawl suite — canonical key, RFC 3986
  * reference resolution, trap verdict — as NATIVE single-node
  * expressions.
  *
  * Each is a LITERAL transcription of the regex algebra its DuckDB
  * oracle mirror replays (the patterns below are character-identical
  * to the mirror's, and `java.util.regex` is the same engine Spark's
  * own `regexp_*` functions run) — so equality with the oracle is by
  * construction, exactly as it was for the Column-DSL forms these
  * replace. Native rather than DSL because the planner's alias
  * inlining (PhysicalOperation.trimAliases / filter pushdown)
  * SUBSTITUTES projection aliases into consumers with no cost guard:
  * the frontier compositions — resolve → trap-gate → canonicalize →
  * re-canonicalize in the artifact writers — multiplied the regex
  * trees to the point where ANALYSIS of q211's write plan ran for
  * tens of minutes. One node per operation keeps every URL-touching
  * plan tiny AND runs faster (precompiled patterns, no per-row regex
  * re-entry through a dozen codegen'd replace calls).
  */
object UrlOps {
  private val hostRe =
    java.util.regex.Pattern.compile("^(?i)(?:https?:)?//([^/?#]+)")
  // the OWN-AUTHORITY gate, authority-optional: character-identical to
  // the DuckDB mirrors (duckResolvedUrl/duckPathOf) and to robotsGate's
  // Spark-side test, so degenerate references like '//' or '///x'
  // classify the same way on both engines (round-14 ADVICE: hostRe's
  // [^/?#]+ requirement made them resolve server-relative here while
  // staying themselves in the oracle)
  private val authRe =
    java.util.regex.Pattern.compile("^(?i)(?:https?:)?//")
  private val authPathRe =
    java.util.regex.Pattern.compile("^(?i)(?:https?:)?//[^/?#]+([^?#]*)")
  private val relPathRe = java.util.regex.Pattern.compile("^([^?#]*)")
  private val wwwRe = java.util.regex.Pattern.compile("^www\\.")
  private val portRe = java.util.regex.Pattern.compile(":[0-9]+$")
  private val trailSlashRe = java.util.regex.Pattern.compile("/+$")
  private val baseDirRe = java.util.regex.Pattern.compile("^(.*/)")

  /** Spark `regexp_extract(u, re, 1)` semantics: first match's group
    * 1, '' when the regex does not match (group-null folds to '').
    */
  private def extract1(p: java.util.regex.Pattern, s: String): String = {
    val m = p.matcher(s)
    if (m.find()) { val g = m.group(1); if (g == null) "" else g }
    else ""
  }

  /** HtmlOps.hostOf: the authority, '' when unparseable. */
  def hostOf(u: String): String = extract1(hostRe, u)

  /** HtmlOps.canonicalUrl: lowercased host minus leading `www.` and
    * explicit port + dot-normalized path minus trailing slashes;
    * scheme/query/fragment dropped; an unparseable URL keeps itself.
    */
  def canonicalUrl(u: String): String = {
    if (u == null) return null
    // Locale.ROOT: under a Turkish default locale 'I' would lowercase
    // to dotless 'ı', making canonical keys JVM-locale-dependent and
    // diverging from DuckDB's lower()
    val host0 = extract1(hostRe, u).toLowerCase(java.util.Locale.ROOT)
    val host = portRe.matcher(wwwRe.matcher(host0).replaceAll(""))
      .replaceAll("")
    if (host.isEmpty) return u
    val path0 = extract1(authPathRe, u)
    val path = trailSlashRe.matcher(RemoveDotsImpl.remove(path0))
      .replaceAll("")
    host + path
  }

  /** HtmlOps.resolvedUrl (RFC 3986 §5.2): authority stays;
    * server-relative dot-normalizes onto the host; `?`/`#` references
    * keep the base; page-relative merges against the base path's
    * directory and dot-normalizes. Null propagates like the
    * when-chain it transcribes.
    */
  def resolvedUrl(u: String, host: String, basePath: String): String = {
    if (u == null) return null
    if (authRe.matcher(u).find()) return u // own authority (anchored re)
    if (host == null) return null
    if (u.startsWith("/"))
      return "//" + host + RemoveDotsImpl.remove(u)
    val bp = if (basePath == null) "/" else basePath
    if (u.startsWith("?")) return "//" + host + bp + u
    if (u.startsWith("#")) return "//" + host + bp
    val dir0 = extract1(baseDirRe, bp)
    val dir = if (dir0.isEmpty) "/" else dir0
    "//" + host + RemoveDotsImpl.remove(dir + u)
  }

  /** HtmlOps.urlPath: an authority-form URL's own path, a
    * server-relative reference AS its path, anything else none.
    */
  def urlPath(u: String): String = {
    if (u == null) return null
    if (authRe.matcher(u).find()) extract1(authPathRe, u)
    else if (u.startsWith("/")) extract1(relPathRe, u)
    else ""
  }

  /** HtmlOps.urlTrapped: char-length cap OR duplicate path segments
    * beyond the distinct set.
    */
  def urlTrapped(u: String, maxLen: Int, maxDupSegs: Int): Boolean = {
    if (u.length > maxLen) return true
    val segs = urlPath(u).split("/").filter(_.nonEmpty)
    (segs.length - segs.distinct.length) > maxDupSegs
  }

  /** RFC 9309 §2.2.3 rule-pattern match: `*` matches any run of
    * octets (including none), a TRAILING `$` anchors the match at the
    * end of the target, and every other octet is literal; without the
    * anchor the pattern must match a PREFIX of the target (so a
    * wildcard-free pattern degenerates to exactly `startsWith` — the
    * pre-round-16 gate). A `$` anywhere but last is a literal octet,
    * the de-facto reading every major crawler implements. Byte-wise
    * because the RFC matches octets, not characters: a UTF-8 rule
    * prefix must consume its own multi-byte sequences.
    *
    * The classic two-pointer wildcard walk with single-star
    * backtracking — O(|target|·stars) worst case, no regex compile
    * anywhere near the per-row path (the per-row-compile cost of
    * `rlike` with a non-foldable pattern is what this node exists to
    * avoid). The DuckDB oracle replays the same semantics as an RE2
    * regex BUILT from the pattern (escape metachars, `*` → `.*`,
    * trailing `$` → anchor); PropertySpec pins the two constructions
    * equal on randomized patterns and targets.
    */
  def robotsMatches(target: UTF8String, pattern: UTF8String): Boolean = {
    val t = target.getBytes
    val p = pattern.getBytes
    var pLen = p.length
    val anchored = pLen > 0 && p(pLen - 1) == '$'
    if (anchored) pLen -= 1
    if (!anchored && pLen == 0) return true // empty pattern: any prefix
    var ti = 0; var pi = 0
    var starPi = -1; var starTi = -1
    val n = t.length
    while (ti < n) {
      if (pi < pLen && p(pi) == '*') { starPi = pi; starTi = ti; pi += 1 }
      else if (pi < pLen && p(pi) == t(ti)) { pi += 1; ti += 1 }
      else if (starPi >= 0) { starTi += 1; ti = starTi; pi = starPi + 1 }
      else return false
      // unanchored prefix semantics: the pattern consumed = a prefix
      // of the target matched — done, no need to walk the rest
      if (!anchored && pi == pLen) return true
    }
    while (pi < pLen && p(pi) == '*') pi += 1
    // target exhausted: anchored needs the pattern exhausted too (the
    // match ends AT the end); unanchored reaches here only when the
    // target ran out first, where trailing stars may match empty
    pi == pLen
  }
}

/** `canonical_url(url)` as one codegen'd node. */
case class CanonicalUrl(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "canonical_url"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      UrlOps.canonicalUrl(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(" +
        s"graft.functions.UrlOps.canonicalUrl($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `resolved_url(url, host, base_path)` as one codegen'd node.
  * Standard null-intolerant ternary semantics: the link chains always
  * supply non-null host ('' when unparseable) and base path ('' /
  * '/'), so this matches the when-chain it transcribes on every
  * reachable input.
  */
case class ResolvedUrl(first: Expression, second: Expression,
                       third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(StringType, StringType, StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "resolved_url"

  override protected def nullSafeEval(u: Any, h: Any, b: Any): Any =
    UTF8String.fromString(UrlOps.resolvedUrl(
      u.asInstanceOf[UTF8String].toString,
      h.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (u, h, b) =>
      s"UTF8String.fromString(graft.functions.UrlOps.resolvedUrl(" +
        s"$u.toString(), $h.toString(), $b.toString()))")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `url_trapped(url)` with the caps baked as literals. */
case class UrlTrapped(child: Expression, maxLen: Int, maxDupSegs: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "url_trapped"

  override protected def nullSafeEval(input: Any): Any =
    UrlOps.urlTrapped(input.asInstanceOf[UTF8String].toString,
      maxLen, maxDupSegs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UrlOps.urlTrapped($c.toString(), $maxLen, $maxDupSegs)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `url_path(url)` as one codegen'd node. */
case class UrlPath(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "url_path"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      UrlOps.urlPath(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.functions.UrlOps.urlPath($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `robots_match(target, pattern)` — [[UrlOps.robotsMatches]] as one
  * codegen'd node: the RFC 9309 wildcard rule match the robots gate
  * evaluates per (link, rule) pair. Byte-wise directly on the
  * UTF8Strings (no String materialization — this sits inside the
  * gate's per-row array pipeline).
  */
case class RobotsMatch(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "robots_match"

  override protected def nullSafeEval(t: Any, p: Any): Any =
    UrlOps.robotsMatches(t.asInstanceOf[UTF8String],
      p.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, p) =>
      s"graft.functions.UrlOps.robotsMatches($t, $p)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
