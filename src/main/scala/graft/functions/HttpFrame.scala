package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The ENTIRE HTTP message parse + wire decode + charset seam as ONE
  * deterministic function over the framed WARC payload — the fusion
  * the round-14 regression demanded.
  *
  * Round 14 staged the decode as aliased projections
  * (`body_raw → body_framed → body`, plus seven header regexes): the
  * planner's alias inlining (PhysicalOperation.trimAliases, filter
  * pushdown) SUBSTITUTED the whole chain into every consumer, so the
  * frontier compositions — which read `body`, `body_ok`, `http_ok`,
  * `redirect_to` through two discovery channels — re-evaluated the
  * regex+inflate trees once PER REFERENCE: q205/q211 ran 27-34×
  * slower than round 13 and OOM'd an 8 GiB driver. One struct-
  * returning expression is immune by construction: however many
  * fields a plan extracts, every `GetStructField` shares the SAME
  * `http_frame(payload)` subtree, and whole-stage codegen's
  * subexpression elimination evaluates it once per row per operator.
  * (The same reasoning as [[RemoveDotsImpl]]'s note, taken to the
  * whole message stage.)
  *
  * SEMANTICS ARE A LITERAL TRANSCRIPTION of the round-14 Column chain
  * (HtmlOps.httpFrame): the same `java.util.regex` patterns Spark's
  * own `regexp_extract` ran, the same Spark `trim` (U+0020 only) and
  * UTF8String lowercase, the same null/verdict algebra — so every
  * DuckDB oracle mirror (duckHttpFrame) holds unchanged, equality by
  * construction. Strings are TRANSPORT BYTES under the latin-1
  * identity (see [[HttpCodec]]); the charset seam at the end is the
  * one place bytes become text.
  *
  * Reference ceiling: R10's arbitrary-code envelope
  * (/root/reference MapReduceWSI.java:62-79); the semantics here are
  * the HTTP/1.1 + RFC 9112/1952/9110 wire formats real archives carry.
  */
object HttpFrameImpl {

  /** Output shape. Field order is load-bearing for the expression's
    * `GetStructField` consumers; see [[graft.ops.HtmlOps.httpFrame]].
    */
  val schema: StructType = StructType(Seq(
    StructField("http_status", IntegerType, nullable = true),
    StructField("mime", StringType, nullable = false),
    StructField("http_ok", BooleanType, nullable = false),
    StructField("redirect_to", StringType, nullable = false),
    StructField("charset", StringType, nullable = false),
    StructField("etag", StringType, nullable = false),
    StructField("last_modified", StringType, nullable = false),
    StructField("transfer_encoding", StringType, nullable = false),
    StructField("content_encoding", StringType, nullable = false),
    StructField("http_content_length", LongType, nullable = true),
    StructField("body_raw", StringType, nullable = true),
    StructField("body_framed", StringType, nullable = true),
    StructField("body_ok", BooleanType, nullable = false),
    StructField("body_len_ok", BooleanType, nullable = false),
    StructField("body", StringType, nullable = true)))

  // the exact patterns the round-14 Column chain ran through Spark's
  // regexp_extract — java.util.regex is the engine either way, so
  // byte-for-byte behavior is preserved. (?m)^ + real CR/LF chars in
  // the classes, (?i:) scoped to the header NAME.
  private val statusRe =
    java.util.regex.Pattern.compile("^HTTP/1\\.[01] ([0-9]{3})")
  private val mimeRe = java.util.regex.Pattern.compile(
    "(?m)^(?i:content-type):[ \t]*([^;\r\n]+)")
  private val locationRe = java.util.regex.Pattern.compile(
    "(?m)^(?i:location):[ \t]*([^\r\n]+)")
  private val charsetRe = java.util.regex.Pattern.compile(
    "(?m)^(?i:content-type):[^\r\n]*;[ \t]*(?i:charset)=\"?([^\";\r\n]+)\"?")
  private val etagRe = java.util.regex.Pattern.compile(
    "(?m)^(?i:etag):[ \t]*([^\r\n]+)")
  private val lastModRe = java.util.regex.Pattern.compile(
    "(?m)^(?i:last-modified):[ \t]*([^\r\n]+)")
  private val teRe = java.util.regex.Pattern.compile(
    "(?m)^(?i:transfer-encoding):[ \t]*([^\r\n]+)")
  private val ceRe = java.util.regex.Pattern.compile(
    "(?m)^(?i:content-encoding):[ \t]*([^\r\n]+)")
  private val hclRe = java.util.regex.Pattern.compile(
    "(?m)^(?i:content-length):[ \t]*([^\r\n]+)")

  /** Spark `regexp_extract(s, re, 1)`: first match's group 1, '' when
    * no match (group-null folds to '').
    */
  private def extract1(p: java.util.regex.Pattern, s: String): String = {
    val m = p.matcher(s)
    if (m.find()) { val g = m.group(1); if (g == null) "" else g }
    else ""
  }

  /** Spark `trim` (U+0020 only — NOT Java's String.trim, which also
    * strips control chars) then Spark `lower` (UTF8String lowercase).
    */
  private def trimLower(s: String): String =
    UTF8String.fromString(s).trim().toLowerCase().toString

  /** Spark `trim` alone (the validators keep their case — opaque
    * bytes, RFC 9110 §8.8.3).
    */
  private def trimSpark(s: String): String =
    UTF8String.fromString(s).trim().toString

  private def allAscii(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) > 0x7f) return false
      i += 1
    }
    true
  }

  /** The UTF-8 DFA the round-14 chain ran as an rlike: the chars ARE
    * the bytes (transport identity), so validate that the char
    * sequence, read as bytes, is well-formed UTF-8 (RFC 3629 table —
    * overlongs, surrogates, >U+10FFFF all rejected). Any char > 0xFF
    * is not a byte at all: fail.
    */
  private def validUtf8Bytes(s: String): Boolean = {
    val n = s.length
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c > 0xff) return false
      if (c <= 0x7f) i += 1
      else if (c >= 0xc2 && c <= 0xdf) {
        if (i + 1 >= n || !cont(s.charAt(i + 1))) return false
        i += 2
      } else if (c == 0xe0) {
        if (i + 2 >= n || s.charAt(i + 1) < 0xa0 || s.charAt(i + 1) > 0xbf ||
          !cont(s.charAt(i + 2))) return false
        i += 3
      } else if ((c >= 0xe1 && c <= 0xec) || c == 0xee || c == 0xef) {
        if (i + 2 >= n || !cont(s.charAt(i + 1)) || !cont(s.charAt(i + 2)))
          return false
        i += 3
      } else if (c == 0xed) {
        if (i + 2 >= n || s.charAt(i + 1) < 0x80 || s.charAt(i + 1) > 0x9f ||
          !cont(s.charAt(i + 2))) return false
        i += 3
      } else if (c == 0xf0) {
        if (i + 3 >= n || s.charAt(i + 1) < 0x90 || s.charAt(i + 1) > 0xbf ||
          !cont(s.charAt(i + 2)) || !cont(s.charAt(i + 3))) return false
        i += 4
      } else if (c >= 0xf1 && c <= 0xf3) {
        if (i + 3 >= n || !cont(s.charAt(i + 1)) || !cont(s.charAt(i + 2)) ||
          !cont(s.charAt(i + 3))) return false
        i += 4
      } else if (c == 0xf4) {
        if (i + 3 >= n || s.charAt(i + 1) < 0x80 || s.charAt(i + 1) > 0x8f ||
          !cont(s.charAt(i + 2)) || !cont(s.charAt(i + 3))) return false
        i += 4
      } else return false
    }
    true
  }

  private def cont(c: Char): Boolean = c >= 0x80 && c <= 0xbf

  /** `decode(encode(s, 'ISO-8859-1'), 'UTF-8')` — reconstruct the
    * bytes (every char ≤ 0xFF, DFA-guaranteed) and decode. Valid by
    * the DFA, so never throws and never replaces.
    */
  private def utf8Decode(s: String): String = {
    val b = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) { b(i) = s.charAt(i).toByte; i += 1 }
    new String(b, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** windows-1252's C1 range (0x80–0x9F) mapped to the codepoints the
    * codepage actually means — the 27 defined entries; the five
    * undefined bytes (0x81 0x8D 0x8F 0x90 0x9D) keep the latin-1
    * identity, matching the JDK decoder. Everything outside the range
    * IS latin-1 (the codepage differs from iso-8859-1 only there), so
    * the byte-identity reading is already correct.
    */
  private val cp1252C1: Array[Char] = {
    val t = new Array[Char](32)
    var i = 0
    while (i < 32) { t(i) = (0x80 + i).toChar; i += 1 }
    t(0x00) = '€'; t(0x02) = '‚'; t(0x03) = 'ƒ'
    t(0x04) = '„'; t(0x05) = '…'; t(0x06) = '†'
    t(0x07) = '‡'; t(0x08) = 'ˆ'; t(0x09) = '‰'
    t(0x0a) = 'Š'; t(0x0b) = '‹'; t(0x0c) = 'Œ'
    t(0x0e) = 'Ž'; t(0x11) = '‘'; t(0x12) = '’'
    t(0x13) = '“'; t(0x14) = '”'; t(0x15) = '•'
    t(0x16) = '–'; t(0x17) = '—'; t(0x18) = '˜'
    t(0x19) = '™'; t(0x1a) = 'š'; t(0x1b) = '›'
    t(0x1c) = 'œ'; t(0x1e) = 'ž'; t(0x1f) = 'Ÿ'
    t
  }

  /** The C1 range and its translation as parallel strings — the shape
    * Spark's `translate` takes; the staged parity witness
    * (HtmlOps.httpFrameStaged) uses these to transcribe the branch.
    */
  val cp1252From: String = new String((0x80 to 0x9f).map(_.toChar).toArray)
  val cp1252To: String = new String(cp1252C1)

  private def cp1252Decode(s: String): String = {
    var i = 0
    var dirty = false
    while (i < s.length && !dirty) {
      val c = s.charAt(i)
      if (c >= 0x80 && c <= 0x9f) dirty = true else i += 1
    }
    if (!dirty) return s
    val b = new java.lang.StringBuilder(s.length)
    b.append(s, 0, i)
    while (i < s.length) {
      val c = s.charAt(i)
      b.append(if (c >= 0x80 && c <= 0x9f) cp1252C1(c - 0x80) else c)
      i += 1
    }
    b.toString
  }

  /** Spark `length` semantics — CODE POINTS, not UTF-16 units (a
    * non-BMP character is one). At the transport layer (chars ≤ 0xFF)
    * this IS the wire octet count; for any other input it stays
    * unit-identical with the fixtures' `length()` declarations and
    * the DuckDB mirror.
    */
  private def charLen(s: String): Long =
    s.codePointCount(0, s.length).toLong

  private val utf8Set = java.util.Set.of("utf-8", "utf8", "")
  private val latinSet = java.util.Set.of("iso-8859-1", "latin1", "latin-1")
  private val cp1252Set = java.util.Set.of("windows-1252", "cp1252")

  /** The charset LONG TAIL (round-15 Missing #4): declared-charset
    * aliases routed to the JDK decoder they mean. Every entry ships
    * in every JRE (java.nio.charset standard + extended charsets);
    * the alias spellings are the ones real Content-Type headers
    * carry (the extractor lowercases). `gb2312` maps to GBK on
    * purpose — the WHATWG encoding standard's treatment, because
    * real pages labelled gb2312 use GBK extensions freely.
    */
  val longTailAliases: Seq[(String, String)] = Seq(
    "shift_jis" -> "Shift_JIS", "shift-jis" -> "Shift_JIS",
    "sjis" -> "Shift_JIS", "x-sjis" -> "Shift_JIS",
    "windows-31j" -> "windows-31j", "ms932" -> "windows-31j",
    "euc-kr" -> "EUC-KR", "euc_kr" -> "EUC-KR",
    "ks_c_5601-1987" -> "EUC-KR",
    "gbk" -> "GBK", "gb2312" -> "GBK",
    "big5" -> "Big5",
    "euc-jp" -> "EUC-JP", "euc_jp" -> "EUC-JP",
    "iso-8859-2" -> "ISO-8859-2", "latin2" -> "ISO-8859-2",
    "iso-8859-15" -> "ISO-8859-15", "latin9" -> "ISO-8859-15",
    "koi8-r" -> "KOI8-R", "koi8" -> "KOI8-R",
    "windows-1251" -> "windows-1251", "cp1251" -> "windows-1251")

  private val longTail: java.util.Map[String, java.nio.charset.Charset] = {
    val m = new java.util.HashMap[String, java.nio.charset.Charset]()
    longTailAliases.foreach { case (alias, cs) =>
      m.put(alias, java.nio.charset.Charset.forName(cs))
    }
    m
  }

  /** Strict decode of the transport bytes under `cs`: rebuild the
    * byte array (requires every char ≤ 0xFF — anything else is not a
    * transport string and keeps itself), decode with REPORT on both
    * malformed and unmappable, and DEGRADE to the byte-identity
    * reading on failure — the same mis-declared-charset contract as
    * the UTF-8 DFA guard (a verdict-free degrade, never a throw, and
    * never the JDK's silent U+FFFD replacement, which would destroy
    * bytes a later better-informed decode could still use).
    */
  private def charsetDecode(s: String, cs: java.nio.charset.Charset): String = {
    val b = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c > 0xFF) return s
      b(i) = c.toByte
      i += 1
    }
    val dec = cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(b)).toString
    catch { case _: java.nio.charset.CharacterCodingException => s }
  }

  private def str(s: String): UTF8String = UTF8String.fromString(s)

  /** One payload in, the full frame out. NULL payload (a chunk with no
    * response record) is a REAL input: it frames as the all-verdict
    * row the round-14 chain produced (status null, '' headers,
    * http_ok/body_ok false), never a null struct.
    */
  def frame(payload: UTF8String): InternalRow = {
    if (payload == null) {
      return new GenericInternalRow(Array[Any](
        null, str(""), false, str(""), str(""), str(""), str(""),
        str(""), str(""), null, null, null, false, true, null))
    }
    val pay = payload.toString
    val statusStr = extract1(statusRe, pay)
    val isHttp = statusStr.nonEmpty
    val httpStatus: Any =
      if (isHttp) java.lang.Integer.valueOf(statusStr.toInt) else null

    // the header BLOCK: before the first blank line — and for 204/304
    // (bodiless statuses whose trailing CRLFs the WARC record-framing
    // strip may have eaten) the whole payload when no blank line
    // survived. NOT a general fallback: a truncated 200 keeps mime ''.
    val blank = pay.indexOf("\r\n\r\n")
    val headers0 = if (blank >= 0) pay.substring(0, blank) else ""
    val headers =
      if (headers0.isEmpty && (statusStr == "204" || statusStr == "304")) pay
      else headers0

    val mime = if (isHttp) trimLower(extract1(mimeRe, headers)) else ""
    val httpOk = isHttp && statusStr.toInt == 200 && mime == "text/html"
    val redirectTo =
      if (isHttp && statusStr.toInt >= 300 && statusStr.toInt <= 399)
        trimSpark(extract1(locationRe, headers))
      else ""
    val charset = if (isHttp) trimLower(extract1(charsetRe, headers)) else ""
    val etag = if (isHttp) trimSpark(extract1(etagRe, headers)) else ""
    val lastMod = if (isHttp) trimSpark(extract1(lastModRe, headers)) else ""
    val te = if (isHttp) trimLower(extract1(teRe, headers)) else ""
    val ce = if (isHttp) trimLower(extract1(ceRe, headers)) else ""
    val hcl: Any = if (!isHttp) null else {
      val raw = trimSpark(extract1(hclRe, headers))
      if (raw.isEmpty || !raw.forall(c => c >= '0' && c <= '9')) null
      else try java.lang.Long.valueOf(raw.toLong)
      catch { case _: NumberFormatException => null }
    }

    val bodyRaw =
      if (isHttp) { if (blank >= 0) pay.substring(blank + 4) else "" }
      else pay

    // WIRE DECODING in RFC order: Transfer-Encoding (chunked
    // reassembly, length-driven) then Content-Encoding (structural
    // gzip/deflate inflation). NULL anywhere = the body_ok verdict.
    val bodyFramed: String =
      if (!isHttp) bodyRaw
      else {
        val afterTe =
          if (te.isEmpty || te == "identity") bodyRaw
          else if (te == "chunked") HttpCodec.dechunkString(bodyRaw)
          else null
        if (afterTe == null) null
        else HttpCodec.inflateBodyString(afterTe, ce)
      }
    val bodyOk = bodyFramed != null

    // the WIRE-LENGTH cross-check: when the message declares a
    // Content-Length and ships un-transfer-encoded (RFC 9112 §6.3 —
    // with a Transfer-Encoding the header must be ignored), the
    // RECEIVED body's length must match the declaration. Compared
    // against body_raw, NOT the inflated body: RFC 9110 §8.6's
    // Content-Length counts the content-CODED octets, so a gzip body
    // with a correct (compressed) declaration is intact, never
    // "truncated". False catches truncated identity bodies the
    // status/mime gates pass; absent header or a TE message is
    // trivially true, and so are the bodiless statuses (RFC 9110 §8.6
    // lets a 204/304 declare the SELECTED representation's length
    // while shipping no body at all).
    val bodyLenOk =
      if (!isHttp || hcl == null || !(te.isEmpty || te == "identity") ||
        statusStr == "204" || statusStr == "304") true
      else charLen(bodyRaw) == hcl.asInstanceOf[java.lang.Long].longValue()

    // the DECODE seam — bytes become text exactly once, per the
    // DECLARED charset: latin-1 is the identity; pure-ASCII skips the
    // DFA (probed: the unconditioned DFA cost q186 ~60% at sf1);
    // declared-or-absent utf-8 decodes iff the byte DFA passes (a
    // mis-declared charset degrades to the latin-1 reading, never
    // throws); windows-1252 translates its C1 range (round-14 Missing
    // #1 — the most common legacy declaration on the real web); the
    // LONG TAIL the JDK ships (Shift_JIS, EUC-KR, GBK, Big5, EUC-JP,
    // ISO-8859-2/15, KOI8-R, windows-1251 — round-15 Missing #4)
    // strict-decodes with the same degrade-on-malformed contract; any
    // other declared charset keeps the byte-identity reading.
    val body: String =
      if (bodyFramed == null) null
      else if (!isHttp) bodyFramed
      else if (latinSet.contains(charset)) bodyFramed
      else if (allAscii(bodyFramed)) bodyFramed
      else if (utf8Set.contains(charset) && validUtf8Bytes(bodyFramed))
        utf8Decode(bodyFramed)
      else if (cp1252Set.contains(charset)) cp1252Decode(bodyFramed)
      else {
        val cs = longTail.get(charset)
        if (cs != null) charsetDecode(bodyFramed, cs) else bodyFramed
      }

    new GenericInternalRow(Array[Any](
      httpStatus, str(mime), httpOk, str(redirectTo), str(charset),
      str(etag), str(lastMod), str(te), str(ce), hcl,
      str(bodyRaw), if (bodyFramed == null) null else str(bodyFramed),
      bodyOk, bodyLenOk, if (body == null) null else str(body)))
  }
}

/** `http_frame(payload)` — [[HttpFrameImpl.frame]] as one codegen'd
  * node returning the full message struct. Never null itself (a null
  * payload frames as the verdict row), so consumers can extract any
  * field without a null guard; whole-stage codegen's subexpression
  * elimination shares the single evaluation across every extracted
  * field.
  */
case class HttpFrame(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = HttpFrameImpl.schema
  override def nullable: Boolean = false
  override def prettyName: String = "http_frame"

  override def eval(input: InternalRow): Any =
    HttpFrameImpl.frame(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val resultCode =
      code"""
        ${c.code}
        InternalRow ${ev.value} = graft.functions.HttpFrameImpl.frame(
          ${c.isNull} ? null : ${c.value});
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
