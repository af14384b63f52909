package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** STRICT WARC record framing (ISO 28500 §4): records are walked by
  * their declared `Content-Length` — version line, header block,
  * blank line, exactly N payload octets, record-separator CRLFs —
  * instead of split on the `WARC/1.0\r\n` version line. This closes
  * the stated round-14 limit (HtmlOps.warcFrame's scaladoc): a
  * payload that CONTAINS the version-line byte sequence (a page
  * quoting a WARC record, an archive-about-archives crawl) used to
  * mis-split into fragments whose `length_ok` failed; under the walk
  * it frames correctly, because only the declared octet count decides
  * where a record ends — the same length-driven-never-line-sniffed
  * principle as [[HttpCodec.dechunkString]].
  *
  * Records that the walk CANNOT frame — a missing `Content-Length`
  * header, a declared length whose end lands on neither a record
  * boundary nor end-of-input — make the whole chunk fall back to the
  * version-line split, byte-for-byte the `split(warc, 'WARC/1\\.0\r\n')`
  * Spark ran before (Pattern.split with limit -1, empty leading/
  * trailing parts kept). The fallback keeps every planted malformed
  * leg's behavior identical: corrupt framing stays a `length_ok`
  * verdict, never an exception. Two shapes stay strict-frameable
  * without a length match: a record with NO header-terminating blank
  * line takes the rest of the chunk (the truncated-header leg —
  * guarded: only when no further version line follows, since a
  * boundary inside a claimed header block means a next record the
  * take-the-rest arm would swallow; otherwise the chunk falls back),
  * and a declared length that overruns end-of-input takes the rest
  * (the overstated-length leg — its `length_ok` check still fails
  * downstream, exactly as before). The overrun arm TRUSTS the
  * declaration by design: a lying length that swallows a successor is
  * indistinguishable from a payload legitimately quoting a version
  * line (the %19==13 trap leg), so the walk keeps the declared span
  * and the merged row dies at `length_ok` — the stated ambiguity of a
  * self-contradictory archive.
  *
  * Emitted records EXCLUDE their version line and INCLUDE their
  * trailing separator CRLFs — precisely the split's output shape, so
  * every downstream header regex and the trailing-CRLF payload strip
  * hold unchanged.
  *
  * Octets are UTF-8 octets of the transport chars — the same unit
  * `octet_length` (Spark) / `strlen` (DuckDB) measure, which is what
  * the fixtures declare and `length_ok` verifies.
  */
object WarcSplitImpl {
  private val version = "WARC/1.0\r\n"
  private val splitRe = java.util.regex.Pattern.compile("WARC/1\\.0\r\n")
  // ISO 28500 field names are case-insensitive and the colon's
  // whitespace is optional — a spec-conformant archive writing
  // `content-length:512` must get strict framing, not a silent
  // downgrade to the mis-splitting fallback
  private val clRe = java.util.regex.Pattern.compile(
    "(?m)^(?i:content-length):[ \t]*([^\r\n]+)")

  def records(warc: UTF8String): ArrayData = {
    if (warc == null) return null
    val t = warc.toString
    val recs = strictWalk(t) match {
      case null => splitRe.split(t, -1).toSeq
      case rs => rs
    }
    new GenericArrayData(recs.map(UTF8String.fromString).toArray[Any])
  }

  /** The strict walk; null = structurally unframeable, caller falls
    * back to the version-line split.
    */
  private[graft] def strictWalk(t: String): Seq[String] = {
    if (t.isEmpty) return Nil
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < t.length) {
      if (!t.startsWith(version, i)) return null
      val start = i + version.length
      val hEnd = t.indexOf("\r\n\r\n", start)
      if (hEnd < 0) {
        // truncated header block: legal only as the chunk's TAIL — a
        // version line inside what claims to be headers means a next
        // record exists, and emitting take-the-rest would swallow it
        // (the fallback split keeps it intact instead)
        if (t.indexOf(version, start) >= 0) return null
        out += t.substring(start)
        return out.result()
      }
      val header = t.substring(start, hEnd)
      // same guard when the blank line found belongs to a LATER
      // record (this record's own block never terminated): a header
      // block cannot legally contain a record boundary
      if (header.contains(version)) return null
      val m = clRe.matcher(header)
      if (!m.find()) return null // no declared length: cannot walk
      val clStr = m.group(1).trim
      if (clStr.isEmpty || !clStr.forall(c => c >= '0' && c <= '9') ||
        clStr.length > 18) return null
      val pEnd = advanceOctets(t, hEnd + 4, clStr.toLong)
      if (pEnd == SplitsChar) return null // boundary inside a char:
      // neither a record boundary nor EOF — fall back, so a record
      // that FOLLOWS the mis-declared one survives the split
      if (pEnd == PastEof) { // declared length overruns EOF: rest is the record
        out += t.substring(start)
        return out.result()
      }
      var j = pEnd
      while (t.startsWith("\r\n", j)) j += 2
      if (j >= t.length) { // last record: runs to EOF incl. separators
        out += t.substring(start)
        return out.result()
      }
      if (!t.startsWith(version, j)) return null // misaligned: fall back
      out += t.substring(start, j)
      i = j
    }
    out.result()
  }

  private val PastEof = -1
  private val SplitsChar = -2

  /** Char index after consuming `n` UTF-8 octets from `from`;
    * [[PastEof]] when the input ends first (the take-the-rest arm),
    * [[SplitsChar]] when the declared boundary lands INSIDE a
    * multi-byte character — a length that is provably wrong while
    * more input remains, which must fall back rather than swallow a
    * following record.
    *
    * UNIT NOTE (round-15 ADVICE #2): this layer counts UTF-8 OCTETS
    * (ISO 28500 §4: WARC Content-Length is bytes; fixtures declare it
    * with octet_length()), while the HTTP chunked layer one frame IN
    * ([[HttpCodec.dechunkString]]) counts CODE POINTS (Spark
    * `length()` — the fixtures' chunk-size unit). Identical for pure
    * transport bytes ≤ 0x7F; a planted C1 byte is 1 code point but 2
    * octets, so each layer's declared lengths must be authored in its
    * OWN unit — the cross-reference lives at both call sites.
    */
  private def advanceOctets(t: String, from: Int, n: Long): Int = {
    var i = from
    var rem = n
    while (rem > 0) {
      if (i >= t.length) return PastEof
      val c = t.charAt(i)
      if (c < 0x80) { rem -= 1; i += 1 }
      else if (c < 0x800) { rem -= 2; i += 1 }
      else if (Character.isHighSurrogate(c) && i + 1 < t.length &&
        Character.isLowSurrogate(t.charAt(i + 1))) { rem -= 4; i += 2 }
      else { rem -= 3; i += 1 }
      if (rem < 0) return SplitsChar
    }
    i
  }
}

/** `warc_records(warc)` — [[WarcSplitImpl.records]] as one codegen'd
  * node: array of record bodies, strict-framed with the version-split
  * fallback.
  */
case class WarcRecords(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "warc_records"

  override protected def nullSafeEval(input: Any): Any =
    WarcSplitImpl.records(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WarcSplitImpl.records($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
