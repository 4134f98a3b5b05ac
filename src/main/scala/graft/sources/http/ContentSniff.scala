package graft.sources.http

/** Content sniffing — magic-byte signatures, binary content-type patterns,
  * and JSON/XML shape heuristics, mirroring the reference's detection tables
  * (erpl-web `src/pattern_matcher.cpp:10-71` signatures/types,
  * `:146-167` printable-ratio heuristic, `:259-304` shape checks,
  * `:169-214` OData version detection).
  *
  * Trust order (what the reference's pieces add up to, applied in
  * [[HttpResult.text]] before charset decode):
  *  1. magic bytes in the BODY trump any label — a PNG served as
  *     `text/plain` is still a PNG;
  *  2. a JSON/XML-shaped body trumps a binary label — a JSON payload served
  *     as `application/octet-stream` is still text;
  *  3. otherwise the Content-Type binary patterns decide;
  *  4. last resort for large unlabeled payloads: < 25% printable bytes in a
  *     > 1 KiB body means binary.
  */
object ContentSniff {

  /** Magic-byte prefixes, ordered most-common-first like the reference
    * (`pattern_matcher.cpp:11-50`; the reference checks every signature as a
    * PREFIX — its "TAR at offset 257" entry included — and so does this). */
  private val BinarySignatures: Seq[Array[Int]] = Seq(
    Seq(0xFF, 0xD8, 0xFF),             // JPEG
    Seq(0x89, 0x50, 0x4E, 0x47),       // PNG
    Seq(0x47, 0x49, 0x46),             // GIF
    Seq(0x42, 0x4D),                   // BMP
    Seq(0x52, 0x49, 0x46, 0x46),       // WebP/WAV (RIFF)
    Seq(0x50, 0x4B, 0x03, 0x04),       // ZIP / Office Open XML
    Seq(0x1F, 0x8B),                   // GZIP
    // Bzip2 is "BZh" — the reference's table has {0x7B, 0x5A} ("{Z",
    // pattern_matcher.cpp:22), which would flag JSON/text bodies starting
    // "{Z" as binary and never match a real bzip2 stream; deliberate fix,
    // recorded under Known divergences in COVERAGE.md
    Seq(0x42, 0x5A, 0x68),             // Bzip2
    Seq(0x28, 0xB5, 0x2F, 0xFD),       // Zstd
    Seq(0xCE, 0xB2, 0xCF, 0x81),       // Brotli
    Seq(0x75, 0x73, 0x74, 0x61, 0x72), // TAR ("ustar")
    Seq(0x52, 0x61, 0x72, 0x21),       // RAR
    Seq(0x37, 0x7A, 0xBC, 0xAF, 0x27, 0x1C), // 7z
    Seq(0x25, 0x50, 0x44, 0x46),       // PDF
    Seq(0xD0, 0xCF, 0x11, 0xE0),       // MS Office 97-2003
    Seq(0xFF, 0xFB),                   // MP3
    Seq(0xFF, 0xFA),                   // MP3 MPEG2
    Seq(0x49, 0x44, 0x33),             // ID3 tag
    Seq(0x00, 0x00, 0x00, 0x20, 0x66, 0x74, 0x79, 0x70), // MP4
    Seq(0x1A, 0x45, 0xDF, 0xA3),       // WebM/Matroska
    Seq(0x4F, 0x67, 0x67, 0x53),       // Ogg
    Seq(0x66, 0x4C, 0x61, 0x43),       // FLAC
    Seq(0x7F, 0x45, 0x4C, 0x46),       // ELF
    Seq(0xFE, 0xED, 0xFA),             // Mach-O
    Seq(0x4D, 0x5A),                   // PE (Windows)
    Seq(0xAC, 0xED),                   // Java serialized object
    Seq(0xCA, 0xFE, 0xBA, 0xBE)        // Java class file
  ).map(_.toArray)

  /** Binary Content-Type substrings (`pattern_matcher.cpp:55-71`). */
  private val BinaryContentTypes: Seq[String] = Seq(
    "image/", "audio/", "video/",
    "application/octet-stream", "application/pdf",
    "application/zip", "application/x-zip", "application/x-gzip",
    "application/x-rar", "application/x-7z", "application/x-bzip2",
    "application/x-tar",
    "application/vnd.ms-excel", "application/vnd.openxmlformats",
    "application/vnd.ms-word", "application/vnd.ms-powerpoint")

  def isJsonContentType(ct: String): Boolean = {
    val l = Option(ct).getOrElse("").toLowerCase
    l.contains("application/json") || l.contains("text/json") || l.contains("+json")
  }

  def isXmlContentType(ct: String): Boolean = {
    val l = Option(ct).getOrElse("").toLowerCase
    l.contains("application/xml") || l.contains("text/xml") || l.contains("+xml")
  }

  def matchesBinarySignature(body: Array[Byte]): Boolean =
    body != null && body.nonEmpty && BinarySignatures.exists { sig =>
      body.length >= sig.length &&
        sig.indices.forall(i => (body(i) & 0xFF) == sig(i))
    }

  def isBinaryContentType(ct: String): Boolean = {
    val l = Option(ct).getOrElse("").toLowerCase
    l.nonEmpty && BinaryContentTypes.exists(l.contains)
  }

  /** Explicitly textual label: the `text/` tree, JSON/XML families, and other
    * structured-text types. A body with one of these labels is NEVER routed
    * through the printable-ratio fallback — that heuristic counts ASCII
    * bytes, so multi-byte scripts (CJK/Cyrillic/Arabic UTF-8 text) fall
    * under 25% printable and would be misclassified as binary. */
  def isTextualContentType(ct: String): Boolean = {
    val l = Option(ct).getOrElse("").toLowerCase
    l.contains("text/") || isJsonContentType(l) || isXmlContentType(l) ||
      l.contains("csv") || l.contains("javascript") || l.contains("ecmascript") ||
      l.contains("x-www-form-urlencoded") || l.contains("html")
  }

  /** Printable-ratio fallback (`pattern_matcher.cpp:150-164`): a body over
    * 1 KiB with fewer than 25% printable-ASCII/tab/CR/LF bytes is binary. */
  def lowPrintableRatio(body: Array[Byte]): Boolean =
    body != null && body.length > 1024 && {
      var printable = 0
      var i = 0
      while (i < body.length) {
        val b = body(i) & 0xFF
        if ((b >= 32 && b <= 126) || b == '\t' || b == '\n' || b == '\r') printable += 1
        i += 1
      }
      printable < body.length / 4
    }

  /** Body starts (after whitespace) like a JSON document
    * (`pattern_matcher.cpp:259-280`): `{` or `[` plus a `:` or `"`. */
  def looksLikeJson(s: String): Boolean = {
    if (s == null || s.isEmpty) return false
    val t = s.dropWhile(c => c == ' ' || c == '\t' || c == '\n' || c == '\r')
    t.nonEmpty && (t.head == '{' || t.head == '[') &&
      (s.contains(':') || s.contains('"'))
  }

  /** Body starts (after whitespace) like an XML document
    * (`pattern_matcher.cpp:282-304`): `<?`/`<!`, or contains an XML
    * declaration / DOCTYPE. */
  def looksLikeXml(s: String): Boolean = {
    if (s == null || s.isEmpty) return false
    val t = s.dropWhile(c => c == ' ' || c == '\t' || c == '\n' || c == '\r')
    if (t.isEmpty || t.head != '<') return false
    if (t.length > 1 && (t(1) == '?' || t(1) == '!')) return true
    s.contains("<?xml") || s.contains("<!DOCTYPE")
  }

  /** The combined binary decision (see trust order in the object doc). The
    * shape probe reads at most the first 512 bytes as Latin-1 — enough for
    * the `{`/`<` prefix tests without decoding a large payload twice. */
  def isBinary(body: Array[Byte], contentType: String): Boolean = {
    if (matchesBinarySignature(body)) return true
    val prefix = new String(body, 0, math.min(body.length, 512),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    if (looksLikeJson(prefix) || looksLikeXml(prefix)) return false
    // printable-ratio is the last resort for UNLABELED/untyped payloads
    // only (trust order step 4): an explicit textual label wins over it
    isBinaryContentType(contentType) ||
      (!isTextualContentType(contentType) && lowPrintableRatio(body))
  }

  /** OData protocol version from a response body + content type
    * (`pattern_matcher.cpp:169-214`): v4 JSON carries `@odata.context` /
    * `@odata.type` / a `value` array; v2 JSON wraps rows in `d` /
    * `__metadata`; the XML namespaces disambiguate the Atom dialects. */
  def detectODataVersion(content: String, contentType: String): Option[String] = {
    if (content == null || content.isEmpty) return None
    val isJson = isJsonContentType(contentType) ||
      (looksLikeJson(content) && !looksLikeXml(content))
    val isXml = isXmlContentType(contentType) ||
      (looksLikeXml(content) && !looksLikeJson(content))
    if (isJson) {
      // unambiguous @odata.* annotations first; then the v2 wrapper, which
      // must be tested BEFORE the bare "value" v4 marker — a v2 payload
      // whose rows have a property named "value" would otherwise misdetect
      if (content.contains("\"@odata.context\"") || content.contains("\"@odata.type\""))
        return Some("v4")
      if (content.contains("\"d\"") || content.contains("\"__metadata\"")) return Some("v2")
      if (content.contains("\"value\"")) return Some("v4")
    }
    if (isXml) {
      if (content.contains("http://docs.oasis-open.org/odata/ns/")) return Some("v4")
      if (content.contains("http://schemas.microsoft.com/ado/2007/08/dataservices"))
        return Some("v2")
    }
    None
  }
}
