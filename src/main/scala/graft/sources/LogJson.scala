package graft.sources

/** Structural tokenizer for the commit log's own JSON payloads —
  * retires the string-scan (`indexOf` on `"field":` markers) that
  * parsed entries before round 20. The scan was correct for the
  * payload shapes this module writes, but it was load-bearing for
  * three features (timestamp travel, the monotone commit-instant
  * clamp, checkpoint tsLog) and one hostile input class kept renewing
  * the risk: a table SCHEMA whose column metadata embeds a key the
  * log also uses (`commitTs`, `files`, `txnV`, ...) — the schema JSON
  * is nested RAW inside the entry, so a marker scan can land inside
  * it. A structural pass can't: it walks the payload once, tracks
  * string/escape state and brace/bracket depth, and surfaces ONLY the
  * top-level fields; everything nested (the schema, however
  * adversarial its metadata) is an opaque span.
  *
  * Scope is deliberately narrow — this parses the log's OWN writes
  * (one flat object, string/number/bool/array-of-string fields plus
  * one raw-embedded schema object), not arbitrary JSON: no unicode
  * escapes decoded (log fields never contain them), numbers returned
  * via `toLong`. Malformed payloads (truncated writes cannot exist —
  * entries publish by atomic link — but defense costs nothing) yield
  * the fields parsed before the damage. */
private[sources] object LogJson {

  /** Raw value spans of the top-level fields of one JSON object:
    * key -> value substring, structure-aware (nested objects/arrays
    * are single opaque spans, strings respect `\"` escapes). First
    * occurrence wins — the log never writes duplicate keys, and every
    * field the log owns is emitted BEFORE any caller-influenced
    * content (schema, txn), so "first" is always the log's own. */
  def topLevel(payload: String): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val n = payload.length
    var i = payload.indexOf('{')
    if (i < 0) return out.toMap
    i += 1
    def skipWs(): Unit = while (i < n && payload.charAt(i).isWhitespace) i += 1
    // consume a string literal starting at payload(i) == '"'; returns
    // the span INSIDE the quotes (escapes left as-is for raw spans)
    def stringSpan(): String = {
      val s = i + 1
      i += 1
      while (i < n && payload.charAt(i) != '"') {
        if (payload.charAt(i) == '\\') i += 1
        i += 1
      }
      val e = i
      i += 1 // closing quote
      payload.substring(s, math.min(e, n))
    }
    // consume one value starting at payload(i); returns its raw span
    def valueSpan(): String = {
      val start = i
      payload.charAt(i) match {
        case '"' => stringSpan(); payload.substring(start, math.min(i, n))
        case '{' | '[' =>
          var depth = 0
          var inStr = false
          while (i < n && (depth > 0 || i == start)) {
            val c = payload.charAt(i)
            if (inStr) {
              if (c == '\\') i += 1
              else if (c == '"') inStr = false
            } else c match {
              case '"' => inStr = true
              case '{' | '[' => depth += 1
              case '}' | ']' => depth -= 1
              case _ => ()
            }
            i += 1
          }
          payload.substring(start, math.min(i, n))
        case _ => // number / true / false / null
          while (i < n && !",}]".contains(payload.charAt(i)) &&
            !payload.charAt(i).isWhitespace) i += 1
          payload.substring(start, i)
      }
    }
    var ok = true
    while (ok && i < n) {
      skipWs()
      if (i >= n || payload.charAt(i) == '}') ok = false
      else {
        if (payload.charAt(i) == ',') { i += 1; skipWs() }
        if (i < n && payload.charAt(i) == '"') {
          val key = stringSpan()
          skipWs()
          if (i < n && payload.charAt(i) == ':') {
            i += 1
            skipWs()
            if (i < n) {
              val v = valueSpan()
              if (!out.contains(key)) out += key -> v
            } else ok = false
          } else ok = false
        } else ok = false
      }
    }
    out.toMap
  }

  /** A top-level numeric field; None when absent OR non-numeric (the
    * caller's fallback — mtime for commitTs — is safer than throwing
    * on a value only a damaged payload could carry). */
  def long(payload: String, field: String): Option[Long] =
    topLevel(payload).get(field).flatMap(v => scala.util.Try(v.trim.toLong).toOption)

  /** A top-level array-of-strings field (the `files` / `add` /
    * `remove` / `tsLog` shape). None when the field is absent;
    * Some(empty) for `[]`. */
  def strings(payload: String, field: String): Option[Seq[String]] =
    topLevel(payload).get(field).filter(_.startsWith("[")).map { span =>
      val body = span.trim.stripPrefix("[").stripSuffix("]")
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      val n = body.length
      while (i < n) {
        while (i < n && body.charAt(i) != '"') i += 1
        if (i < n) {
          val sb = new StringBuilder
          i += 1
          while (i < n && body.charAt(i) != '"') {
            if (body.charAt(i) == '\\' && i + 1 < n) { sb += body.charAt(i + 1); i += 2 }
            else { sb += body.charAt(i); i += 1 }
          }
          i += 1
          out += sb.result()
        }
      }
      out.toList
    }

  /** A top-level field's raw span (the schema object rides here). */
  def raw(payload: String, field: String): Option[String] =
    topLevel(payload).get(field)
}
