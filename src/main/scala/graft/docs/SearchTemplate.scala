package graft.docs

/** ES `_search/template` — the parameterized-query transport (every Kibana
  * saved search travels as one). A mustache-subset template renders against
  * a `params` map and the result re-enters [[SearchQuery.parseFullBody]]
  * via [[SearchExec.search]] — the d151 `wrapper` pattern with parameters,
  * so pushdown/scoring/paging are identical to the inline body.
  *
  * Implemented mustache subset (the forms ES's own docs use):
  *   - `{{var}}` — scalar substitution, RAW (ES runs mustache with HTML
  *     escaping disabled; a string param is spliced verbatim into the
  *     JSON text, the caller provides surrounding quotes).
  *   - `{{var}}{{^var}}default{{/var}}` — ES's default-value idiom: the
  *     inverted section renders exactly when the param is absent.
  *   - `{{^var}}…{{/var}}` — inverted section alone (renders iff absent).
  *   - `{{#toJson}}var{{/toJson}}` — JSON-encode the param (string with
  *     full escaping, number, boolean, list, map) — the form for arrays
  *     (`terms` values) and anything needing escaping.
  *
  * Everything else is REJECTED loudly at render: an unknown `{{#section}}`
  * helper, an unclosed tag, or a `{{var}}` naming a param that was not
  * provided and carries no default — a silently-empty substitution would
  * produce a syntactically-valid but WRONG query (the bool-clause honesty
  * rule applied to the transport).
  */
object SearchTemplate {

  /** JSON-encode a param value ({{#toJson}} and the escaping contract). */
  private[docs] def toJson(v: Any): String = v match {
    case null => "null"
    case s: String => "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    case b: Boolean => b.toString
    case i: Int => i.toString
    case l: Long => l.toString
    case d: Double =>
      if (d == math.floor(d) && !d.isInfinite) d.toLong.toString else d.toString
    case xs: Seq[_] => xs.map(toJson).mkString("[", ",", "]")
    case m: Map[_, _] => m.map { case (k, x) =>
      toJson(k.toString) + ":" + toJson(x)
    }.mkString("{", ",", "}")
    case other => throw new IllegalArgumentException(
      s"search template: unsupported param type ${other.getClass.getName}")
  }

  /** Scalar rendering for `{{var}}` (raw splice — numbers/booleans as JSON
    * literals, strings verbatim without quotes). */
  private def scalar(name: String, v: Any): String = v match {
    case s: String => s
    case _: Int | _: Long | _: Boolean => v.toString
    case d: Double => toJson(d)
    case other => throw new IllegalArgumentException(
      s"search template: param $name is not a scalar (${other.getClass.getName})" +
        " — use {{#toJson}}" + name + "{{/toJson}} for lists/maps")
  }

  def render(source: String, params: Map[String, Any]): String = {
    val out = new StringBuilder
    var i = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"search template: $msg at offset $i")
    def readTag(): String = { // positioned right AFTER "{{"
      val end = source.indexOf("}}", i)
      if (end < 0) fail("unclosed {{ tag")
      val t = source.substring(i, end).trim
      i = end + 2
      t
    }
    while (i < source.length) {
      val next = source.indexOf("{{", i)
      if (next < 0) { out ++= source.substring(i); i = source.length }
      else {
        out ++= source.substring(i, next)
        i = next + 2
        val tag = readTag()
        if (tag == "#toJson") {
          val end = source.indexOf("{{/toJson}}", i)
          if (end < 0) fail("unclosed {{#toJson}} section")
          val name = source.substring(i, end).trim
          if (name.isEmpty || name.contains("{{"))
            fail("{{#toJson}} must wrap exactly a param name")
          i = end + "{{/toJson}}".length
          out ++= toJson(params.getOrElse(name,
            fail(s"missing param $name for {{#toJson}}")))
        } else if (tag.startsWith("#")) {
          fail(s"unsupported section {{$tag}} (only #toJson and ^var defaults)")
        } else if (tag.startsWith("/")) {
          fail(s"unmatched closing tag {{$tag}}")
        } else if (tag.startsWith("^")) {
          // inverted section: contents render iff the param is absent
          val name = tag.drop(1)
          val close = s"{{/$name}}"
          val end = source.indexOf(close, i)
          if (end < 0) fail(s"unclosed inverted section {{$tag}}")
          val body = source.substring(i, end)
          if (body.contains("{{")) fail(s"nested tags inside {{$tag}} default")
          i = end + close.length
          if (!params.contains(name)) out ++= body
        } else {
          // plain {{var}} — optionally followed by its {{^var}}default{{/var}}
          val name = tag
          val inv = s"{{^$name}}"
          if (source.startsWith(inv, i)) {
            i += inv.length
            val close = s"{{/$name}}"
            val end = source.indexOf(close, i)
            if (end < 0) fail(s"unclosed default section for {{$name}}")
            val dflt = source.substring(i, end)
            if (dflt.contains("{{")) fail(s"nested tags inside {{^$name}} default")
            i = end + close.length
            params.get(name) match {
              case Some(v) => out ++= scalar(name, v)
              case None => out ++= dflt
            }
          } else params.get(name) match {
            case Some(v) => out ++= scalar(name, v)
            case None => fail(s"missing param $name (no {{^$name}} default)")
          }
        }
      }
    }
    out.toString
  }

  /** Render + execute: the `_search/template` endpoint. */
  def search(docs: org.apache.spark.sql.DataFrame, docCol: String,
             source: String, params: Map[String, Any],
             schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    SearchExec.search(docs, docCol, render(source, params), schema)
}
