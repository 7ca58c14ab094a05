package graft.io

/** Minimal JSON rendering for artifact files (results.json, extrema.json,
  * region/qualifier lists). Mirrors python `json.dumps` formatting closely
  * enough for golden comparisons: integral doubles print as `64.0`, strings
  * escape control characters, keys keep insertion order. */
object Json {

  sealed trait JValue { def render: String }
  final case class JStr(v: String) extends JValue {
    def render: String = "\"" + v.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
  }
  final case class JLong(v: Long) extends JValue { def render: String = v.toString }
  final case class JDouble(v: Double) extends JValue {
    def render: String =
      if (v.isNaN) "NaN" // json.dumps default allows NaN
      else if (v.isInfinite) { if (v > 0) "Infinity" else "-Infinity" }
      else v.toString
  }
  final case class JBool(v: Boolean) extends JValue { def render: String = v.toString }
  case object JNull extends JValue { def render: String = "null" }
  final case class JArr(items: Seq[JValue]) extends JValue {
    def render: String = items.map(_.render).mkString("[", ", ", "]")
  }
  final case class JObj(fields: Seq[(String, JValue)]) extends JValue {
    def render: String =
      fields.map { case (k, v) => JStr(k).render + ": " + v.render }.mkString("{", ", ", "}")
  }

  def of(v: Any): JValue = v match {
    case null => JNull
    case s: String => JStr(s)
    case i: Int => JLong(i.toLong)
    case l: Long => JLong(l)
    case d: Double => JDouble(d)
    case f: Float => JDouble(f.toDouble)
    case b: Boolean => JBool(b)
    case m: scala.collection.Map[_, _] =>
      JObj(m.toSeq.map { case (k, x) => k.toString -> of(x) })
    case s: Seq[_] => JArr(s.map(of))
    case j: JValue => j
    case other => JStr(other.toString)
  }
}
