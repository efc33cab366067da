package graft.core

/** Minimal recursive-descent JSON parser (zero-dependency: the offline
  * classpath has no JSON library outside Spark's shaded ones). Supports the
  * full JSON grammar; numbers surface as Double, integers as Long where
  * exact. Used for the stream-spec config (reference deserializes
  * STREAMCONTEXT__SPEC the same way, models/app/PluginStreamContext.scala:55-76).
  */
object MiniJson {

  sealed trait JValue {
    def asObj: Map[String, JValue] = this match {
      case JObj(m) => m
      case other => throw new IllegalArgumentException(s"expected object, got $other")
    }
    def asArr: Seq[JValue] = this match {
      case JArr(a) => a
      case other => throw new IllegalArgumentException(s"expected array, got $other")
    }
    def asStr: String = this match {
      case JStr(s) => s
      case other => throw new IllegalArgumentException(s"expected string, got $other")
    }
    def asLong: Long = this match {
      // the raw text preserves integers a Double cannot (above 2^53 the
      // mantissa rounds — a Long.MaxValue-scale value would come back
      // off by hundreds); scientific/decimal forms fall back to the double
      case JNum(n, raw) => raw.toLongOption.getOrElse(n.toLong)
      case other => throw new IllegalArgumentException(s"expected number, got $other")
    }
    def asBool: Boolean = this match {
      case JBool(b) => b
      case other => throw new IllegalArgumentException(s"expected boolean, got $other")
    }
  }
  final case class JObj(fields: Map[String, JValue]) extends JValue
  final case class JArr(items: Seq[JValue]) extends JValue
  final case class JStr(value: String) extends JValue
  /** `raw` is the literal number text — the exact-integer channel for
    * [[JValue.asLong]] (see there).
    */
  final case class JNum(value: Double, raw: String) extends JValue
  final case class JBool(value: Boolean) extends JValue
  case object JNull extends JValue

  def parse(input: String): JValue = {
    val p = new Parser(input)
    val v = p.parseValue()
    p.skipWs()
    require(p.eof, s"trailing content at offset ${p.pos}")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit = while (!eof && Character.isWhitespace(s.charAt(pos))) pos += 1
    private def expect(c: Char): Unit = {
      require(!eof && s.charAt(pos) == c, s"expected '$c' at $pos")
      pos += 1
    }

    def parseValue(): JValue = {
      skipWs()
      require(!eof, "unexpected end of input")
      s.charAt(pos) match {
        case '{' => parseObject()
        case '[' => parseArray()
        case '"' => JStr(parseString())
        case 't' => literal("true"); JBool(true)
        case 'f' => literal("false"); JBool(false)
        case 'n' => literal("null"); JNull
        case _ => parseNumber()
      }
    }

    private def literal(lit: String): Unit = {
      require(s.regionMatches(pos, lit, 0, lit.length), s"bad literal at $pos")
      pos += lit.length
    }

    private def parseObject(): JObj = {
      expect('{'); skipWs()
      val b = Map.newBuilder[String, JValue]
      if (!eof && s.charAt(pos) == '}') { pos += 1; return JObj(b.result()) }
      while (true) {
        skipWs()
        val k = parseString()
        skipWs(); expect(':')
        b += k -> parseValue()
        skipWs()
        if (!eof && s.charAt(pos) == ',') pos += 1
        else { expect('}'); return JObj(b.result()) }
      }
      JObj(b.result())
    }

    private def parseArray(): JArr = {
      expect('['); skipWs()
      val b = Seq.newBuilder[JValue]
      if (!eof && s.charAt(pos) == ']') { pos += 1; return JArr(b.result()) }
      while (true) {
        b += parseValue()
        skipWs()
        if (!eof && s.charAt(pos) == ',') pos += 1
        else { expect(']'); return JArr(b.result()) }
      }
      JArr(b.result())
    }

    private def parseString(): String = {
      expect('"')
      val sb = new java.lang.StringBuilder
      while (true) {
        require(!eof, "unterminated string")
        val c = s.charAt(pos); pos += 1
        c match {
          case '"' => return sb.toString
          case '\\' =>
            require(!eof, "unterminated escape")
            val e = s.charAt(pos); pos += 1
            e match {
              case '"' => sb.append('"'); case '\\' => sb.append('\\')
              case '/' => sb.append('/'); case 'b' => sb.append('\b')
              case 'f' => sb.append('\f'); case 'n' => sb.append('\n')
              case 'r' => sb.append('\r'); case 't' => sb.append('\t')
              case 'u' =>
                require(pos + 4 <= s.length, "truncated \\u escape")
                sb.append(Integer.parseInt(s.substring(pos, pos + 4), 16).toChar)
                pos += 4
              case other => throw new IllegalArgumentException(s"bad escape \\$other")
            }
          case other => sb.append(other)
        }
      }
      sb.toString
    }

    private def parseNumber(): JNum = {
      val start = pos
      if (!eof && s.charAt(pos) == '-') pos += 1
      while (!eof && (Character.isDigit(s.charAt(pos)) || "+-.eE".indexOf(s.charAt(pos)) >= 0)) pos += 1
      val text = s.substring(start, pos)
      JNum(text.toDouble, text)
    }
  }
}
