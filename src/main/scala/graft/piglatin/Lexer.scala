package graft.piglatin

/** Hand-rolled lexer for the Pig Latin subset — zero dependencies (the
  * reference uses ANTLR3 [R: src/org/apache/pig/parser/QueryLexer.g]).
  * Keywords are case-insensitive; identifiers keep their case.
  */
object Lexer {

  sealed trait Tok { def pos: Int }
  final case class Ident(s: String, pos: Int) extends Tok     // includes keywords
  final case class NumLit(v: Any, pos: Int) extends Tok
  final case class StrLit(s: String, pos: Int) extends Tok
  final case class Sym(s: String, pos: Int) extends Tok
  final case class Dollar(n: Int, pos: Int) extends Tok
  /** `cmd` — EXECCOMMAND token (STREAM … THROUGH `cut -f1`). */
  final case class Backtick(s: String, pos: Int) extends Tok
  final case class Eof(pos: Int) extends Tok

  private val symbols = List(
    "==", "!=", "<=", ">=", "::", "..", // multi-char first
    "(", ")", "[", "]", "{", "}", ",", ";", ".", "#", "?", ":",
    "+", "-", "*", "/", "%", "<", ">", "=")

  def tokenize(src: String): Either[String, Vector[Tok]] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = src.length
    def peek(k: Int = 0): Char = if (i + k < n) src.charAt(i + k) else '\u0000'
    while (i < n) {
      val c = src.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '-' && peek(1) == '-') { while (i < n && src.charAt(i) != '\n') i += 1 }
      else if (c == '/' && peek(1) == '*') {
        val start = i
        i += 2
        while (i + 1 < n && !(src.charAt(i) == '*' && src.charAt(i + 1) == '/')) i += 1
        // an unterminated /* swallowed the rest of the script silently
        // (r18 piglatin review) — everything after it was dropped, so a
        // missing */ made trailing statements vanish without diagnosis
        if (i + 1 >= n) return Left(s"unterminated block comment at $start")
        i += 2
      }
      else if (c == '\'') {
        val start = i; i += 1
        val sb = new StringBuilder
        while (i < n && src.charAt(i) != '\'') {
          if (src.charAt(i) == '\\' && i + 1 < n) { sb.append(unescape(src.charAt(i + 1))); i += 2 }
          else { sb.append(src.charAt(i)); i += 1 }
        }
        if (i >= n) return Left(s"unterminated string at $start")
        i += 1
        out += StrLit(sb.toString, start)
      }
      else if (c == '`') {
        val start = i; i += 1
        val sb = new StringBuilder
        while (i < n && src.charAt(i) != '`') { sb.append(src.charAt(i)); i += 1 }
        if (i >= n) return Left(s"unterminated backtick command at $start")
        i += 1
        out += Backtick(sb.toString, start)
      }
      else if (c == '$' && peek(1).isDigit) {
        val start = i; i += 1
        var v = 0
        while (i < n && src.charAt(i).isDigit) { v = v * 10 + (src.charAt(i) - '0'); i += 1 }
        out += Dollar(v, start)
      }
      else if (c.isDigit || (c == '.' && peek(1).isDigit)) {
        // defensive scan (PigFuzzSpec): consume at most ONE dot and
        // only when a digit follows (so `1..3` lexes as 1, `..`, 3 for
        // the project-range), and an exponent marker only when real
        // exponent digits follow (bare `5e` must not reach toDouble)
        val start = i
        var seenDot = false
        var scanning = true
        while (scanning && i < n) {
          val ch = src.charAt(i)
          if (ch.isDigit) i += 1
          else if (ch == '.' && !seenDot && i + 1 < n && src.charAt(i + 1).isDigit) {
            seenDot = true; i += 1
          } else scanning = false
        }
        var isFloat = seenDot
        var text = src.substring(start, i)
        if (i < n && (src.charAt(i) == 'e' || src.charAt(i) == 'E') &&
            (peek(1).isDigit ||
              ((peek(1) == '+' || peek(1) == '-') && peek(2).isDigit))) {
          i += 1; if (src.charAt(i) == '+' || src.charAt(i) == '-') i += 1
          while (i < n && src.charAt(i).isDigit) i += 1
          isFloat = true; text = src.substring(start, i)
        }
        val suffix = if (i < n) Character.toUpperCase(src.charAt(i)) else ' '
        try {
          val v: Any = suffix match {
            case 'L' => i += 1; text.toLong
            case 'F' => i += 1; text.toFloat
            case _ if isFloat => text.toDouble
            case _ =>
              val l = text.toLong
              if (l >= Int.MinValue && l <= Int.MaxValue) l.toInt else l
          }
          out += NumLit(v, start)
        } catch {
          case _: NumberFormatException =>
            return Left(s"malformed numeric literal '$text' at $start")
        }
      }
      else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (src.charAt(i).isLetterOrDigit || src.charAt(i) == '_')) i += 1
        out += Ident(src.substring(start, i), start)
      }
      else {
        symbols.find(s => src.startsWith(s, i)) match {
          case Some(s) => out += Sym(s, i); i += s.length
          case None => return Left(s"unexpected character '$c' at $i")
        }
      }
    }
    out += Eof(n)
    Right(out.result())
  }

  private def unescape(c: Char): Char = c match {
    case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'; case other => other
  }
}
