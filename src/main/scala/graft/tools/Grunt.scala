package graft.tools

import scala.io.StdIn
import graft.Graft
import graft.piglatin.PigEngine

/** Interactive shell — the reference's Grunt REPL
  * [R: src/org/apache/pig/tools/grunt/Grunt.java] (SURVEY.md §3.2):
  * statements accumulate in one PigEngine (statement-at-a-time, lazy
  * until DUMP/STORE), `quit` exits. Multi-line statements are read
  * until a terminating semicolon (or closing `};` for nested blocks).
  *
  * Run: `sbt "runMain graft.tools.Grunt [baseDir]"`.
  */
object Grunt {

  /** True when the buffered input is a submittable statement: ends
    * with `;` and has balanced braces, both judged OUTSIDE
    * single-quoted strings (with the Lexer's `\x` escapes — an
    * escaped quote must not close the string), backtick commands, and
    * BOTH comment syntaxes the Lexer strips (`--` to end of line,
    * `/* */` blocks) — comment content corrupting the balance state
    * was the r18 ADVICE finding; the r19 review extended the fix to
    * the remaining Lexer constructs. An unterminated string, backtick,
    * or block comment keeps the statement buffering (the interactive
    * analog of the Lexer's loud unterminated-construct errors).
    * Exposed for GruntSpec. */
  private[tools] def statementComplete(s: String): Boolean = {
    val sb = new StringBuilder
    val n = s.length
    var i = 0
    var open = false // unterminated string/backtick/block comment
    while (i < n) {
      val c = s.charAt(i)
      if (c == '-' && i + 1 < n && s.charAt(i + 1) == '-') {
        while (i < n && s.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && s.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < n && !(s.charAt(i) == '*' && s.charAt(i + 1) == '/')) i += 1
        if (i + 1 >= n) { open = true; i = n } else i += 2
      } else if (c == '\'') {
        i += 1
        var closed = false
        while (i < n && !closed) {
          if (s.charAt(i) == '\\' && i + 1 < n) i += 2
          else if (s.charAt(i) == '\'') { closed = true; i += 1 }
          else i += 1
        }
        if (!closed) open = true
      } else if (c == '`') {
        i += 1
        while (i < n && s.charAt(i) != '`') i += 1
        if (i >= n) open = true else i += 1
      } else { sb.append(c); i += 1 }
    }
    !open && sb.toString.trim.endsWith(";") &&
      sb.count(_ == '{') == sb.count(_ == '}')
  }

  def main(args: Array[String]): Unit = {
    val spark = Graft.localSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt, "grunt")
    val engine = new PigEngine(spark, args.headOption)
    println("graft grunt> (Pig Latin; 'quit' to exit)")
    var open = true
    val buf = new StringBuilder
    while (open) {
      print(if (buf.isEmpty) "grunt> " else "    >> ")
      Console.flush()
      val line = StdIn.readLine()
      if (line == null || line.trim.equalsIgnoreCase("quit")) open = false
      else {
        buf.append(line).append("\n")
        val s = buf.toString
        // brace/terminator balance ignores single-quoted string,
        // backtick command, and -- comment content: a '{' inside a Pig
        // string literal or a STREAM `sh -c '…{…}'` command would
        // otherwise buffer the statement forever (and a '}' could
        // submit an incomplete block early) — r17 review, backticks
        // r18, comments r19
        if (statementComplete(s)) {
          try engine.run(s)
          catch { case e: Exception => println(s"ERROR: ${e.getMessage}") }
          buf.clear()
        }
      }
    }
    spark.stop()
  }
}
