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
    * single-quoted strings, backtick commands, and `--` line comments
    * (comments stripped in the same scan, matching the Lexer — an odd
    * number of quotes or backticks inside a comment would otherwise
    * corrupt the balance state for the rest of the buffered statement,
    * r18 ADVICE). Exposed for GruntSpec. */
  private[tools] def statementComplete(s: String): Boolean = {
    val outside = {
      val sb = new StringBuilder
      var inStr = false
      var inTick = false
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (!inStr && !inTick && c == '-' && i + 1 < s.length &&
            s.charAt(i + 1) == '-') {
          while (i < s.length && s.charAt(i) != '\n') i += 1
        } else {
          if (c == '\'' && !inTick) inStr = !inStr
          else if (c == '`' && !inStr) inTick = !inTick
          else if (!inStr && !inTick) sb.append(c)
          i += 1
        }
      }
      sb.toString
    }
    outside.trim.endsWith(";") &&
      outside.count(_ == '{') == outside.count(_ == '}')
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
