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
        // brace balance ignores single-quoted string AND backtick
        // command content: a '{' inside a Pig string literal or a
        // STREAM `sh -c '…{…}'` command would otherwise buffer the
        // statement forever (and a '}' could submit an incomplete
        // block early) — r17 review, backticks r18
        val outside = {
          val sb = new StringBuilder
          var inStr = false
          var inTick = false
          var i = 0
          while (i < s.length) {
            val c = s.charAt(i)
            if (c == '\'' && !inTick) inStr = !inStr
            else if (c == '`' && !inStr) inTick = !inTick
            else if (!inStr && !inTick) sb.append(c)
            i += 1
          }
          sb.toString
        }
        val complete = outside.trim.endsWith(";") &&
          outside.count(_ == '{') == outside.count(_ == '}')
        if (complete) {
          try engine.run(s)
          catch { case e: Exception => println(s"ERROR: ${e.getMessage}") }
          buf.clear()
        }
      }
    }
    spark.stop()
  }
}
