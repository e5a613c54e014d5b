package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Grunt's statement-completion scan: terminator/brace balance judged
  * outside strings, backtick commands, and `--` line comments. */
class GruntSpec extends AnyFunSuite {

  test("plain statement and multi-line block completion") {
    assert(Grunt.statementComplete("a = LOAD 'x' USING parquet();\n"))
    assert(!Grunt.statementComplete("a = LOAD 'x'\n"))
    assert(!Grunt.statementComplete("b = FOREACH g {\n  f = FILTER x BY y > 1;\n"))
    assert(Grunt.statementComplete(
      "b = FOREACH g {\n  f = FILTER x BY y > 1;\n  GENERATE group, COUNT(f);\n};\n"))
  }

  test("braces inside strings and backtick commands do not count") {
    assert(Grunt.statementComplete("a = FOREACH x GENERATE CONCAT(s, '{');\n"))
    assert(!Grunt.statementComplete("a = FOREACH x GENERATE CONCAT(s, '{')\n"))
    assert(Grunt.statementComplete(
      "DEFINE cmd `sh -c 'awk {print}'` SHIP('x');\n"))
  }

  test("odd quotes/backticks inside -- comments cannot corrupt the scan (r18 ADVICE)") {
    // pre-fix, the lone apostrophe in the comment flipped inStr and the
    // terminating semicolon of the NEXT line was treated as string
    // content — the statement buffered forever
    assert(Grunt.statementComplete(
      "-- don't trip on this\na = LOAD 'x' USING parquet();\n"))
    assert(Grunt.statementComplete(
      "a = LOAD 'x' USING parquet(); -- trailing ` tick\n"))
    // an open brace inside a comment must not defer submission
    assert(Grunt.statementComplete("-- { unbalanced\nb = FILTER a BY x > 1;\n"))
    // and a comment's quote must not HIDE a real unterminated construct
    assert(!Grunt.statementComplete("-- c'mon\nb = FOREACH g {\n"))
    // `--` INSIDE a string is content, not a comment: the close-quote
    // and terminator after it must still be seen
    assert(Grunt.statementComplete("a = FOREACH x GENERATE CONCAT(s, '--');\n"))
  }

  test("block comments are stripped like the Lexer's; unterminated ones buffer (r19 review)") {
    // quote inside a /* */ block must not flip string state
    assert(Grunt.statementComplete(
      "a = LOAD 'x' USING parquet(); /* don't submit twice */\n"))
    // commented-out brace must not defer submission
    assert(Grunt.statementComplete("b = FILTER a BY x > 1; /* { */\n"))
    // an OPEN block comment keeps buffering until */ arrives
    assert(!Grunt.statementComplete("a = LOAD 'x'; /* multi\n"))
    assert(Grunt.statementComplete("a = LOAD 'x'; /* multi\nline */ b = FILTER a BY y > 1;\n"))
    // /* inside a string is content
    assert(Grunt.statementComplete("a = FOREACH x GENERATE CONCAT(s, '/*');\n"))
  }

  test("backslash-escaped quotes inside strings match the Lexer (r19 review)") {
    // the Lexer lexes \' as an escaped quote INSIDE the string — the
    // scan must not close the string there, or the terminator reads as
    // string content and the REPL buffers forever
    assert(Grunt.statementComplete(
      "a = FOREACH x GENERATE REPLACE(s, 'don\\'t', 'dont');\n"))
    // still incomplete when the string genuinely stays open
    assert(!Grunt.statementComplete("a = FOREACH x GENERATE 'don\\'t\n"))
    // a string ending in a literal backslash-escaped backslash closes
    assert(Grunt.statementComplete("a = FOREACH x GENERATE 'c:\\\\';\n"))
  }
}
