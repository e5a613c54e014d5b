package graft.piglatin

/** Pig script preprocessor — the reference's parameter-substitution and
  * macro-expansion phase, which runs textually BEFORE parsing
  * [R: src/org/apache/pig/tools/parameters/, parser/PigMacro.java]:
  *
  *  - `%declare NAME value` / `%default NAME value` — parameters,
  *    referenced as `$NAME` (declare wins over default);
  *  - `DEFINE alias Target;` — function aliasing (alias() → Target());
  *  - `DEFINE name(p1, p2) RETURNS r { … };` — macros, expanded at each
  *    `out = name(args);` call with parameter substitution and internal
  *    aliases renamed per expansion (hygiene), exactly Pig's textual
  *    model.
  *
  * Kept deliberately line/regex-based like the reference's
  * preprocessor; nested macro definitions are not supported, and —
  * like Pig's own textual parameter substitution — replacements do not
  * parse quoting, so an alias/parameter token appearing INSIDE a string
  * literal is substituted too (documented subset).
  */
object Preprocessor {

  // bare values exclude ';' — a greedy \S+ swallowed the statement
  // terminator into the value (`%declare N 100;` -> "100;"), so the
  // substituted text terminated expressions early (r17 review)
  private val DeclareRe = """(?i)^\s*%(declare|default)\s+(\w+)\s+(?:'([^']*)'|([^;\s]+))\s*;?\s*$""".r
  private val DefineFuncRe = """(?i)^\s*define\s+(\w+)\s+([\w.]+)\s*;\s*$""".r
  /** `DEFINE alias `cmd` [SHIP(…)] [CACHE(…)] [INPUT(…)] [OUTPUT(…)]
    * [STDERR(…)];` — a streaming-command definition
    * [R: src/org/apache/pig/impl/streaming/StreamingCommand.java]. The
    * command is recorded and substituted at `STREAM … THROUGH alias`.
    * Clause handling (r15): `INPUT(stdin USING PigStreaming('d'))` /
    * `OUTPUT(stdout USING PigStreaming('d'))` carry their field
    * delimiter to the THROUGH site (lowered onto the STREAM statement,
    * where the compiler feeds it to the pipe transport); SHIP/CACHE
    * remain parsed-and-ignored (they distribute artifacts to task
    * hosts — meaningless in a single-JVM Spark-local deployment; on a
    * cluster, `spark.files` is the analog) and STDERR likewise (task
    * logs are the transport). A DEFINE whose clauses span MULTIPLE
    * LINES is accumulated until its terminating `;` (continuation
    * lines join with a space). Non-PigStreaming serializers stay the
    * documented subset (SURVEY §7.4 #7) and are rejected at parse.
    */
  private val StreamDefineRe =
    // clause bodies allow ONE nesting level of parens — the serializer
    // form `input(stdin using PigStreaming(','))` needs it
    """(?i)^\s*define\s+(\w+)\s+`([^`]*)`\s*((?:(?:ship|cache|input|output|stderr)\s*\((?:[^()]|\([^()]*\))*\)\s*)*);\s*$""".r
  private val StreamDefineOpenRe =
    """(?i)^\s*define\s+\w+\s+`""".r
  private val InputSerRe =
    """(?i)input\s*\(\s*stdin(\s+using\s+\w+\s*\(\s*(?:'[^']*')?\s*\))?\s*\)""".r
  private val OutputSerRe =
    """(?i)output\s*\(\s*stdout(\s+using\s+\w+\s*\(\s*(?:'[^']*')?\s*\))?\s*\)""".r
  private val MacroStartRe = """(?i)^\s*define\s+(\w+)\s*\(([^)]*)\)\s+returns\s+(\w+)\s*\{\s*$""".r
  private val MacroCallRe = """(?i)^\s*(\w+)\s*=\s*(\w+)\s*\(([^)]*)\)\s*;\s*$""".r
  private val AssignRe = """(?m)^\s*(\w+)\s*=""".r

  private final case class Macro(params: List[String], returns: String, body: String)

  /** True iff `s` contains a statement-terminating `;` — one OUTSIDE
    * single quotes and backticks. A quoted serializer delimiter
    * (`PigStreaming(';')`) or a `;` inside the backtick command must
    * not end a multi-line stream DEFINE's accumulation (ADVICE r15). */
  private def statementEnd(s: String): Boolean = {
    var inQuote = false
    var inTick = false
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' if !inTick => inQuote = !inQuote
        case '`' if !inQuote => inTick = !inTick
        case ';' if !inQuote && !inTick => return true
        case _ =>
      }
      i += 1
    }
    false
  }

  def expand(script: String): String = expand(script, 0)

  /** The THROUGH-site replacement for a stream DEFINE: the command plus
    * any INPUT/OUTPUT serializer clauses lowered from the DEFINE (their
    * delimiters travel to the parser's STREAM clause handling). */
  private def streamReplacement(cmd: String, clauses: String): String = {
    def lowered(m: Option[scala.util.matching.Regex.Match]) =
      m.map(_.matched).getOrElse("")
    val in = lowered(InputSerRe.findFirstMatchIn(clauses))
    val out = lowered(OutputSerRe.findFirstMatchIn(clauses))
    (s"`$cmd` $in $out").trim.replaceAll("\\s+", " ")
  }

  private def expand(script: String, depth: Int): String = {
    require(depth < 8,
      "macro expansion exceeded depth 8 — recursive macro definitions?")
    val params = scala.collection.mutable.Map[String, String]()
    val defaults = scala.collection.mutable.Map[String, String]()
    val funcAliases = scala.collection.mutable.Map[String, String]()
    val streamCmds = scala.collection.mutable.Map[String, String]()
    val macros = scala.collection.mutable.Map[String, Macro]()

    // pass 1: strip directives, collect macros
    val kept = new StringBuilder
    val lines = script.split("\n", -1).iterator
    while (lines.hasNext) {
      var line = lines.next()
      // a stream DEFINE whose clauses span multiple lines: accumulate
      // (joined with a space) until the terminating `;` — where
      // "terminating" means outside quotes/backticks, so a quoted
      // delimiter on any line does not truncate the DEFINE mid-clause
      if (StreamDefineOpenRe.findFirstIn(line).isDefined && !statementEnd(line)) {
        val acc = new StringBuilder(line)
        while (!statementEnd(acc.toString) && lines.hasNext) {
          acc.append(' ').append(lines.next().trim)
        }
        line = acc.toString
      }
      line match {
        case DeclareRe(kind, name, quoted, bare) =>
          val v = Option(quoted).getOrElse(bare)
          if (kind.equalsIgnoreCase("declare")) params(name) = v
          else defaults(name) = v
        case StreamDefineRe(alias, cmd, clauses) =>
          streamCmds(alias) = streamReplacement(cmd, clauses)
        case bad if StreamDefineOpenRe.findFirstIn(bad).isDefined =>
          // it opened as a stream DEFINE (backtick command) but never
          // parsed as one — unbalanced clause parens, a missing `;`,
          // an unterminated command. Falling through silently fed the
          // parser garbage (ADVICE r15); diagnose at the source.
          sys.error("malformed stream DEFINE (unbalanced clauses or " +
            s"missing terminating ';'?): ${bad.trim.take(160)}")
        case DefineFuncRe(alias, target) =>
          funcAliases(alias) = target
        case MacroStartRe(name, ps, ret) =>
          // brace-depth-aware: a NESTED macro definition inside the
          // body keeps its own braces and is re-expanded recursively
          // after this macro's call site is substituted
          val body = new StringBuilder
          var braceDepth = 1
          while (braceDepth > 0 && lines.hasNext) {
            val l = lines.next()
            if (MacroStartRe.findFirstIn(l).isDefined) braceDepth += 1
            if (l.trim.startsWith("}")) braceDepth -= 1
            if (braceDepth > 0) body.append(l).append("\n")
          }
          macros(name) = Macro(
            ps.split(",").map(_.trim).filter(_.nonEmpty).toList, ret, body.toString)
        case _ => kept.append(line).append("\n")
      }
    }

    // pass 2: expand macro calls — iterated to a fixpoint so a macro
    // BODY may call other top-level macros (Pig supports macros
    // invoking macros; a single pass left the inner call unexpanded —
    // r15 review). Nested DEFINITIONS take the recursive route below.
    var counter = 0
    var expanded = kept.toString
    var changedPass = true
    var passes = 0
    while (changedPass && passes < 8) {
      changedPass = false
      passes += 1
      expanded = expanded.split("\n", -1).map { line =>
      line match {
        case MacroCallRe(out, name, args) if macros.contains(name) =>
          counter += 1
          changedPass = true
          val m = macros(name)
          val argv = args.split(",").map(_.trim).filter(_.nonEmpty).toList
          require(argv.size == m.params.size,
            s"macro $name expects ${m.params.size} args, got ${argv.size}")
          var body = m.body
          // hygiene: rename internal aliases (everything assigned in the
          // body except the RETURNS alias) AND nested macro-definition
          // names, so two call sites of this macro can't cross-wire
          // their nested copies when the recursive pass collects them
          val nestedNames = """(?i)define\s+(\w+)\s*\(""".r
            .findAllMatchIn(m.body).map(_.group(1)).toSet
          val internal = AssignRe.findAllMatchIn(m.body).map(_.group(1)).toSet ++
            nestedNames - m.returns
          internal.foreach { a =>
            body = body.replaceAll(s"\\b$a\\b", s"${a}_m$counter")
          }
          m.params.zip(argv).foreach { case (p, v) =>
            body = body.replaceAll(s"\\$$$p\\b", java.util.regex.Matcher.quoteReplacement(v))
          }
          // Pig's documented body form is `$ret = …` — consume the `$`
          // too, or the substitution leaves un-lexable `$alias` text
          // (bare `ret = …` is also accepted; r15 review)
          body.replaceAll(s"\\$$?\\b${m.returns}\\b", out)
        case other => other
      }
      }.mkString("\n")
    }
    require(!changedPass || passes < 8,
      "macro call expansion exceeded 8 passes — mutually recursive macros?")

    // pass 3: parameter + function-alias substitution
    var out = expanded
    (defaults ++ params).foreach { case (k, v) =>
      out = out.replaceAll(s"\\$$$k\\b", java.util.regex.Matcher.quoteReplacement(v))
    }
    funcAliases.foreach { case (a, t) =>
      out = out.replaceAll(s"\\b$a\\s*\\(", java.util.regex.Matcher.quoteReplacement(t) + "(")
    }
    // DEFINE'd stream commands expand at their THROUGH site — the
    // THROUGH keyword matches case-insensitively but the ALIAS is
    // case-sensitive (Pig aliases are; the sibling funcAliases
    // substitution has no (?i) either)
    streamCmds.foreach { case (a, replacement) =>
      out = out.replaceAll(
        "(?i:\\bthrough\\s+)" + java.util.regex.Pattern.quote(a) + "\\b",
        java.util.regex.Matcher.quoteReplacement(s"THROUGH $replacement"))
    }
    // nested macro definitions surfaced by this round of expansion are
    // collected and expanded by a recursive pass (bounded by `depth`)
    if (macros.nonEmpty &&
        out.linesIterator.exists(l => MacroStartRe.findFirstIn(l).isDefined))
      expand(out, depth + 1)
    else out
  }
}
