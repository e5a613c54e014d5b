package graft.piglatin

import Ast._
import Lexer._

/** Recursive-descent parser for the Pig Latin subset (grammar shape per
  * the reference's ANTLR grammar
  * [R: src/org/apache/pig/parser/QueryParser.g]). Statements end with
  * ';'. Keywords are case-insensitive.
  */
object Parser {

  final case class ParseError(msg: String) extends RuntimeException(msg)

  def parse(src: String): Either[String, List[Stmt]] =
    Lexer.tokenize(src) match {
      case Left(e) => Left(e)
      case Right(toks) =>
        try Right(new Parser(toks).program())
        catch { case ParseError(m) => Left(m) }
    }

  private final class Parser(toks: Vector[Tok]) {
    private var p = 0
    private def cur: Tok = toks(p)
    private def advance(): Tok = { val t = cur; p += 1; t }
    private def fail(msg: String): Nothing =
      throw ParseError(s"$msg at offset ${cur.pos} (token $cur)")

    private def isKw(t: Tok, kw: String): Boolean = t match {
      case Ident(s, _) => s.equalsIgnoreCase(kw); case _ => false
    }
    private def atKw(kw: String): Boolean = isKw(cur, kw)
    private def eatKw(kw: String): Unit =
      if (atKw(kw)) p += 1 else fail(s"expected $kw")
    private def tryKw(kw: String): Boolean =
      if (atKw(kw)) { p += 1; true } else false
    private def atSym(s: String): Boolean = cur match {
      case Sym(x, _) => x == s; case _ => false
    }
    private def eatSym(s: String): Unit =
      if (atSym(s)) p += 1 else fail(s"expected '$s'")
    private def trySym(s: String): Boolean =
      if (atSym(s)) { p += 1; true } else false
    private def ident(): String = cur match {
      case Ident(s, _) => p += 1; s
      case _ => fail("expected identifier")
    }
    private def str(): String = cur match {
      case StrLit(s, _) => p += 1; s
      case _ => fail("expected string literal")
    }

    def program(): List[Stmt] = {
      val stmts = List.newBuilder[Stmt]
      while (!cur.isInstanceOf[Eof]) {
        stmts += statement()
        while (trySym(";")) ()
      }
      stmts.result()
    }

    private def statement(): Stmt = {
      if (atKw("store")) { eatKw("store"); val a = ident(); eatKw("into"); val path = str()
        val using = if (tryKw("using")) Some(funcSpec()) else None
        StoreStmt(a, path, using)
      }
      else if (atKw("dump")) { eatKw("dump"); DumpStmt(ident()) }
      else if (atKw("describe")) { eatKw("describe"); DescribeStmt(ident()) }
      else if (atKw("explain")) { eatKw("explain"); ExplainStmt(ident()) }
      else if (atKw("illustrate")) { eatKw("illustrate"); IllustrateStmt(ident()) }
      else if (atKw("split")) splitStmt()
      // spork's CACHE statement; `cache = …` (an alias named cache at an
      // assign) is disambiguated by the following token not being an ident
      else if (atKw("cache") && toks.lift(p + 1).exists(_.isInstanceOf[Ident])) {
        eatKw("cache"); CacheStmt(ident())
      }
      else if (atKw("assert")) { eatKw("assert"); val a = ident(); eatKw("by"); val c = expr()
        val msg = if (trySym(",")) Some(str()) else None
        AssertStmt(a, c, msg)
      }
      else {
        val alias = ident()
        eatSym("=")
        Assign(alias, relOp())
      }
    }

    private def splitStmt(): Stmt = {
      eatKw("split"); val in = ident(); eatKw("into")
      val branches = List.newBuilder[(String, Expr)]
      var otherwise: Option[String] = None
      var done = false
      while (!done) {
        val a = ident()
        if (tryKw("if")) branches += ((a, expr()))
        else fail("expected IF")
        if (trySym(",")) {
          if (atKw("otherwise") || peekIsOtherwiseBranch()) {
            // 'name OTHERWISE' form
            val save = p
            val name = ident()
            if (tryKw("otherwise")) { otherwise = Some(name); done = true }
            else { p = save }
          }
        } else done = true
      }
      SplitStmt(in, branches.result(), otherwise)
    }

    private def peekIsOtherwiseBranch(): Boolean = {
      toks.lift(p + 1).exists(t => isKw(t, "otherwise"))
    }

    private def funcSpec(): FuncCall = {
      val name = ident()
      val args = if (trySym("(")) {
        val as = List.newBuilder[Expr]
        if (!atSym(")")) { as += expr(); while (trySym(",")) as += expr() }
        eatSym(")")
        as.result()
      } else Nil
      FuncCall(name, args)
    }

    // ------------------------------------------------------------ operators

    private def relOp(): RelOp = {
      if (atKw("load")) { eatKw("load"); val path = str()
        val using = if (tryKw("using")) Some(funcSpec()) else None
        val schema = if (tryKw("as")) Some(schemaSpec()) else None
        Load(path, using, schema)
      }
      else if (atKw("filter")) { eatKw("filter"); val in = ident(); eatKw("by"); FilterOp(in, expr()) }
      else if (atKw("foreach")) { eatKw("foreach"); val in = ident()
        if (atSym("{")) {
          eatSym("{")
          val inner = List.newBuilder[(String, NestedOp)]
          while (!atKw("generate")) {
            val a = ident(); eatSym("=")
            val op: NestedOp =
              if (tryKw("filter")) { val i = ident(); eatKw("by"); NFilter(i, expr()) }
              else if (tryKw("order")) { val i = ident(); eatKw("by")
                val ks = List.newBuilder[(String, Boolean)]
                def one(): Unit = {
                  val f = ident()
                  val asc = if (tryKw("desc")) false else { tryKw("asc"); true }
                  ks += ((f, asc))
                }
                one(); while (trySym(",")) one()
                NOrder(i, ks.result())
              }
              else if (tryKw("limit")) { val i = ident()
                cur match {
                  case NumLit(v: Int, _) => p += 1; NLimit(i, v)
                  case NumLit(v: Long, _) => p += 1; NLimit(i, v.toInt)
                  case _ => fail("expected nested LIMIT count")
                }
              }
              else if (tryKw("distinct")) NDistinct(ident())
              else { // projection: alias = rel.field;
                val i = ident(); eatSym("."); NProj(i, ident())
              }
            inner += ((a, op))
            while (trySym(";")) ()
          }
          eatKw("generate")
          val gens = genItems()
          while (trySym(";")) ()
          eatSym("}")
          ForeachNestedOp(in, inner.result(), gens)
        } else { eatKw("generate"); ForeachOp(in, genItems()) }
      }
      else if (atKw("cube")) { eatKw("cube"); val in = ident(); eatKw("by")
        def clause(): (String, List[Expr]) = {
          val mode =
            if (tryKw("cube")) "cube"
            else if (tryKw("rollup")) "rollup"
            else fail("expected CUBE or ROLLUP after BY")
          eatSym("(")
          val ds = List.newBuilder[Expr]
          ds += expr(); while (trySym(",")) ds += expr()
          eatSym(")")
          (mode, ds.result())
        }
        val cs = List.newBuilder[(String, List[Expr])]
        cs += clause()
        while (trySym(",")) cs += clause()
        CubeOp(in, cs.result())
      }
      else if (atKw("stream")) { eatKw("stream"); val in = ident(); eatKw("through")
        val cmd = cur match {
          case Backtick(s, _) => p += 1; s
          case StrLit(s, _) => p += 1; s // DEFINE'd commands expand to strings
          case _ => fail("expected `command` after THROUGH")
        }
        // serializer clauses (DEFINE-site in Pig; the preprocessor
        // lowers them here, and inline is accepted too):
        // INPUT(stdin [USING PigStreaming('d')]) / OUTPUT(stdout ...)
        var inDelim = "\t"; var outDelim = "\t"
        def serializerDelim(): String = {
          eatSym("(")
          ident() // stdin / stdout
          val d = if (tryKw("using")) {
            val ser = ident()
            if (!ser.equalsIgnoreCase("PigStreaming"))
              fail(s"unsupported stream serializer $ser — PigStreaming is the supported subset")
            eatSym("(")
            val dl = if (atSym(")")) "\t" else str()
            eatSym(")")
            dl
          } else "\t"
          eatSym(")")
          d
        }
        var more = true
        while (more) {
          if (tryKw("input")) inDelim = serializerDelim()
          else if (tryKw("output")) outDelim = serializerDelim()
          else more = false
        }
        val schema = if (tryKw("as")) Some(schemaSpec()) else None
        StreamOp(in, cmd, schema, inDelim, outDelim)
      }
      else if (atKw("group") || atKw("cogroup")) { p += 1
        val first = groupInput()
        if (first._2.isEmpty) GroupOp(List(first), all = true)
        else {
          val inputs = List.newBuilder[(String, List[Expr])]
          inputs += first
          while (trySym(",")) inputs += groupInput()
          // USING 'collected' (GROUP) / 'merge' (COGROUP): physical
          // hints only — same result, shuffle elided by Catalyst when
          // the input is already partitioned by the key
          val using = if (tryKw("using")) {
            val h = str().toLowerCase
            if (h != "collected" && h != "merge")
              fail(s"unsupported GROUP hint '$h' (collected|merge)")
            Some(h)
          } else None
          GroupOp(inputs.result(), all = false, using)
        }
      }
      else if (atKw("join")) { eatKw("join")
        val inputs = List.newBuilder[(String, List[Expr])]
        inputs += joinInput()
        var outer: Option[String] = None
        // A BY k [LEFT|RIGHT|FULL] [OUTER], B BY k2
        if (atKw("left") || atKw("right") || atKw("full")) {
          outer = Some(ident().toLowerCase); tryKw("outer")
        }
        while (trySym(",")) inputs += joinInput()
        val using = if (tryKw("using")) Some(str().toLowerCase) else None
        JoinOp(inputs.result(), outer, using)
      }
      else if (atKw("cross")) { eatKw("cross")
        val ins = List.newBuilder[String]; ins += ident()
        while (trySym(",")) ins += ident()
        CrossOp(ins.result())
      }
      else if (atKw("order")) { eatKw("order"); val in = ident(); eatKw("by")
        val keys = sortKeys()
        // USING comparator — Pig accepts a function name; a quoted string
        // is also tolerated for symmetry with JOIN's USING clause
        val using = if (tryKw("using")) Some(cur match {
          case StrLit(s, _) => p += 1; s
          case _ => ident()
        }) else None
        OrderOp(in, keys, using)
      }
      else if (atKw("rank")) { eatKw("rank"); val in = ident()
        if (tryKw("by")) {
          val keys = sortKeys()
          val dense = tryKw("dense")
          RankOp(in, keys, dense)
        } else RankOp(in, Nil, dense = false)
      }
      else if (atKw("limit")) { eatKw("limit"); val in = ident(); LimitOp(in, expr()) }
      else if (atKw("distinct")) { eatKw("distinct"); DistinctOp(ident()) }
      else if (atKw("union")) { eatKw("union")
        val onSchema = tryKw("onschema")
        val ins = List.newBuilder[String]; ins += ident()
        while (trySym(",")) ins += ident()
        UnionOp(ins.result(), onSchema)
      }
      else if (atKw("sample")) { eatKw("sample"); val in = ident()
        cur match {
          case NumLit(v, _) => p += 1; SampleOp(in, v match {
            case d: Double => d; case f: Float => f.toDouble
            case i: Int => i.toDouble; case l: Long => l.toDouble
          })
          case _ => fail("expected sample probability")
        }
      }
      // spork relational form: b = CACHE a; (a bare `x = cache;` alias
      // copy still parses — the next token is not an ident then)
      else if (atKw("cache") && toks.lift(p + 1).exists(_.isInstanceOf[Ident])) {
        eatKw("cache"); CacheOp(ident())
      }
      else AliasRef(ident())
    }

    private def groupInput(): (String, List[Expr]) = {
      val in = ident()
      if (tryKw("all")) (in, Nil)
      else { eatKw("by"); (in, keyList()) }
    }

    private def joinInput(): (String, List[Expr]) = {
      val in = ident(); eatKw("by"); (in, keyList())
    }

    private def keyList(): List[Expr] = {
      if (trySym("(")) {
        val ks = List.newBuilder[Expr]; ks += expr()
        while (trySym(",")) ks += expr()
        eatSym(")")
        ks.result()
      } else List(expr())
    }

    private def sortKeys(): List[(Expr, Boolean)] = {
      val ks = List.newBuilder[(Expr, Boolean)]
      def one(): Unit = {
        val e = expr()
        val asc = if (tryKw("desc")) false else { tryKw("asc"); true }
        ks += ((e, asc))
      }
      one(); while (trySym(",")) one()
      ks.result()
    }

    private def genItems(): List[GenItem] = {
      val items = List.newBuilder[GenItem]
      def one(): Unit = {
        // project-range `a..b` (open at either end); no alias/flatten —
        // the range expands to the underlying columns under their names
        if (atSym("..")) {
          p += 1
          items += GenItem(RangeProj(None, Some(expr())), None, flatten = false)
          return
        }
        val flat = if (atKw("flatten")) { p += 1; eatSym("("); true } else false
        val e = expr()
        if (flat) eatSym(")")
        if (!flat && atSym("..")) {
          p += 1
          val to =
            if (atSym(",") || atSym(";") || atSym("}") || cur.isInstanceOf[Eof]) None
            else Some(expr())
          items += GenItem(RangeProj(Some(e), to), None, flatten = false)
          return
        }
        // AS name | AS (name:type) | AS (a, b, …) — the multi-name
        // parenthesized form is the standard Pig idiom after
        // FLATTEN(tuple) and used to fail at the first comma (r17
        // review); one name folds into `alias`, several into `aliases`
        val (alias, aliases) = if (tryKw("as")) {
          if (trySym("(")) {
            val ns = List.newBuilder[String]
            def oneName(): Unit = { val n = ident(); if (trySym(":")) ident(); ns += n }
            oneName(); while (trySym(",")) oneName()
            eatSym(")")
            ns.result() match {
              case n :: Nil => (Some(n), Nil)
              case many => (None, many)
            }
          } else { val n = ident(); if (trySym(":")) ident(); (Some(n), Nil) }
        } else (None, Nil)
        items += GenItem(e, alias, flat, aliases)
      }
      one(); while (trySym(",")) one()
      items.result()
    }

    private def schemaSpec(): List[FieldDef] = {
      eatSym("(")
      val fs = List.newBuilder[FieldDef]
      def one(): Unit = {
        val n = ident()
        val t = if (trySym(":")) Some(ident().toLowerCase) else None
        fs += FieldDef(n, t)
      }
      one(); while (trySym(",")) one()
      eatSym(")")
      fs.result()
    }

    // ----------------------------------------------------------- expressions

    private val types = Set("int", "long", "float", "double", "chararray",
      "bytearray", "boolean", "datetime", "biginteger", "bigdecimal")

    def expr(): Expr = orExpr()

    private def orExpr(): Expr = {
      var l = andExpr()
      while (atKw("or")) { p += 1; l = Or(l, andExpr()) }
      l
    }

    private def andExpr(): Expr = {
      var l = notExpr()
      while (atKw("and")) { p += 1; l = And(l, notExpr()) }
      l
    }

    private def notExpr(): Expr =
      if (atKw("not")) { p += 1; Not(notExpr()) } else cmpExpr()

    private def cmpExpr(): Expr = {
      val l = addExpr()
      if (atSym("==") || atSym("!=") || atSym("<") || atSym("<=") || atSym(">") || atSym(">=")) {
        val op = advance().asInstanceOf[Sym].s
        val r = addExpr()
        condSuffix(Cmp(op, l, r))
      }
      else if (atKw("matches")) { p += 1
        val pat = str()
        condSuffix(Cmp("matches", l, Lit(pat)))
      }
      else if (atKw("is")) { p += 1
        val neg = tryKw("not"); eatKw("null")
        condSuffix(IsNull(l, neg))
      }
      else if (atKw("in")) { p += 1
        // x IN (v1, v2, …) — Pig 0.12 membership sugar for ==-chains
        eatSym("(")
        val vs = List.newBuilder[Expr]
        vs += expr(); while (trySym(",")) vs += expr()
        eatSym(")")
        condSuffix(vs.result().map(v => Cmp("==", l, v): Expr).reduce(Or(_, _)))
      }
      else condSuffix(l)
    }

    // `cond ? a : b`
    private def condSuffix(e: Expr): Expr =
      if (trySym("?")) {
        val t = expr(); eatSym(":"); val f = expr()
        BinCond(e, t, f)
      } else e

    private def addExpr(): Expr = {
      var l = mulExpr()
      while (atSym("+") || atSym("-")) {
        val op = advance().asInstanceOf[Sym].s
        l = Arith(op, l, mulExpr())
      }
      l
    }

    private def mulExpr(): Expr = {
      var l = unary()
      while (atSym("*") || atSym("/") || atSym("%")) {
        val op = advance().asInstanceOf[Sym].s
        l = Arith(op, l, unary())
      }
      l
    }

    private def unary(): Expr = {
      if (atSym("-")) { p += 1; Neg(unary()) }
      else if (atSym("(")) {
        // cast or parenthesized expr
        eatSym("(")
        cur match {
          case Ident(t, _) if types.contains(t.toLowerCase) && toks.lift(p + 1).exists {
            case Sym(")", _) => true; case _ => false
          } =>
            val typ = ident().toLowerCase; eatSym(")")
            CastE(typ, unary())
          case _ =>
            val e = expr(); eatSym(")")
            postfix(e)
        }
      }
      else postfix(primary())
    }

    private def postfix(e0: Expr): Expr = {
      var e = e0
      var continue = true
      while (continue) {
        if (atSym(".")) { p += 1; e = Deref(e, ident()) }
        else if (atSym("#")) { p += 1; e = MapLookup(e, str()) }
        else continue = false
      }
      e
    }

    private def primary(): Expr = cur match {
      case NumLit(v, _) => p += 1; Lit(v)
      case StrLit(s, _) => p += 1; Lit(s)
      case Dollar(i, _) => p += 1; PosRef(i)
      case Sym("*", _) => p += 1; Star
      case Ident(s, _) if s.equalsIgnoreCase("null") => p += 1; NullLit
      case Ident(s, _) if s.equalsIgnoreCase("true") => p += 1; Lit(true)
      case Ident(s, _) if s.equalsIgnoreCase("false") => p += 1; Lit(false)
      case Ident(s, _) if s.equalsIgnoreCase("case") => caseExpr()
      case Ident(_, _) =>
        val name = ident()
        val full = if (trySym("::")) name + "::" + ident() else name
        if (atSym("(")) {
          eatSym("(")
          val args = List.newBuilder[Expr]
          if (!atSym(")")) { args += expr(); while (trySym(",")) args += expr() }
          eatSym(")")
          FuncCall(full, args.result())
        } else FieldRef(full)
      case t => fail(s"unexpected token $t")
    }

    private def caseExpr(): Expr = {
      eatKw("case")
      // searched form: CASE WHEN c THEN v … ; simple form: CASE x WHEN
      // v THEN r … — the latter desugars to ==-comparisons on x
      val scrutinee = if (atKw("when")) None else Some(expr())
      val branches = List.newBuilder[(Expr, Expr)]
      while (atKw("when")) {
        eatKw("when")
        val c = expr()
        eatKw("then")
        val cond = scrutinee.map(s => Cmp("==", s, c): Expr).getOrElse(c)
        branches += ((cond, expr()))
      }
      val other = if (tryKw("else")) Some(expr()) else None
      eatKw("end")
      CaseWhen(branches.result(), other)
    }
  }
}
