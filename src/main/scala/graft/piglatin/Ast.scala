package graft.piglatin

/** AST for the Pig Latin subset (SURVEY.md §2.1; grammar reference
  * [R: src/org/apache/pig/parser/QueryParser.g]). The subset covers the
  * relational statements and expression forms the reference's e2e tests
  * exercise. Macros, %declare/%default and stream DEFINEs are handled
  * TEXTUALLY by [[Preprocessor]] before parsing (like Pig's own
  * parameter-substitution phase), so they have no AST nodes here; only
  * NATIVE-MR is out of scope (documented in Compiler / SURVEY §7.3).
  */
object Ast {

  // ---------------------------------------------------------------- schema
  final case class FieldDef(name: String, typ: Option[String])

  // ------------------------------------------------------------ expressions
  sealed trait Expr
  final case class Lit(value: Any) extends Expr
  case object NullLit extends Expr
  final case class FieldRef(name: String) extends Expr            // name or a::b
  final case class PosRef(index: Int) extends Expr                // $0
  case object Star extends Expr                                   // *
  /** Project-range `a..b` / `$0..$3` / `..f` / `f..` in GENERATE
    * [R: src/org/apache/pig/parser/QueryParser.g col_range]; endpoints
    * are FieldRef/PosRef, None = first/last column. */
  final case class RangeProj(from: Option[Expr], to: Option[Expr]) extends Expr
  final case class Deref(base: Expr, field: String) extends Expr  // rel.f / t.f
  final case class MapLookup(base: Expr, key: String) extends Expr // m#'k'
  final case class FuncCall(name: String, args: List[Expr]) extends Expr
  final case class Neg(e: Expr) extends Expr
  final case class Arith(op: String, l: Expr, r: Expr) extends Expr // + - * / %
  final case class Cmp(op: String, l: Expr, r: Expr) extends Expr   // == != < <= > >= matches
  final case class And(l: Expr, r: Expr) extends Expr
  final case class Or(l: Expr, r: Expr) extends Expr
  final case class Not(e: Expr) extends Expr
  final case class IsNull(e: Expr, negated: Boolean) extends Expr
  final case class BinCond(c: Expr, t: Expr, f: Expr) extends Expr  // c ? a : b
  final case class CaseWhen(branches: List[(Expr, Expr)], otherwise: Option[Expr]) extends Expr
  final case class CastE(typ: String, e: Expr) extends Expr         // (int)x

  // -------------------------------------------------------------- operators
  /** One GENERATE item. `aliases` carries the multi-name
    * `AS (a, b, …)` form (used with FLATTEN of a tuple/multi-key
    * group); a single-name AS folds into `alias`. */
  final case class GenItem(expr: Expr, alias: Option[String], flatten: Boolean,
                           aliases: List[String] = Nil)

  sealed trait RelOp
  final case class Load(path: String, using: Option[FuncCall],
                        schema: Option[List[FieldDef]]) extends RelOp
  final case class FilterOp(input: String, cond: Expr) extends RelOp
  final case class ForeachOp(input: String, gens: List[GenItem]) extends RelOp

  /** FOREACH rel { nested ops; GENERATE … } — per-group bag processing
    * (SURVEY.md §2.1 #5). Inner ops transform bag-valued expressions. */
  sealed trait NestedOp
  final case class NFilter(input: String, cond: Expr) extends NestedOp
  final case class NOrder(input: String, keys: List[(String, Boolean)]) extends NestedOp
  final case class NLimit(input: String, n: Int) extends NestedOp
  final case class NDistinct(input: String) extends NestedOp
  final case class NProj(input: String, field: String) extends NestedOp
  final case class ForeachNestedOp(input: String,
                                   inner: List[(String, NestedOp)],
                                   gens: List[GenItem]) extends RelOp
  /** GROUP/COGROUP. `using` carries Pig's execution hints
    * ('collected' [R: …/relationalOperators/POCollectedGroup.java],
    * 'merge' [R: …/relationalOperators/POMergeCogroup.java]) — pure
    * physical hints with identical semantics; accepted and compiled to
    * the same groupBy, where Catalyst elides the Exchange on its own
    * whenever the input's partitioning already satisfies the key
    * (bucketed tables — see ops/Bucketed.collectedGroup). */
  final case class GroupOp(inputs: List[(String, List[Expr])], all: Boolean,
                           using: Option[String] = None) extends RelOp

  /** CUBE rel BY CUBE(dims) / ROLLUP(dims) [, …] — grouping-set
    * aggregation [R: src/org/apache/pig/newplan/logical/relational/LOCube.java].
    * Output relation binds `group` (tuple of dims) and the bag `cube`,
    * like the reference. Multiple clauses (Pig's mixed form) compile to
    * the cross product of each clause's grouping-set family. */
  final case class CubeOp(input: String,
                          clauses: List[(String, List[Expr])] // "cube"|"rollup" → dims
                         ) extends RelOp

  /** STREAM rel THROUGH `cmd` [INPUT(stdin USING PigStreaming('d'))]
    * [OUTPUT(stdout USING PigStreaming('d'))] [AS (schema)] — pipe
    * tuples through an external command
    * [R: …/relationalOperators/POStream.java]. The serializer clauses
    * are Pig's DEFINE-site INPUT/OUTPUT, lowered onto the STREAM
    * statement by the preprocessor (also accepted inline); PigStreaming
    * with a custom field delimiter is the supported serializer. */
  final case class StreamOp(input: String, cmd: String,
                            schema: Option[List[FieldDef]],
                            inDelim: String = "\t",
                            outDelim: String = "\t") extends RelOp
  final case class JoinOp(inputs: List[(String, List[Expr])],
                          outer: Option[String],   // LEFT/RIGHT/FULL
                          using: Option[String]) extends RelOp // replicated/skewed/merge
  final case class CrossOp(inputs: List[String]) extends RelOp
  /** ORDER rel BY keys [USING comparator] — `using` names a registered
    * comparator (a key transform; see PigEngine.registerComparator), the
    * analog of the reference's custom sort comparator
    * [R: …/expressionOperators/POUserComparisonFunc.java]. */
  final case class OrderOp(input: String, keys: List[(Expr, Boolean)],
                           using: Option[String] = None) extends RelOp
  final case class RankOp(input: String, keys: List[(Expr, Boolean)],
                          dense: Boolean) extends RelOp
  final case class LimitOp(input: String, n: Expr) extends RelOp
  final case class DistinctOp(input: String) extends RelOp
  final case class UnionOp(inputs: List[String], onSchema: Boolean) extends RelOp
  final case class SampleOp(input: String, p: Double) extends RelOp
  final case class AliasRef(input: String) extends RelOp // B = A;
  final case class CacheOp(input: String) extends RelOp // B = CACHE A; (spork)

  // -------------------------------------------------------------- statements
  sealed trait Stmt
  final case class Assign(alias: String, op: RelOp) extends Stmt
  final case class SplitStmt(input: String,
                             branches: List[(String, Expr)],
                             otherwise: Option[String]) extends Stmt
  final case class StoreStmt(alias: String, path: String,
                             using: Option[FuncCall]) extends Stmt
  final case class DumpStmt(alias: String) extends Stmt
  final case class DescribeStmt(alias: String) extends Stmt
  final case class ExplainStmt(alias: String) extends Stmt
  final case class IllustrateStmt(alias: String) extends Stmt
  final case class AssertStmt(alias: String, cond: Expr, msg: Option[String]) extends Stmt
  final case class CacheStmt(alias: String) extends Stmt // CACHE A; (spork)
}
