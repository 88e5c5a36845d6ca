package graft.ql

/** AST for the dp3 query language, re-expressed as Scala ADTs.
  *
  * Shape mirrors the reference grammar (reference:
  * server/ql/grammar.go:39-188): a statement is either a query
  * (`[explain] from <producers|*> [between a and b] <select> [where e]
  * [desc] [limit n] [offset n];`) or a `truncate` statement. The select
  * clause is a right-nested chain of entities combined with `,` (ordered
  * merge) or `precedes`/`succeeds` (as-of join).
  */
sealed trait Statement

final case class TruncateStmt(
    producer: String,
    topic: String,
    /** None = "now". Otherwise epoch nanoseconds. */
    asOf: Option[Long]
) extends Statement

final case class Query(
    explain: Boolean,
    from: FromClause,
    /** [startNs, endNs) — absent means all time. */
    between: Option[(Long, Long)],
    select: Select,
    where: Option[Expr],
    descending: Boolean,
    limit: Option[Long],
    offset: Option[Long]
) extends Statement

sealed trait FromClause
case object AllProducers extends FromClause
final case class ProducerList(names: Seq[String]) extends FromClause

sealed trait Select
/** A single topic scan, with optional alias (reference grammar `Select`). */
final case class Entity(topic: String, alias: Option[String]) extends Select
/** `,` — n-ary ordered merge ("merge join"); binary in the grammar,
  * flattened by the planner (reference: server/plan/plan.go:574-591). */
final case class MergeSel(left: Select, right: Select) extends Select

sealed trait AsofDir
case object Precedes extends AsofDir
case object Succeeds extends AsofDir
/** `neighbors` — DELIBERATE EXTENSION: the reference parses the
  * keyword (server/ql/grammar.go:172) but errors at compile
  * (server/executor/executor.go:206-207). Here each right row matches
  * its NEAREST left in time on either side (ties: the earlier left),
  * within the threshold when one is given — the robotics ask the
  * reference left open (nearest sensor sample to each event).
  * `Parser.parse(_, strictParity = true)` restores the reference's
  * error for exact-parity callers. */
case object Neighbors extends AsofDir

/** `precedes`/`succeeds [immediate] ... [by less than n <unit>]`.
  * thresholdNs == 0 means unbounded (reference:
  * server/executor/asof_node.go:98). `constraint` keeps the original
  * (quantity, unit) for plan rendering — the reference carries the raw
  * pair through the plan and converts at compile
  * (server/executor/executor.go:168-184). */
final case class AsofSel(
    left: Select,
    right: Select,
    dir: AsofDir,
    immediate: Boolean,
    thresholdNs: Long,
    constraint: Option[(Long, String)] = None
) extends Select

// --- where-clause expressions -------------------------------------------

sealed trait Expr
/** Disjunction of conjunction groups — the grammar's fixed two-level
  * Or(And(...)) shape (reference: server/ql/grammar.go:77-93). */
final case class OrExpr(disjuncts: Seq[Expr]) extends Expr
final case class AndExpr(conjuncts: Seq[Expr]) extends Expr
/** A parenthesized subexpression. Single-condition groups are pulled
  * up at parse (reference collapses them, plan.go:560-571); multi-
  * condition groups stay atomic for where-splitting, so a grouped OR
  * spanning aliases is an error while a bare one splits
  * (reference: plan_test.go:30-33 vs splitExpression). */
final case class GroupExpr(inner: Expr) extends Expr

sealed trait CmpOp { def sym: String }
case object Eq extends CmpOp { val sym = "=" }
case object Neq extends CmpOp { val sym = "!=" }
case object Lt extends CmpOp { val sym = "<" }
case object Gt extends CmpOp { val sym = ">" }
case object Lte extends CmpOp { val sym = "<=" }
case object Gte extends CmpOp { val sym = ">=" }
/** `~` — NB the reference lowercases BOTH operands, so `~` is effectively
  * case-insensitive too (server/executor/expression.go:1786,1795). */
case object Regex extends CmpOp { val sym = "~" }
case object RegexI extends CmpOp { val sym = "~*" }

sealed trait Lit
final case class StrLit(v: String) extends Lit
final case class IntLit(v: Long) extends Lit
final case class FloatLit(v: Double) extends Lit
final case class BoolLit(v: Boolean) extends Lit

/** `alias.dotted.path op literal`. Alias qualification is mandatory in
  * where clauses (reference: server/plan/plan.go:297-300). */
final case class Cmp(alias: String, field: String, op: CmpOp, value: Lit)
    extends Expr
