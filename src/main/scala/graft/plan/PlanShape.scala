package graft.plan

import graft.ql._

/** dp3-style logical plan rendering — the same s-expression surface the
  * reference's planner prints and golden-tests (reference:
  * server/plan/plan.go Node.String, server/plan/plan_test.go:66-249).
  *
  * This is a LOGICAL description: it expands per-producer subtrees the
  * way the reference's compiler does, while the DataFrame compiler
  * (Planner) executes the equivalent producer-pruned single plan. The
  * renderer exists so the reference's plan-shape expectations can be
  * asserted verbatim against our front-end (parsing, alias resolution,
  * predicate splitting, flattening, paging wrap).
  */
object PlanShape {

  def render(q: Query, producers: Seq[String], db: String = "db")
      : String = {
    val topics = Planner.collectTopics(q.select)
    Planner.splitWhere(q.where,
      topics.map { case (t, a) => a.getOrElse(t) }.toSet)
    val children = producers.flatMap(p => renderChildren(q, p, q.select))
    val root =
      if (children.size == 1) children.head
      else {
        val d = if (q.descending) "desc " else ""
        s"[merge $d${children.mkString(" ")}]"
      }
    val withOffset = q.offset match {
      case Some(o) => s"[offset $o $root]"
      case None    => root
    }
    q.limit match {
      case Some(n) => s"[limit $n $withOffset]"
      case None    => withOffset
    }
  }

  /** merge nodes flatten (reference: plan.go:574-591); entities and
    * as-of joins are leaves of the outer merge */
  private def renderChildren(q: Query, producer: String, sel: Select)
      : Seq[String] = sel match {
    case MergeSel(l, r) =>
      renderChildren(q, producer, l) ++ renderChildren(q, producer, r)
    case e: Entity  => Seq(renderScan(q, producer, e))
    case a: AsofSel => Seq(renderAsof(q, producer, a))
  }

  private def renderScan(q: Query, producer: String, e: Entity): String = {
    val alias = e.alias.map(a => s" $a").getOrElse("")
    val range = q.between match {
      case Some((s, t)) => s"$s $t"
      case None         => "all-time"
    }
    val d = if (q.descending) "desc " else ""
    val where = Planner
      .whereFor(q.where, e.alias.getOrElse(e.topic))
      .map(w => s" ${renderExpr(w)}").getOrElse("")
    s"[scan $d(${e.topic}$alias db $producer $range)$where]"
  }

  private def renderAsof(q: Query, producer: String, a: AsofSel)
      : String = {
    val dir = a.dir match {
      case Precedes  => "precedes"
      case Succeeds  => "succeeds"
      case Neighbors => "neighbors"
    }
    val mode = if (a.immediate) "immediate" else "full"
    val constraint = a.constraint
      .map { case (n, unit) => s" $unit $n" }.getOrElse("")
    val l = renderChildren(q, producer, a.left).mkString(" ")
    val r = renderChildren(q, producer, a.right).mkString(" ")
    s"[asof ($dir $mode$constraint) $l $r]"
  }

  private def renderExpr(e: Expr): String = e match {
    case Cmp(a, f, op, v) => s"[binexp [${op.sym} $a.$f ${renderLit(v)}]]"
    case AndExpr(cs)  => s"[and ${cs.map(renderExpr).mkString(" ")}]"
    case OrExpr(ds)   => s"[or ${ds.map(renderExpr).mkString(" ")}]"
    case GroupExpr(i) => renderExpr(i)
  }

  /** literal rendering mirrors reference Value.String
    * (server/ql/grammar.go:158-170): floats via %f */
  private def renderLit(l: Lit): String = l match {
    case IntLit(v)   => v.toString
    case FloatLit(v) => f"$v%f"
    case StrLit(v)   => v
    case BoolLit(v)  => v.toString
  }
}
