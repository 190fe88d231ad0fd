package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute,
  AttributeMap, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.optimizer.CollapseProject
import org.apache.spark.sql.catalyst.plans.logical.{Expand, LogicalPlan,
  Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DataType

/** Rewrite a union of literal-tagged slices of ONE source into a single
  * `Expand` — the reference's melt-by-loop anti-pattern compiled to the
  * plan `unpivot` would have produced.
  *
  * The shape (ref: src/15_integrate_sider.py:61-70, SURVEY §2.8 R2): the
  * integrator discovers label columns at runtime and builds one slice per
  * label —
  *
  * {{{
  *   for label in labels:
  *       slices.append(df.select(ids, lit(label).as("label"),
  *                               col(label).as("value")))
  *   out = union_all(slices)
  * }}}
  *
  * Executed literally that is |labels| scans of the same source plus a
  * union; `Expand` (what `Dataset.unpivot` compiles to) emits the same
  * multiset of rows from ONE scan with zero exchanges. `SiderAdapter`
  * hand-writes the good plan; this rule gives naive user code the same
  * plan automatically.
  *
  * Match conditions, all required:
  *   - flat union (bag semantics, not byName) of ≥2 branches, each a
  *     single `Project` (after `CollapseProject`, so analyzer-inserted
  *     coercion projects collapse) or an `Expand` already produced by
  *     this rule (the incremental `acc = acc.union(slice)` loop analyzes
  *     each step eagerly, so later steps see the previous rewrite);
  *   - every branch child is canonically the SAME plan (the analyzer's
  *     relation dedup re-aliases exprIds per branch; canonical equality
  *     sees through that), and fully deterministic — collapsing N scans
  *     of a nondeterministic source into one is not semantics-preserving.
  *
  * A union WITHOUT a literal discriminator also rewrites, but only
  * when the branches reference pairwise-DISJOINT child columns — the
  * pooled-measures shape (`r6_stacked_measures`: one slice per measure
  * column), where collapsing N passes over the fact table into one
  * Expand scan reads each referenced column once. The disjointness
  * guard tracks the actual benefit: overlapping-reference self-unions
  * (edge symmetrization `e.select(a,b) union e.select(b,a)`, plain
  * `df union df`) re-read the SAME columns, so there is no scan to
  * save — and rewriting them blocks downstream union optimizations
  * (`PushDistinctThroughUnion`), measured as a 2.6× regression on the
  * graph-components path before this guard existed. The rewrite stays
  * semantics-preserving in all these cases; the guard is purely a
  * cost decision.
  *
  * The rewrite re-bases each branch's projection onto the first branch's
  * child (positional attribute map, justified by canonical equality) and
  * emits `Expand(projections, union.output, base)`. Union output keeps
  * the head branch's exprIds with merged nullability, so every parent
  * reference stays valid. Per input row Expand emits one row per
  * projection — exactly the union-of-slices multiset; no ordering
  * guarantee is lost because union never had one.
  *
  * Injection: `GraftExtensions.injectPostHocResolutionRule` — the rule
  * must run BEFORE column pruning, which would otherwise specialise each
  * branch's scan to its own label column and break canonical equality of
  * the children. The `GraftSession.local` fallback path (pre-existing
  * session, no analyzer hook) adds it to `extraOptimizations` as best
  * effort: it still fires when the branches survive the main optimizer
  * batches unspecialised (e.g. local relations), and silently no-ops
  * otherwise — the rewrite is a plan improvement, never a correctness
  * requirement. `Melt.rewrite(df)` applies it explicitly for callers on
  * an un-extended session.
  */
object MeltUnionToExpand extends Rule[LogicalPlan] {

  private def flatten(p: LogicalPlan): Seq[LogicalPlan] = p match {
    case Union(cs, false, false) => cs.flatMap(flatten)
    case other => Seq(other)
  }

  private def stripAlias(e: NamedExpression): Expression = e match {
    case a: Alias => a.child
    case other => other
  }

  /** One (projection, child) per emitted row-shape of the branch. Only
    * a branch that is already a Project/Expand at the top can collapse
    * to one, so anything else skips the (whole-subtree) CollapseProject
    * — every analyzed Union pays this probe, and most are not melts.
    *
    * `Project(list, Expand(...))` composes the projection through the
    * Expand (each Expand projection substituted for its output
    * attribute in `list`): this is the restore-Project the rewrite
    * itself emits when the head branch projected a bare attribute
    * (see the Expand-invariant comment below), so without this case
    * the bare-attribute INCREMENTAL loop `acc = acc.union(slice)` —
    * whose intermediate steps analyze eagerly — stopped folding after
    * the first rewrite (NOTES r9 #2: correct, just unfused). Both
    * sides are checked deterministic by the caller, so duplicating a
    * composed expression into several projections is sound.
    */
  private def slices(p: LogicalPlan): Option[Seq[(Seq[Expression], LogicalPlan)]] =
    p match {
      case _: Project | _: Expand =>
        CollapseProject(p) match {
          case Project(list, Expand(projs, eout, child)) =>
            val idx = AttributeMap(eout.zipWithIndex)
            Some(projs.map(pr => (list.map(e => stripAlias(e).transform {
              case a: Attribute if idx.contains(a) => pr(idx(a))
            }), child)))
          case Project(list, child) =>
            Some(Seq((list.map(stripAlias), child)))
          case Expand(projs, _, child) => Some(projs.map(es => (es, child)))
          case _ => None
        }
      case _ => None
    }

  private def deterministicPlan(p: LogicalPlan): Boolean =
    p.find(n => n.expressions.exists(e =>
      e.find(!_.deterministic).isDefined)).isEmpty

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case u @ Union(_, false, false) =>
      val branches = flatten(u)
      val extracted =
        if (branches.size < 2) None
        else {
          val sls = branches.map(slices)
          if (sls.contains(None)) None else Some(sls.flatMap(_.get))
        }
      extracted match {
        case Some(all) if all.size >= 2 =>
          val n = u.output.length
          val base = all.head._2
          // schema equality is a cheap reject (a non-melt union of
          // different sources fails here) before the expensive
          // full-tree canonicalization
          val shapeOk = all.forall { case (es, c) =>
            es.length == n && c.schema == base.schema
          } && all.forall { case (_, c) =>
            (c eq base) || c.canonicalized == base.canonicalized
          } && deterministicPlan(base) &&
            all.forall(_._1.forall(_.deterministic))
          if (!shapeOk) u
          else {
            val rebased = all.map { case (es, c) =>
              if (c.output == base.output) es
              else {
                val m = AttributeMap(c.output.zip(base.output))
                es.map(_.transform { case a: Attribute => m.getOrElse(a, a) })
              }
            }
            val hasLabel = (0 until n).exists { i =>
              val pos = rebased.map(_(i))
              pos.forall(_.isInstanceOf[Literal]) && pos.distinct.size >= 2
            }
            // no-label unions only when branches slice DISJOINT child
            // columns (the pooled-measures shape) — see the scaladoc's
            // cost rationale
            val disjointRefs = {
              val sets = rebased.map(_.flatMap(_.collect {
                case a: Attribute => a.exprId
              }).toSet)
              sets.map(_.size).sum == sets.reduce(_ union _).size
            }
            val typesOk = rebased.forall(_.zip(u.output).forall {
              case (e, a) => DataType.equalsStructurally(
                e.dataType, a.dataType, ignoreNullability = true)
            })
            if ((hasLabel || disjointRefs) && typesOk) {
              // Expand invariant: an output attribute that shares a child
              // exprId is assumed (by e.g. PushPredicateThroughNonJoin) to
              // be emitted UNCHANGED by every projection — pushing a parent
              // filter below the Expand is only sound then. When the head
              // branch projects a bare attribute at a position where other
              // branches project something else, u.output(i) reuses the
              // child exprId but the invariant does not hold; emit a fresh
              // attribute there and restore the original exprId with a
              // trivial Project so parent references stay valid.
              val baseIds = base.outputSet
              val violated = (0 until n).filter { i =>
                baseIds.contains(u.output(i)) &&
                  rebased.exists(r => r(i) match {
                    case a: Attribute => a.exprId != u.output(i).exprId
                    case _ => true
                  })
              }.toSet
              if (violated.isEmpty) Expand(rebased, u.output, base)
              else {
                val expandOut = u.output.zipWithIndex.map { case (a, i) =>
                  if (violated(i)) a.newInstance() else a
                }
                val restore = expandOut.zipWithIndex.map { case (a, i) =>
                  if (violated(i)) {
                    val orig = u.output(i)
                    Alias(a, orig.name)(
                      exprId = orig.exprId, qualifier = orig.qualifier)
                  } else a
                }
                Project(restore, Expand(rebased, expandOut, base))
              }
            } else u
          }
        case _ => u
      }
  }
}

/** Explicit entry point for sessions without the analyzer hook (e.g. a
  * pre-existing session GraftExtensions could not retrofit): applies
  * [[MeltUnionToExpand]] to the frame's analyzed plan. No-op (returns an
  * equivalent frame) when the plan doesn't match.
  */
object Melt {
  def rewrite(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.graftbridge.Bridge.ofRows(
      df.sparkSession, MeltUnionToExpand(df.queryExecution.analyzed))
}
