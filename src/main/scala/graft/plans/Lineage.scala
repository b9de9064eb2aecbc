package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Column-level provenance off the ANALYZED logical plan — "which
  * source table columns feed this output column": the impact-analysis
  * primitive a monitoring pipeline needs before renaming/dropping a
  * warehouse column ("who downstream breaks?"), answered from plan
  * metadata alone — no data is read.
  *
  * The walk is a bottom-up attribute-flow fold: leaf relations seed
  * each of their attributes with `table.column` (table = the scan's
  * root-path basename), and every Alias-producing node (Project,
  * Aggregate, Window, Generate) maps its new attribute to the union of
  * its referenced attributes' lineages. Nodes that only route
  * attributes (Filter, Join, Sort, Limit, …) pass the map through
  * untouched; an attribute with no traceable source (a literal
  * column, a generated id) reports an empty set — honest "derived
  * from nothing upstream".
  */
object Lineage {

  /** output column name → source `table.column` set, in the output
    * schema's order.
    */
  def columnLineage(df: DataFrame): Seq[(String, Set[String])] = {
    val plan = df.queryExecution.analyzed
    val m = walk(plan)
    plan.output.map(a => a.name -> m.getOrElse(a.exprId, Set.empty))
  }

  private def leafName(l: LeafNode): String = l match {
    case r: LogicalRelation =>
      val p = r.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          fs.location.rootPaths.headOption.map(_.getName).getOrElse("scan")
        case other => other.toString.take(20)
      }
      // "events.parquet" -> "events"
      p.split("\\.").headOption.getOrElse(p)
    case _ => l.nodeName.toLowerCase
  }

  private def fromNamed(exprs: Seq[NamedExpression],
      child: Map[ExprId, Set[String]]): Map[ExprId, Set[String]] =
    exprs.collect {
      case a: Alias =>
        a.exprId -> a.references.toSeq
          .flatMap(r => child.getOrElse(r.exprId, Set.empty[String])).toSet
    }.toMap

  private def walk(plan: LogicalPlan): Map[ExprId, Set[String]] =
    walk0(plan, Map.empty)

  /** `cteOut`: CTE def id → per-position source sets of the def's
    * output. The ANALYZED plan of a `spark.sql` query keeps CTEs as
    * WithCTE/CTERelationRef (inlining is an optimizer rule), and a
    * CTERelationRef is a LeafNode with FRESH exprIds — without this
    * context every column read through a SQL `WITH` clause would
    * report the ref itself as its source and the true table columns
    * would vanish.
    */
  private def walk0(plan: LogicalPlan,
      cteOut: Map[Long, Seq[Set[String]]]): Map[ExprId, Set[String]] =
    plan match {
      case w: WithCTE =>
        // defs may reference earlier defs — fold the context forward
        val defs = w.cteDefs.foldLeft(cteOut) { (acc, d) =>
          val m = walk0(d.child, acc)
          acc + (d.id -> d.child.output.map(a =>
            m.getOrElse(a.exprId, Set.empty[String])))
        }
        walk0(w.plan, defs)
      case r: CTERelationRef =>
        val srcs = cteOut.getOrElse(r.cteId, Seq.empty)
        r.output.zipWithIndex.map { case (a, i) =>
          a.exprId -> srcs.lift(i).getOrElse(Set.empty[String])
        }.toMap
      case l: LeafNode =>
        val t = leafName(l)
        l.output.map(a => a.exprId -> Set(s"$t.${a.name}")).toMap
      case p =>
        val child = p.children.map(walk0(_, cteOut))
          .foldLeft(Map.empty[ExprId, Set[String]])(_ ++ _)
        val added: Map[ExprId, Set[String]] = p match {
          case Project(exprs, _) => fromNamed(exprs, child)
          case Aggregate(_, exprs, _, _) => fromNamed(exprs, child)
          case w: Window => fromNamed(w.windowExpressions, child)
          case g: Generate =>
            val src = g.generator.references.toSeq
              .flatMap(r => child.getOrElse(r.exprId, Set.empty[String]))
              .toSet
            g.generatorOutput.map(a => a.exprId -> src).toMap
          case e: Expand =>
            e.output.zipWithIndex.map { case (a, i) =>
              val srcs = e.projections.flatMap(row =>
                row.lift(i).toSeq.flatMap(_.references.toSeq)
                  .flatMap(r => child.getOrElse(r.exprId,
                    Set.empty[String])))
              a.exprId -> srcs.toSet
            }.toMap
          case u: Union =>
            // A Union's output attrs reuse the FIRST child's exprIds,
            // so without this case every non-first branch's sources
            // vanish — and the engine's own fan-in idiom (O2,
            // `reduce(_ unionByName _)`) is exactly a Union. Each
            // output position draws from the corresponding positional
            // attr of EVERY child.
            u.output.zipWithIndex.map { case (a, i) =>
              val srcs = u.children.flatMap(c =>
                c.output.lift(i).toSeq.flatMap(ca =>
                  child.getOrElse(ca.exprId, Set.empty[String])))
              a.exprId -> srcs.toSet
            }.toMap
          case ix: Intersect =>
            // Intersect keeps the left child's exprIds but an output
            // row's values exist in BOTH children — positional union,
            // like Union. (Except needs no case: its values flow from
            // the left only; the right side acts as a row filter, and
            // Filter predicates are routing here by convention.)
            ix.output.zipWithIndex.map { case (a, i) =>
              val srcs = Seq(ix.left, ix.right).flatMap(c =>
                c.output.lift(i).toSeq.flatMap(ca =>
                  child.getOrElse(ca.exprId, Set.empty[String])))
              a.exprId -> srcs.toSet
            }.toMap
          case s: SubqueryAlias => Map.empty // routing only
          case _ => Map.empty
        }
        child ++ added
    }
}
