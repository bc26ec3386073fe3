package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

import graft.expressions.TopKAgg

/** Catalyst optimizer rule: rewrite the rank-filter window top-k idiom
  *
  * {{{
  *   df.withColumn("rn", row_number().over(
  *       Window.partitionBy(g).orderBy(score.desc, id.asc)))
  *     .filter(col("rn") <= k)
  * }}}
  *
  * into the engine's bounded [[TopKAgg]] aggregate + posexplode — the
  * declarative syntax every SQL user writes, executed as the plan a
  * 100 TB cluster needs. The window form funnels EVERY candidate row of
  * a group through one reducer and sorts it there (Spark's
  * WindowGroupLimit pushdown trims per-map-partition, but the
  * per-group sort and the full-width shuffle row survive); the rewrite
  * ships exactly k (score, id) pairs per group per map task and plans
  * ObjectHashAggregate with no sort at all.
  *
  * The rewrite fires only where it is provably semantics-preserving:
  *  - a single `row_number()` window expression, immediately filtered
  *    by `rn <= k` / `rn < k` / `rn = 1` (any conjunct order, but the
  *    whole predicate must be the rank bound);
  *  - the ordering is exactly (score DOUBLE DESC, id BIGINT ASC) — the
  *    strict total order [[TopKAgg]] maintains (its comparator also
  *    matches Spark's sort semantics for NaN and -0.0, see
  *    TopKAggregatorSpec);
  *  - score and id are non-nullable attributes (null ordering in the
  *    window form would need NULLS-LAST bookkeeping the aggregate
  *    drops);
  *  - the window child's output carries nothing beyond the partition
  *    keys, score, and id (true after column pruning whenever the
  *    query selects only those — otherwise the aggregate would lose
  *    payload columns and the rule correctly stays out).
  *
  * Disable with `spark.graft.topk.rewrite=false`. Registered via
  * [[graft.GraftExtensions]] (injectOptimizerRule), so it runs inside
  * the operator-optimization fixed point — after pruning has shrunk the
  * window child to the guard shape.
  */
case class TopKRewrite() extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.topk.rewrite", "true").toBoolean

  /** rn-bound forms: rn <= k, rn < k+1, k >= rn, rn = 1. */
  private def rankBound(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))
      if a.semanticEquals(rn) && k >= 1 => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType))
      if a.semanticEquals(rn) && k >= 2 => Some(k - 1)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute)
      if a.semanticEquals(rn) && k >= 1 => Some(k)
    case EqualTo(a: Attribute, Literal(1, IntegerType))
      if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan transform {
      case f @ Filter(cond,
          Window(Seq(alias @ Alias(WindowExpression(RowNumber(), spec), _)),
            partitionSpec, orderSpec, child, _))
        if rewritable(cond, alias, spec, partitionSpec, orderSpec, child) =>
        val k = rankBound(cond, alias.toAttribute).get
        rewrite(f, alias, partitionSpec, orderSpec, child, k)
    }
  }

  private def rewritable(
      cond: Expression,
      alias: Alias,
      spec: WindowSpecDefinition,
      partitionSpec: Seq[Expression],
      orderSpec: Seq[SortOrder],
      child: LogicalPlan): Boolean = {
    val rn = alias.toAttribute
    val partAttrs = partitionSpec.collect { case a: Attribute => a }
    // the window spec inside the expression must be the node's own spec
    // (Spark keeps them in sync; cheap structural re-check)
    val specOk = spec.partitionSpec == partitionSpec && spec.orderSpec == orderSpec
    val orderOk = orderSpec match {
      case Seq(SortOrder(s: Attribute, Descending, _, _),
               SortOrder(i: Attribute, Ascending, _, _)) =>
        s.dataType == DoubleType && !s.nullable &&
          i.dataType == LongType && !i.nullable &&
          !partAttrs.exists(p => p.semanticEquals(s) || p.semanticEquals(i)) &&
          !s.semanticEquals(i) &&
          // no payload columns the aggregate would lose
          child.output.forall(c => partAttrs.exists(_.semanticEquals(c)) ||
            c.semanticEquals(s) || c.semanticEquals(i))
      case _ => false
    }
    specOk && orderOk &&
      partAttrs.length == partitionSpec.length &&
      rankBound(cond, rn).isDefined
  }

  private def rewrite(
      f: Filter,
      alias: Alias,
      partitionSpec: Seq[Expression],
      orderSpec: Seq[SortOrder],
      child: LogicalPlan,
      k: Int): LogicalPlan = {
    val rn = alias.toAttribute
    val partAttrs = partitionSpec.map(_.asInstanceOf[Attribute])
    val Seq(SortOrder(scoreAttr: Attribute, _, _, _),
            SortOrder(idAttr: Attribute, _, _, _)) = orderSpec

    val aggFn = AggregateExpression(
      TopKAgg(scoreAttr, idAttr, k), aggregate.Complete, isDistinct = false)
    val topAlias = Alias(aggFn, "graft_topk")()
    val agg = Aggregate(partAttrs, partAttrs :+ topAlias, child)

    // posexplode(top.items) -> (pos int, item struct<cos, vec_id>)
    val itemsType = TopKAgg.outputType("items").dataType.asInstanceOf[ArrayType]
    val generator = PosExplode(GetStructField(topAlias.toAttribute, 0, Some("items")))
    val posAttr = AttributeReference("graft_pos", IntegerType, nullable = false)()
    val itemAttr = AttributeReference("graft_item", itemsType.elementType,
      nullable = false)()
    val gen = Generate(generator, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(posAttr, itemAttr), agg)

    // reconstruct the Filter's exact output attributes (same exprIds)
    val projList: Seq[NamedExpression] = f.output.map { a =>
      if (a.semanticEquals(rn)) {
        Alias(Cast(Add(posAttr, Literal(1)), IntegerType), a.name)(exprId = a.exprId)
      } else if (a.semanticEquals(scoreAttr)) {
        Alias(GetStructField(itemAttr, 0, Some("cos")), a.name)(exprId = a.exprId)
      } else if (a.semanticEquals(idAttr)) {
        Alias(GetStructField(itemAttr, 1, Some("vec_id")), a.name)(exprId = a.exprId)
      } else a // partition key: flows through the aggregate unchanged
    }
    Project(projList, gen)
  }
}
