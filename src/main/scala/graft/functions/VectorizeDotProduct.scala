package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate,
  Cast, Expression, LambdaFunction, Literal, Multiply, NamedExpression,
  NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the higher-order-function dot-product
  * pattern
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (s, v) -> s + v) }}}
  * (with optional float→double casts inside the lambda, the exact
  * shape [[graft.operators.Similarity.dot]] produces) into the
  * codegen'd [[VecDot]] kernel.
  *
  * Catalyst-idiomatic auto-vectorization: user code stays declarative
  * HOFs; plans silently get the tight loop. The match is deliberately
  * conservative — any deviation from the known-equivalent shape keeps
  * the original expression (a no-match can never change semantics).
  */
object VectorizeDotProduct extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** x (possibly cast to double) resolving to lambda variable `v`. */
  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case nv: NamedLambdaVariable => nv.exprId == v.exprId
      case Cast(nv: NamedLambdaVariable, DoubleType, _, _) =>
        nv.exprId == v.exprId
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithSubqueries {
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(mx, my, _),
              Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(ma, mv, _),
            Seq(s: NamedLambdaVariable, v: NamedLambdaVariable), _),
          finishLambda)
          if isFloatArray(a) && isFloatArray(b) &&
            isVar(mx, x) && isVar(my, y) &&
            isVar(ma, s) && isVar(mv, v) &&
            (finishLambda match {
              case LambdaFunction(body: NamedLambdaVariable,
                  Seq(fv: NamedLambdaVariable), _) =>
                body.exprId == fv.exprId
              case _ => false
            }) =>
        VecDot(a, b)
    }
}
