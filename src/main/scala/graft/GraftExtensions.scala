package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression,
  ExpressionInfo}

import graft.functions.{Hilbert2D, HilbertN, PqAssign, ShingleNGrams,
  VecDot, VectorizeDotProduct}

/** Engine extension point (SparkSessionExtensions): registers the
  * native [[graft.functions.VecDot]] kernel as SQL function
  * `vec_dot(a, b)`, the [[graft.functions.ShingleNGrams]] kernel as
  * `shingles(tokens, n, distinct)`, and installs the
  * [[graft.functions.VectorizeDotProduct]] optimizer rule that
  * auto-rewrites HOF dot products into VecDot.
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (done
  * by [[Tables.configure]]) or `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"vec_dot expects 2 arguments, got ${children.size}")
        VecDot(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[ShingleNGrams].getName, "shingles"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          s"shingles expects (tokens, n, distinct), got ${children.size}")
        // n and distinct parameterize codegen, so they must be
        // compile-time constants — reject columns/NULLs/wrong types
        // with a clear message instead of a raw eval()/cast crash.
        def const[T](e: Expression, what: String,
            pf: PartialFunction[Any, T]): T = {
          require(e.foldable,
            s"shingles: $what must be a literal, got ${e.sql}")
          val v = e.eval()
          require(v != null && pf.isDefinedAt(v),
            s"shingles: $what must be a non-null ${what} literal, " +
              s"got ${e.sql}")
          pf(v)
        }
        ShingleNGrams(children.head,
          const[Int](children(1), "int n",
            { case i: Int => i; case l: Long if l.isValidInt => l.toInt }),
          const[Boolean](children(2), "boolean distinct",
            { case b: Boolean => b }))
      }))
    ext.injectFunction((
      new FunctionIdentifier("hilbert2d"),
      new ExpressionInfo(classOf[Hilbert2D].getName, "hilbert2d"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          s"hilbert2d expects (x, y, bits), got ${children.size}")
        val bitsExpr = children(2)
        require(bitsExpr.foldable,
          s"hilbert2d: bits must be a literal, got ${bitsExpr.sql}")
        val bits = bitsExpr.eval() match {
          case i: Int => i
          case l: Long if l.isValidInt => l.toInt
          case v => throw new IllegalArgumentException(
            s"hilbert2d: bits must be an int literal, got $v")
        }
        Hilbert2D(children.head, children(1), bits)
      }))
    ext.injectFunction((
      new FunctionIdentifier("hilbertn"),
      new ExpressionInfo(classOf[HilbertN].getName, "hilbertn"),
      (children: Seq[Expression]) => {
        require(children.size >= 2,
          s"hilbertn expects (bits, x1, ..., xn), got ${children.size}")
        val bitsExpr = children.head
        require(bitsExpr.foldable,
          s"hilbertn: bits must be a literal, got ${bitsExpr.sql}")
        val bits = bitsExpr.eval() match {
          case i: Int => i
          case l: Long if l.isValidInt => l.toInt
          case v => throw new IllegalArgumentException(
            s"hilbertn: bits must be an int literal, got $v")
        }
        HilbertN(children.tail, bits)
      }))
    ext.injectFunction((
      new FunctionIdentifier("pq_assign"),
      new ExpressionInfo(classOf[PqAssign].getName, "pq_assign"),
      (children: Seq[Expression]) => {
        require(children.size == 4,
          s"pq_assign expects (emb, codebook, subDim, k), got " +
            s"${children.size}")
        def intConst(e: Expression, what: String): Int = {
          require(e.foldable,
            s"pq_assign: $what must be a literal, got ${e.sql}")
          e.eval() match {
            case i: Int => i
            case l: Long if l.isValidInt => l.toInt
            case v => throw new IllegalArgumentException(
              s"pq_assign: $what must be an int literal, got $v")
          }
        }
        val cbE = children(1)
        require(cbE.foldable,
          s"pq_assign: codebook must be a nested float-array " +
            s"literal, got ${cbE.sql}")
        val ad = cbE.eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val cb = (0 until ad.numElements())
          .map(i => ad.getArray(i).toFloatArray()).toArray
        PqAssign(children.head, cb,
          intConst(children(2), "subDim"), intConst(children(3), "k"))
      }))
    ext.injectOptimizerRule(_ => VectorizeDotProduct)
  }
}
