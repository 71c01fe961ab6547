package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for the native graft expressions: registered through
  * `SparkSessionExtensions` (set `spark.sql.extensions=
  * graft.functions.GraftExtensions`), so `spark.sql` queries can call
  * them directly:
  *
  *   SELECT graft_cosine(a, b), graft_simhash(graft_shingle_hashes(toks, 1)) ...
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  import GraftExtensions._

  override def apply(e: SparkSessionExtensions): Unit = {
    builders.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        (exprs: Seq[Expression]) => builder(exprs)))
    }
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {

  private def litInt(e: Expression, default: Int): Int = e match {
    case Literal(v: Int, _) => v
    case other => other.eval().asInstanceOf[Int]
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_minhash" -> { es =>
      MinHashSignatureExpr(es.head, if (es.length > 1) litInt(es(1), 64) else 64)
    },
    "graft_simhash" -> { es => SimHash64Expr(es.head) },
    "graft_cosine" -> { es => CosineSimilarityExpr(es(0), es(1)) },
    "graft_shingle_hashes" -> { es =>
      WordShingleHashesExpr(es.head, if (es.length > 1) litInt(es(1), 1) else 1)
    })
}
