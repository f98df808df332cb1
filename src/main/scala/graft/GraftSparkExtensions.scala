package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftx._

/** Spark-native deployment entry point: register graft's expressions
  * in every session via
  * `--conf spark.sql.extensions=graft.GraftSparkExtensions`
  * (no code changes in the host application). `Graft.session` /
  * `Graft.registerFunctions` do the same for programmatic use.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftSparkExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => PolygonGateBBoxRule)
  }
}

object GraftSparkExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("asinh_scaled", info("asinh_scaled", "asinh_scaled(x, cofactor) - arcsinh channel scaling"),
      es => AsinhScaled(es.head, es(1))),
    ("logicle", info("logicle", "logicle(x, t, m, w) - biexponential display transform"),
      es => Logicle(es.head, es(1), es(2), es(3))),
    ("rolling_hash", info("rolling_hash", "rolling_hash(s) - 64-bit polynomial hash"),
      es => RollingHash(es.head)),
    ("simhash64", info("simhash64", "simhash64(tokens) - 64-bit SimHash fingerprint"),
      es => SimHash64(es.head)),
    ("cosine_sim", info("cosine_sim", "cosine_sim(a, b) - cosine similarity of float arrays"),
      es => CosineSim(es.head, es(1))),
    ("sorted_long_intersect_size", info("sorted_long_intersect_size",
      "sorted_long_intersect_size(a, b) - intersection size of sorted long arrays"),
      es => SortedLongIntersectSize(es.head, es(1))))
}
