package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{MinHashSigs, SimHash32, VectorAvg, VectorFunctions}

/** SparkSessionExtensions entry point — wires the library's native
  * Catalyst expressions into any session at build time:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions).…
  *   // or: spark.sql.extensions=graft.GraftExtensions
  *
  * After that, `cosine_sim`, `vec_dot`, and `vector_avg` resolve in SQL
  * text and via call_function on every session of the cluster.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(_ => graft.plans.DateKeyJoinRewrite)
    // SELECT min/max/count FROM dw_t answered from the manifest alone
    // when provably exact (see MetadataAggRewrite's contract)
    ext.injectResolutionRule(session =>
      graft.plans.MetadataAggRewrite(session))
    // SQL maintenance surface (DELETE/UPDATE/VACUUM/OPTIMIZE/DESCRIBE
    // HISTORY/CLONE over warehouse tables); unmatched statements
    // delegate to Spark's own parser untouched
    ext.injectParser((session, delegate) =>
      new graft.plans.GraftSqlParser(session, delegate))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[VectorFunctions.CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2, s"cosine_sim expects 2 arguments, got ${exprs.length}")
        VectorFunctions.CosineSimilarity(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorFunctions.VectorDot].getName, "vec_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2, s"vec_dot expects 2 arguments, got ${exprs.length}")
        VectorFunctions.VectorDot(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("lsh_bucket"),
      new ExpressionInfo(classOf[VectorFunctions.LshBucket].getName, "lsh_bucket"),
      VectorFunctions.lshBucketBuilder _))
    ext.injectFunction((
      FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getName, "minhash_sigs"),
      VectorFunctions.minhashSigsBuilder _))
    ext.injectFunction((
      FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "simhash32"),
      VectorFunctions.simhash32Builder _))
    ext.injectFunction((
      FunctionIdentifier("vector_avg"),
      new ExpressionInfo(classOf[VectorAvg].getName, "vector_avg"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 1, s"vector_avg expects 1 argument, got ${exprs.length}")
        VectorAvg(exprs.head).toAggregateExpression()
      }))
  }
}
