package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for graft's native expressions, installed via
  * `spark.sql.extensions=graft.GraftExtensions` (or programmatically with
  * `SparkSession.builder.withExtensions(new GraftExtensions)`), so pure-SQL
  * pipelines get the same codegen-tier operators as the Scala API:
  *
  * {{{
  *   SELECT graft_simhash(text),
  *          graft_minhash(graft_shingles(text, 3), 64),
  *          graft_cosine(a.embedding, b.embedding)
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$name must be an int literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def register(name: String, builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))

    register("graft_shingles", args =>
      ShinglesExpr(args.head, intArg(args(1), "n"),
        charGrams = args.length > 2 && intArg(args(2), "charGrams") == 1))
    register("graft_minhash", args =>
      MinHashSigExpr(args.head, intArg(args(1), "k")))
    register("graft_band_hashes", args =>
      BandHashesExpr(args.head, intArg(args(1), "bands"), intArg(args(2), "rowsPerBand")))
    register("graft_simhash", args => SimHash64Expr(args.head))
    register("graft_fingerprint", args =>
      RollingFingerprintExpr(args.head, intArg(args(1), "shingleSize"), intArg(args(2), "k")))
    register("graft_long_castable", args => LongCastableExpr(args.head))
    register("graft_cosine", args => CosineSimExpr(args.head, args(1)))
    register("graft_dot", args => DotProductExpr(args.head, args(1)))
    register("graft_euclidean", args => EuclideanDistExpr(args.head, args(1)))
    register("graft_text_stats", args => TextStatsExpr(args.head))
    register("graft_jaccard", args => JaccardSimExpr(args.head, args(1)))
    register("graft_dup_stats", args => DupStatsExpr(args.head))
    register("graft_quantize", args => QuantizeExpr(args.head))
    register("graft_dequantize", args => DequantizeExpr(args.head))
    register("graft_cosine_q", args => CosineSimQExpr(args.head, args(1)))
  }
}
