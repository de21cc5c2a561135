package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import graft.functions.DotProduct

/** SQL-surface registration of graft's functions, so `spark.sql` users
  * get them too:
  *
  *   SELECT dot_product(a, b), cosine_sim(a, b),
  *          graft_tokens(text), graft_token_count(text),
  *          graft_sanitize_filename(title) FROM ...
  */
object GraftFunctions {

  // catalyst-native trees (the SQL function-registry path can't resolve
  // Column-node wrappers, so the text functions are rebuilt from raw
  // expressions — semantics identical to TextFns)
  private def lit(s: String): Expression = Literal(s)

  private def tokensExpr(e: Expression): Expression = {
    val x = UnresolvedNamedLambdaVariable(Seq("x"))
    ArrayFilter(
      StringSplit(Lower(RegExpReplace(e, lit("[^\\w\\s]"), lit(" "))), lit("\\s+"), Literal(-1)),
      LambdaFunction(Not(EqualTo(x, lit(""))), Seq(x)))
  }

  private def sanitizeFilenameExpr(e: Expression): Expression =
    Substring(
      StringTranslate(
        StringTrim(RegExpReplace(e, lit("[^A-Za-z0-9 \\-_]"), lit("_"))),
        lit(" "), lit("_")),
      Literal(1), Literal(100))

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_product" -> (exprs => DotProduct(exprs(0), exprs(1))),
    "cosine_sim" -> { exprs =>
      val (a, b) = (exprs(0), exprs(1))
      Divide(DotProduct(a, b),
        Multiply(Sqrt(DotProduct(a, a)), Sqrt(DotProduct(b, b))))
    },
    "graft_tokens"            -> (exprs => tokensExpr(exprs.head)),
    "graft_token_count"       -> (exprs => Size(tokensExpr(exprs.head))),
    "graft_sanitize_filename" -> (exprs => sanitizeFilenameExpr(exprs.head)),
    "graft_ascii_sanitize"    -> (exprs =>
      RegExpReplace(exprs.head, lit("[^\\x00-\\x7F]"), lit("_"))),
    // aggregate: mg_topk(token, capacity) → array<struct<token,est>>
    "mg_topk" -> { exprs =>
      val cap = exprs(1) match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"mg_topk capacity must be an integer literal, got $other")
      }
      graft.functions.MisraGriesTopK(exprs.head, cap).toAggregateExpression()
    },
    // cdc_cuts(tokens[, win, mask]) → array<int> of 1-based content-
    // defined cut positions (the text_cdc_chunks boundary rule;
    // defaults = the gated constants)
    "cdc_cuts" -> { exprs =>
      def intLit(e: Expression, what: String): Int = e match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"cdc_cuts $what must be an integer literal, got $other")
      }
      val win = if (exprs.length > 1) intLit(exprs(1), "win")
                else graft.operators.TextAnalysis.CdcWin
      val mask = if (exprs.length > 2) intLit(exprs(2), "mask")
                 else graft.operators.TextAnalysis.CdcMask
      // validate at ANALYSIS, not inside executor tasks (advice r17):
      // mask=0 would throw ArithmeticException mid-job, win<=0 would
      // silently hash empty windows
      if (win < 1) throw new IllegalArgumentException(
        s"cdc_cuts win must be >= 1, got $win")
      if (mask < 1) throw new IllegalArgumentException(
        s"cdc_cuts mask must be >= 1, got $mask")
      graft.functions.CdcCuts(exprs.head, win, mask)
    })

  /** Register on an already-running session (temp functions). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "scala_udf")
    }
}

/** `spark.sql.extensions=graft.GraftExtensions` injects the same
  * functions at session build time (the config-file route for clusters). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    Seq[(String, Seq[Expression] => Expression)](
      "dot_product" -> (exprs => DotProduct(exprs(0), exprs(1)))
    ).foreach { case (name, b) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[DotProduct].getName, name), b))
    }
    e.injectPlannerStrategy(_ => graft.plans.AsOfStrategy)
  }
}
