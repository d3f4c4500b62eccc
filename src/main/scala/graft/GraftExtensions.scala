package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.functions.{KernelExpressions, TextFunctions}

/** SQL surface for the codegen'd kernel expressions — the
  * `SparkSessionExtensions` entry point, so a pure-SQL user (or a
  * Thrift/Connect session) reaches the same kernels the DataFrame API
  * uses, with identical arithmetic and codegen:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions …
  * SELECT graft_dot(a.embedding, b.embedding) FROM …
  * }}}
  *
  * For a session that already exists (tests, notebooks),
  * [[GraftFunctions.register]] installs the same builders into the
  * session's function registry directly.
  *
  * Only the kernels with a stable scalar/array contract are exposed;
  * parameterized ones take their parameter as a LITERAL argument
  * (checked at plan time — a non-literal would mean per-row codegen
  * specialization, which these kernels deliberately avoid).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // optimizer rules and planner strategies ride the same entry
    // point; for a live session use spark.experimental
    // .extraOptimizations / .extraStrategies (see each scaladoc)
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinBandRule)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}

object GraftFunctions {

  private def litInt(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[KernelExpressions.type].getName, null, name, usage, "")

  /** (name, info, builder) triples — the single source for both the
    * extensions injector and [[register]]. */
  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_dot",
      info("graft_dot", "graft_dot(a, b) - fold-left dot product of two array<double>; dimension mismatch throws"),
      (es: Seq[Expression]) => KernelExpressions.DotProduct(es(0), es(1))),
    ("graft_intersect_count",
      info("graft_intersect_count", "graft_intersect_count(a, b) - exact intersection size of two SORTED arrays (linear merge)"),
      (es: Seq[Expression]) => KernelExpressions.SortedIntersectCount(es(0), es(1))),
    ("graft_ngram_set",
      info("graft_ngram_set", "graft_ngram_set(tokens, n) - sorted distinct n-gram shingle set of an array<string>; n literal"),
      (es: Seq[Expression]) => KernelExpressions.SortedNgramSet(es(0), litInt(es(1), "graft_ngram_set", "n"))),
    ("graft_max_run_length",
      info("graft_max_run_length", "graft_max_run_length(sorted) - longest run of equal adjacent elements in a sorted array"),
      (es: Seq[Expression]) => KernelExpressions.MaxRunLength(es(0))),
    ("graft_simhash",
      info("graft_simhash", "graft_simhash(token_hashes) - 31-bit SimHash signature from an array<long> of token hashes"),
      (es: Seq[Expression]) => KernelExpressions.SimHashBits(es(0), bits = 31)),
    ("graft_polyhash",
      info("graft_polyhash", "graft_polyhash(strings) - element-wise 31-bit polynomial hash of an array<string> (the MinHash base hash)"),
      (es: Seq[Expression]) => KernelExpressions.PolyHashArray(es(0))),
    ("graft_minhash",
      info("graft_minhash", "graft_minhash(base_hashes, perms) - MinHash signature (library-fixed LCG coefficients); perms literal"),
      (es: Seq[Expression]) => {
        val perms = litInt(es(1), "graft_minhash", "perms")
        val (as, bs) = TextFunctions.minhashCoefficients(perms)
        KernelExpressions.MinHashSig(es(0), as, bs)
      }))

  /** Install into an existing session (tests, notebooks, host apps that
    * did not configure `spark.sql.extensions`). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
}
