package graft.functions

import graft.ops.{Dedup, TextStats}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration of the native expressions, so a pure-SQL user can call
  * them (`SELECT long_dot(a, b) ...`). Two entry points:
  *
  *  - builder-time: `.config("spark.sql.extensions",
  *    "graft.functions.GraftExtensions")` — the standard library packaging
  *    via SparkSessionExtensions;
  *  - runtime: `GraftExtensions.register(spark)` for an already-running
  *    session (what Verify/Bench-style hosts use).
  *
  * The hash functions bind the project-wide prime/modulus so SQL results
  * are identical to the Scala API and the DuckDB oracle mirrors.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.signatures.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** Arity guard: a wrong-arity SQL call should fail resolution with a
    * message naming the function and its signature, not an
    * IndexOutOfBoundsException from inside the builder. */
  private def arity(name: String, usage: String, n: Int)(
    build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      require(args.length == n,
        s"$name expects $n argument(s) — usage: $usage — got ${args.length}")
      build(args)
    }

  val signatures: Seq[(FunctionIdentifier, ExpressionInfo,
    Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("long_dot"),
      info("long_dot", "long_dot(a, b) - int64 dot product of two long arrays"),
      arity("long_dot", "long_dot(a, b)", 2)(args => LongDotExpr(args(0), args(1)))),
    (FunctionIdentifier("long_l2"),
      info("long_l2", "long_l2(a, b) - int64 squared L2 distance of two long arrays"),
      arity("long_l2", "long_l2(a, b)", 2)(args => LongL2Expr(args(0), args(1)))),
    (FunctionIdentifier("byte_roll_hash"),
      info("byte_roll_hash", "byte_roll_hash(s) - rolling polynomial hash of s's bytes"),
      arity("byte_roll_hash", "byte_roll_hash(s)", 1)(args =>
        ByteRollHashExpr(args(0), TextStats.FpPrime, TextStats.FpMod))),
    (FunctionIdentifier("minhash_affine"),
      info("minhash_affine", "minhash_affine(sh) - 16-permutation minhash signature"),
      arity("minhash_affine", "minhash_affine(sh)", 1)(args =>
        MinHashExpr(args(0), Dedup.PermA, Dedup.PermB, Dedup.P))),
    (FunctionIdentifier("shingle_hash_set"),
      info("shingle_hash_set", "shingle_hash_set(toks) - distinct bigram shingle hashes"),
      arity("shingle_hash_set", "shingle_hash_set(toks)", 1)(args =>
        ShingleHashSetExpr(args(0), TextStats.FpPrime, Dedup.P))))

  /** Register on a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    signatures.foreach { case (ident, inf, builder) =>
      org.apache.spark.sql.graftshim.GraftShim
        .registerFunction(spark, ident, inf, builder)
    }
}
