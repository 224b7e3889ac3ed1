package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, DotProduct, DvHash, DvHashRuntime, NormalizeText}

/** Session extension plugin: registers the native vector expressions as SQL
  * functions so they're usable from `spark.sql` / `expr(...)` as well as the
  * Column API. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def binary(name: String)(mk: (Expression, Expression) => Expression)(children: Seq[Expression]): Expression = {
    if (children.size != 2)
      throw new IllegalArgumentException(s"$name requires exactly 2 arguments, got ${children.size}")
    mk(children.head, children(1))
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Plain-SQL DV hash sites get the fused native expression automatically.
    ext.injectOptimizerRule(_ => graft.plans.FuseDvHash)
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      binary("graft_dot")(DotProduct) _))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      binary("graft_cosine")(CosineSimilarity) _))
    ext.injectFunction((
      FunctionIdentifier("graft_norm"),
      new ExpressionInfo(classOf[NormalizeText].getName, "graft_norm"),
      (children: Seq[Expression]) => {
        if (children.size != 1)
          throw new IllegalArgumentException(s"graft_norm requires exactly 1 argument, got ${children.size}")
        NormalizeText(children.head)
      }))
    // graft_latest(struct): max over an orderable struct as a typed
    // imperative aggregate (ObjectHashAggregate) — for ad-hoc SQL / temp
    // views where the caller KNOWS per-task group cardinality is bounded
    // (e.g. above an explicit key exchange, the DvOps.currentRows shape).
    // NOTE 1: persistent views cannot reference it (injected functions
    // count as temporary objects under verifyTemporaryObjectsNotExists).
    // NOTE 2: it is NOT a drop-in upgrade over declarative max(struct) on
    // naturally-partitioned input — the r21 BvProf adjudication (bench/
    // r21_bvprof_*.log) measured the two-phase hash shape 7-9x SLOWER than
    // max(struct)'s SortAggregate on a many-keys profile (per-task groups
    // blow the ObjectHashAggregate fallback threshold, and keys that barely
    // repeat per task make the partial hash pass pure overhead), while
    // max(struct)'s map-side partial collapse ships <= 1 row/key/task.
    ext.injectFunction((
      FunctionIdentifier("graft_latest"),
      new ExpressionInfo(classOf[graft.functions.MaxStruct].getName, "graft_latest"),
      (children: Seq[Expression]) => {
        if (children.size != 1)
          throw new IllegalArgumentException(
            s"graft_latest requires exactly 1 struct argument, got ${children.size}")
        graft.functions.MaxStruct(children.head)
      }))
    // graft_topk(v, k): bounded top-k aggregate; k must be constant at
    // analysis time — any foldable integral expression (3, 3L, 1+2, …).
    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[graft.functions.TopKDoubles].getName, "graft_topk"),
      (children: Seq[Expression]) => {
        if (children.size != 2)
          throw new IllegalArgumentException(s"graft_topk requires (value, k), got ${children.size} arguments")
        import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
        val kExpr = children(1)
        val integral = kExpr.dataType match {
          case ByteType | ShortType | IntegerType | LongType => true
          case _                                             => false
        }
        val k = kExpr match {
          case e if e.foldable && integral =>
            e.eval() match {
              case null       => throw new IllegalArgumentException("graft_topk: k must not be null")
              case b: Byte    => b.toLong
              case s: Short   => s.toLong
              case i: Int     => i.toLong
              case l: Long    => l
              case other      => throw new IllegalArgumentException(s"graft_topk: unexpected k value $other")
            }
          case _ => throw new IllegalArgumentException("graft_topk: k must be a foldable integer expression")
        }
        if (k < 1 || k > Int.MaxValue)
          throw new IllegalArgumentException(s"graft_topk: k out of range: $k")
        graft.functions.TopKDoubles(children.head, k.toInt)
      }))
    // graft_dv_hash(algo, f1, f2, …): first arg is a literal algorithm name.
    ext.injectFunction((
      FunctionIdentifier("graft_dv_hash"),
      new ExpressionInfo(classOf[DvHash].getName, "graft_dv_hash"),
      (children: Seq[Expression]) => {
        if (children.size < 2)
          throw new IllegalArgumentException(
            s"graft_dv_hash requires (algo, field, ...), got ${children.size} arguments")
        val algo = children.head match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) if v != null =>
            v.toString match {
              case "md5"    => DvHashRuntime.Md5
              case "sha1"   => DvHashRuntime.Sha1
              case "sha256" => DvHashRuntime.Sha256
              case other    => throw new IllegalArgumentException(s"unknown hash algo: $other")
            }
          case _ => throw new IllegalArgumentException("graft_dv_hash: algo must be a literal string")
        }
        DvHash(children.tail, algo)
      }))
  }
}
