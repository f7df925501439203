package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the LLM-pipeline operators
  * (SURVEY.md §7.4). Pattern follows the reference's scalar expressions
  * (`sql/catalyst/.../expressions/stringExpressions.scala`,
  * `hash.scala`): `nullSafeEval` for interpreted mode plus `doGenCode`
  * emitting a single static `Kernels` call, so the expressions stay inside
  * whole-stage codegen (no `CodegenFallback` materialization, no UDF
  * boxing) — the reason these beat `udf()` at 100 TB.
  */
object VectorExpressions {

  private def isNumArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  /** cosine(a, b) over array<float> / array<double>. */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult =
      if (isNumArray(left.dataType) && isNumArray(right.dataType) &&
          left.dataType.asInstanceOf[ArrayType].elementType ==
            right.dataType.asInstanceOf[ArrayType].elementType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"cosine expects two arrays of the same numeric element type, " +
          s"got ${left.dataType}, ${right.dataType}")
    private def kernel: String = left.dataType match {
      case ArrayType(FloatType, _) => "cosineF"
      case _ => "cosineD"
    }
    override def nullSafeEval(a: Any, b: Any): Any = {
      val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      if (kernel == "cosineF") Kernels.cosineF(x, y) else Kernels.cosineD(x, y)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.$kernel($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): CosineSimilarity =
      copy(left = newLeft, right = newRight)
  }

  /** minhash(words, k, shingleSize, seed) → array<bigint> signature. */
  case class MinHashSignature(child: Expression, k: Int, shingleSize: Int, seed: Long)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(s"minhash expects array<string>, got $dt")
    }
    override def nullSafeEval(words: Any): Any =
      Kernels.minHash(words.asInstanceOf[ArrayData], k, shingleSize, seed)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        w => s"graft.functions.Kernels.minHash($w, $k, $shingleSize, ${seed}L)")
    override protected def withNewChildInternal(c: Expression): MinHashSignature =
      copy(child = c)
  }

  /** simhash64(words) → bigint fingerprint. */
  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(s"simhash64 expects array<string>, got $dt")
    }
    override def nullSafeEval(words: Any): Any =
      Kernels.simHash64(words.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, w => s"graft.functions.Kernels.simHash64($w)")
    override protected def withNewChildInternal(c: Expression): SimHash64 =
      copy(child = c)
  }

  /** hamming64(a, b) over bigint fingerprints. */
  case class Hamming64(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == LongType && right.dataType == LongType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("hamming64 expects (bigint, bigint)")
    override def nullSafeEval(a: Any, b: Any): Any =
      Kernels.hamming64(a.asInstanceOf[Long], b.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.hamming64($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Hamming64 =
      copy(left = newLeft, right = newRight)
  }

  /** lsh_bucket(vec, planes, seed) → int (random-hyperplane sign pattern). */
  case class LshBucket(child: Expression, planes: Int, seed: Long)
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(s"lsh_bucket expects array<float>, got $dt")
    }
    override def nullSafeEval(vec: Any): Any =
      Kernels.lshBucketF(vec.asInstanceOf[ArrayData], planes, seed)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        v => s"graft.functions.Kernels.lshBucketF($v, $planes, ${seed}L)")
    override protected def withNewChildInternal(c: Expression): LshBucket =
      copy(child = c)
  }

  /** sig_agreement(a, b) — MinHash Jaccard estimate from two signatures. */
  case class SigAgreement(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure("sig_agreement expects array<bigint> pair")
      }
    override def nullSafeEval(a: Any, b: Any): Any =
      Kernels.sigAgreement(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.sigAgreement($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SigAgreement =
      copy(left = newLeft, right = newRight)
  }

  // ------------------------------------------------------------ Column API

  def cosine(a: Column, b: Column): Column =
    toCol(CosineSimilarity(toExpr(a), toExpr(b)))
  def minhash(words: Column, k: Int = 64, shingleSize: Int = 3,
      seed: Long = 42L): Column =
    toCol(MinHashSignature(toExpr(words), k, shingleSize, seed))
  def simhash64(words: Column): Column = toCol(SimHash64(toExpr(words)))
  def hamming64(a: Column, b: Column): Column = toCol(Hamming64(toExpr(a), toExpr(b)))
  def lshBucket(vec: Column, planes: Int = 4, seed: Long = 42L): Column =
    toCol(LshBucket(toExpr(vec), planes, seed))
  def sigAgreement(a: Column, b: Column): Column =
    toCol(SigAgreement(toExpr(a), toExpr(b)))

  /** Register SQL names (reference `FunctionRegistry` pattern). */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine",
      es => CosineSimilarity(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64",
      es => SimHash64(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("hamming64",
      es => Hamming64(es.head, es(1)), "scala_udf")
  }
}
