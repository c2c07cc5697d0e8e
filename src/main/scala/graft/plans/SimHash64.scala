package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.SparkSession

/** Native Catalyst expression: 64-bit SimHash over a token array.
  *
  * SimHash (Charikar 2002; used by web-scale near-dup pipelines) has
  * no composition in builtin functions that avoids a 64-way explode
  * per token, so this is the (b)-tier custom-Expression path from the
  * design hierarchy: single pass over the token array, fixed 64-slot
  * accumulator, no shuffle, no UDF serialization.
  *
  * Token hash is FNV-1a 64 (public-domain constants) — deterministic
  * across JVMs/runs, no dependence on JVM String.hashCode.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.catalogString}")
  }
  override def prettyName: String = "simhash64"

  private def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = fnv1a64(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Register `simhash64(array<string>)` as a session SQL function so
    * Column pipelines can `expr("simhash64(tokens)")`. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", (exprs: Seq[Expression]) => SimHash64(exprs.head), "built-in")

  /** Hamming distance between two simhash fingerprints as a Column
    * expression (bit_count of xor — codegen'd builtins). */
  def hammingExpr(a: String, b: String): String = s"bit_count($a ^ $b)"
}
