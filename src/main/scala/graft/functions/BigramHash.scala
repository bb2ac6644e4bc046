package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}

/** All hashed bigram pairs of a token array in ONE codegen pass —
  * the corpus-side kernel of the interpolated bigram LM
  * ([[graft.scaleops.TrainingData.bigramCrossEntropy]]).
  *
  * The prior shape built bigrams with a
  * `transform(sequence(...), i => struct(element_at(toks, i),
  * element_at(toks, i + 1)))` higher-order-function column — HOFs are
  * CodegenFallback (interpreted, boxing per element), and the LM
  * derives the position stream TWICE (count aggregate + score join),
  * so the interpreted chain ran over every token position twice per
  * query. This expression is a plain loop: hash each token ONCE with
  * the exact xxhash64 arithmetic of Spark's `xxhash64()` (XXH64,
  * seed 42 — spec-pinned equality), then emit the n−1 (h1, h2)
  * structs for `explode`. Token strings never leave the kernel — the
  * downstream exchanges carry only the 8-byte dictionary keys.
  *
  * An array with fewer than two tokens yields an EMPTY array (zero
  * rows after explode — the `when(size >= 2)` guard folded in); a
  * null element hashes to the seed like `xxhash64(null)` would.
  */
case class BigramHashPairsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("h1", LongType, nullable = false),
      StructField("h2", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bigram_hash_pairs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bigram_hash_pairs needs array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    BigramHash.pairsOf(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.BigramHash.pairsOf($v);")

  override protected def withNewChildInternal(newChild: Expression)
      : BigramHashPairsExpr = copy(child = newChild)
}

object BigramHash {

  /** Seed of Spark's `xxhash64()` function — pinned so the kernel's
    * keys join/compare consistently with any `xxhash64(col)` the
    * surrounding plan computes (e.g. the unigram side). */
  val seed = 42L

  /** xxhash64 of one token with Spark's exact arithmetic (null →
    * seed, mirroring `xxhash64(null)`). Called from generated code
    * and from the unigram-side kernel twin. */
  def hashToken(toks: ArrayData, i: Int): Long = {
    if (toks.isNullAt(i)) return seed
    val s = toks.getUTF8String(i)
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)
  }

  /** The n−1 hashed (h1, h2) bigram structs of a token array; empty
    * for n < 2. Each token is hashed once. */
  def pairsOf(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = hashToken(toks, i); i += 1 }
    val out = new Array[Any](n - 1)
    i = 0
    while (i < n - 1) {
      out(i) = new GenericInternalRow(
        Array[Any](hs(i), hs(i + 1))): InternalRow
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: `array<struct<h1:long, h2:long>>` of hashed bigram
    * pairs (explode it to the LM's position stream). */
  def pairs(toks: Column): Column =
    GraftBridge.column(BigramHashPairsExpr(GraftBridge.expression(toks)))

  /** All token hashes of the array — the unigram-side kernel twin:
    * `explode(token_hashes(toks))` ships 8-byte longs into the vocab
    * aggregate instead of exploding strings and hashing row-by-row
    * (the string explode copies every token's UTF-8 bytes into the
    * generator's output rows just to hash-and-drop them — measured
    * ~2× the whole unigram aggregate at the sf1 soak). */
  def hashesOf(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = hashToken(toks, i); i += 1 }
    new GenericArrayData(out)
  }

  /** Column API: `array<long>` of per-token xxhash64 keys. */
  def tokenHashes(toks: Column): Column =
    GraftBridge.column(TokenHashesExpr(GraftBridge.expression(toks)))
}

/** [[BigramHash.hashesOf]] as a codegen expression — see
  * [[BigramHashPairsExpr]] for why the kernel form (vs per-row
  * `xxhash64` over exploded strings). */
case class TokenHashesExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "token_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_hashes needs array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    BigramHash.hashesOf(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.BigramHash.hashesOf($v);")

  override protected def withNewChildInternal(newChild: Expression)
      : TokenHashesExpr = copy(child = newChild)
}
