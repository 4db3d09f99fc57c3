package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document hashing kernels for the dedup family.
  *
  * The declarative formulations (token explode → 60 bit-sum aggregates for
  * SimHash, shingle explode → 8 min-aggregates for MinHash) are correct
  * but pay a shuffle plus N interpreted aggregate updates per token. Each
  * signature is really a per-document O(tokens) loop, so these expressions
  * compute it in one pass over the token array — no explode, no shuffle,
  * no aggregation; the only shuffle left in those queries is the LSH
  * band-bucket join itself.
  *
  * Bit/hash construction is kept IDENTICAL to the DuckDB oracles (and the
  * previous declarative shape): one lowercase-hex md5 per token, 4 bits
  * per hex char (`hexval >> (i%4) & 1`), strict majority `2·ones > n`;
  * MinHash mins compare md5 hex strings with natural (ASCII) ordering,
  * matching Spark's binary string collation.
  */
object TextHashExpressions {

  private val md5Local = ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  private val HEX = "0123456789abcdef".toCharArray

  private def md5Hex(s: String): String = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** 60-bit SimHash of a token array — the fused equivalent of the 60
    * per-bit majority sums (DedupQueries simhash oracle). */
  def simhash60(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val ones = new Array[Int](60)
    var t = 0
    while (t < n) {
      val hex = md5Hex(tokens.getUTF8String(t).toString)
      var bit = 0
      while (bit < 60) {
        val c = hex.charAt(bit / 4)
        val v = if (c < 'a') c - '0' else c - 'a' + 10
        ones(bit) += (v >> (bit % 4)) & 1
        bit += 1
      }
      t += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 60) {
      if (2L * ones(bit) > n) sig |= 1L << bit
      bit += 1
    }
    sig
  }

  /** k min-hashes over a shingle array: min over shingles of
    * md5("<j>#<shingle>") per hash stream j — the fused equivalent of the
    * k min-aggregates. Null when the doc has no shingles (the aggregate
    * formulation produced no row; callers filter). */
  def minhashSig(shingles: ArrayData, k: Int): GenericArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    val mins = new Array[String](k)
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i).toString
      var j = 0
      while (j < k) {
        val h = md5Hex(j.toString + "#" + s)
        if (mins(j) == null || h.compareTo(mins(j)) < 0) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(UTF8String.fromString))
  }

  /** First `n` hex chars of lowercase-hex md5(s), parsed base 16 — the
    * fused equivalent of `conv(substring(md5(s), 1, n), 16, 10)
    * .cast("long")` (the DSIR/classifier per-gram feature hash) without
    * the three intermediate string allocations that chain pays per gram
    * (32-char hex, substring slice, conv's decimal string). Bit-identical
    * by construction: md5's hex prefix read as an integer IS the digest's
    * big-endian nibble prefix, and n ≤ 15 keeps the value positive in a
    * long (the call sites use 6 and 12). */
  def md5PrefixLong(s: UTF8String, n: Int): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < n) {
      val nib =
        if ((i & 1) == 0) (d(i >> 1) >> 4) & 0xf
        else d(i >> 1) & 0xf
      v = (v << 4) | nib
      i += 1
    }
    v
  }

  def simHash(tokens: Column): Column =
    GraftShims.column(SimHash60(GraftShims.expression(tokens)))
  def minHash(shingles: Column, k: Int): Column =
    GraftShims.column(MinHashSig(GraftShims.expression(shingles), k))
  def md5Prefix(s: Column, n: Int): Column =
    GraftShims.column(Md5PrefixLong(GraftShims.expression(s), n))
}

/** `simhash60` as a Catalyst expression; codegen emits one static call. */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override def nullSafeEval(a: Any): Any =
    TextHashExpressions.simhash60(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextHashExpressions.simhash60($a)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

/** `minhashSig` as a Catalyst expression; null for empty shingle arrays. */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true // empty shingle arrays → null
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(a: Any): Any =
    TextHashExpressions.minhashSig(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.TextHashExpressions.minhashSig($a, $k);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** `md5PrefixLong` as a Catalyst expression; codegen emits one static
  * call — whole-stage-codegen-friendly like its siblings (round-21,
  * verdict item 3: the `conv(substring(md5(g),1,n),16,10)` chain was the
  * last interpreted-adjacent per-gram hot path). */
case class Md5PrefixLong(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1 && n <= 15, s"md5 hex prefix length must be 1..15, got $n")
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix_long"

  override def nullSafeEval(a: Any): Any =
    TextHashExpressions.md5PrefixLong(a.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.TextHashExpressions.md5PrefixLong($a, $n)")

  override protected def withNewChildInternal(newChild: Expression): Md5PrefixLong =
    copy(child = newChild)
}
