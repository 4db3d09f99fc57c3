package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Count-min-sketch re-aggregation — the piece Spark's built-in sketch
  * surface is missing. `count_min_sketch(...)` builds a sketch from raw
  * values, but there is no SQL-level union over STORED sketch blobs (the
  * analog of `hll_union_agg` for `hll_sketch_agg`), so per-day / per-shard
  * CMS partials could not be rolled up without re-touching the raw data.
  * `CmsMergeAgg` closes that: a `TypedImperativeAggregate[CountMinSketch]`
  * whose update deserializes an incoming sketch blob and folds it into the
  * buffer via `CountMinSketch.mergeInPlace` (cellwise counter add — CMS is
  * exactly mergeable, the estimate off a merged sketch equals the estimate
  * off one sketch of the concatenated streams). The roll-up shuffle moves
  * sketch bytes (eps- and confidence-bounded, ~depth×width longs),
  * independent of stream cardinality — the pre-aggregation pattern that
  * answers any date-range frequency query from stored day sketches at
  * 100 TB.
  *
  * `CmsEstimate` is the point-query side: (sketch blob, item) → estimated
  * count. It hashes the item exactly as Spark's `CountMinSketchAgg` ingests
  * string columns (UTF-8 bytes via the binary path — pinned by SketchSpec
  * against a sketch built by the builtin), and caches the deserialized
  * sketch per expression instance so a broadcast 1-row sketch joined to a
  * bounded candidate list does not re-parse the blob per row. Deliberately
  * `CodegenFallback`: the estimate path runs over top-k candidates (tens of
  * rows after the heavy-hitter cut), never over the corpus — the hot path
  * is the builtin sketch build, which stays codegen'd.
  */
case class CmsMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BINARY serialized sketch, got ${child.dataType.sql}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "cms_merge"

  // The empty buffer is `null`, not a zero sketch: building one would need
  // (depth, width, seed) before the first input arrives, and mergeInPlace
  // requires identical geometry — the first deserialized sketch IS the
  // buffer, every later one folds into it.
  override def createAggregationBuffer(): CountMinSketch = null

  override def update(buffer: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val incoming =
        CountMinSketch.readFrom(new ByteArrayInputStream(v.asInstanceOf[Array[Byte]]))
      if (buffer == null) incoming
      else { buffer.mergeInPlace(incoming); buffer }
    }
  }

  override def merge(buffer: CountMinSketch, other: CountMinSketch): CountMinSketch =
    if (buffer == null) other
    else if (other == null) buffer
    else { buffer.mergeInPlace(other); buffer }

  override def eval(buffer: CountMinSketch): Any =
    if (buffer == null) null else buffer.toByteArray

  override def serialize(buffer: CountMinSketch): Array[Byte] =
    if (buffer == null) Array.emptyByteArray else buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    if (bytes.isEmpty) null
    else CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsMergeAgg =
    copy(child = newChild)
}

/** (sketch blob, string item) → CMS estimated count. See [[CmsMergeAgg]]
  * scaladoc for the hashing-parity and codegen rationale. */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BINARY sketch, STRING item), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  // Content-keyed cache: UnsafeRow/columnar getBinary hands back a FRESH
  // copy per row, so an `eq` identity check would never hit (and would go
  // stale if an eval path ever reused a buffer). The key is the FULL blob
  // (exact byte equality), not a sampled fingerprint: two per-group
  // sketches built with the same parameters share their first 8 bytes
  // (version + totalCount high word) and often their last counter cell,
  // so a head/tail sample can collide and silently serve one sketch's
  // estimates for another — e.g. `cms_estimate` mapped over a frame of
  // per-lang partials. An Arrays.equals check on a cache hit is a memcmp,
  // far cheaper than re-deserializing the counter table; a miss just
  // re-parses. Single-entry cache is enough: the dominant pattern is one
  // broadcast merged sketch probed by many candidate rows.
  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedSketch: CountMinSketch = _

  override def nullSafeEval(sk: Any, item: Any): Any = {
    val bytes = sk.asInstanceOf[Array[Byte]]
    if (cachedSketch == null || !java.util.Arrays.equals(cachedBytes, bytes)) {
      cachedSketch = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
      cachedBytes = bytes.clone() // defensive: never alias an eval buffer
    }
    // Same ingestion path as the builtin string-column sketch build:
    // UTF-8 bytes through the binary hash.
    cachedSketch.estimateCount(item.asInstanceOf[UTF8String].getBytes)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

/** Misra–Gries k-counter heavy-hitter summary as a mergeable Catalyst
  * aggregate — the deterministic-memory counterpart of [[CmsMergeAgg]]:
  * CMS answers point queries over the whole domain with probabilistic
  * error; Misra–Gries keeps exactly k counters and deterministically
  * guarantees, for ANY merge schedule (Agarwal et al., "Mergeable
  * Summaries", PODS '12):
  *
  *   - never overestimates: est(x) ≤ true(x)
  *   - bounded undercount:  est(x) ≥ true(x) − N/k   (N = stream length)
  *   - every item with true(x) > N/k survives in the summary
  *
  * update is classic MG generalized to weighted adds (insert/increment,
  * then if > k counters subtract the (k+1)-th largest from all and drop
  * non-positives); merge is pointwise addition followed by the same
  * prune. State is k counters regardless of stream length — the
  * per-partition partials shuffle O(k) entries, and the merged summary
  * answers "what is frequent" with no second pass over the data.
  * Returns the summary as map<string, bigint>; absent key = est 0.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k > 0, s"misra_gries: k must be positive, got $k")

  private type Buf = scala.collection.mutable.HashMap[String, Long]

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING item, got ${child.dataType.sql}")
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): Buf = scala.collection.mutable.HashMap.empty

  /** If more than k counters survive, subtract the (k+1)-th largest count
    * from every counter and drop the non-positive — the weighted-MG prune
    * whose total decrement per unit of pruned weight is what yields the
    * N/k bound. */
  private def prune(m: Buf): Buf = {
    if (m.size > k) {
      val vs = m.values.toArray
      java.util.Arrays.sort(vs)
      val sub = vs(vs.length - (k + 1)) // (k+1)-th largest
      val dead = scala.collection.mutable.ArrayBuffer.empty[String]
      m.mapValuesInPlace((_, v) => v - sub)
      m.foreach { case (key, v) => if (v <= 0) dead += key }
      dead.foreach(m.remove)
    }
    m
  }

  override def update(buffer: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val s = v.asInstanceOf[UTF8String].toString
      buffer.update(s, buffer.getOrElse(s, 0L) + 1L)
      prune(buffer)
    }
  }

  override def merge(buffer: Buf, other: Buf): Buf = {
    other.foreach { case (key, c) =>
      buffer.update(key, buffer.getOrElse(key, 0L) + c)
    }
    prune(buffer)
  }

  override def eval(buffer: Buf): Any = {
    val entries = buffer.toArray
    val keys: Array[Any] = entries.map(e => UTF8String.fromString(e._1): Any)
    val values: Array[Any] = entries.map(e => e._2: Any)
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(keys),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(values))
  }

  // Keys are length-prefixed raw UTF-8 (writeInt + bytes), NOT writeUTF:
  // writeUTF throws UTFDataFormatException past 65535 encoded bytes, and a
  // pathological token must round-trip through shuffle serialization, not
  // fail the stage.
  override def serialize(buffer: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (key, v) =>
      val kb = key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(v)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      m.update(new String(kb, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}

/** (long key) → membership probe against a pre-built serialized bloom
  * filter — the manual semi-join-reduction kernel. Spark's optimizer
  * injects this shape itself for eligible shuffle joins
  * (`spark.sql.optimizer.runtime.bloomFilter.*`, pinned working in
  * RuntimeFilterSpec); this expression is the EXPLICIT fallback for the
  * places the injection can't reach — a filter derived in a previous
  * job/statement, a dim side behind a non-join boundary, engines or
  * paths without the rule — exactly as `q_join_salted` is the manual
  * fallback for AQE's skew split. The filter bytes are a plan literal:
  * KBs–MBs (fpp-sized), shipped once per task like a broadcast, never
  * per row. Deserialization is once per expression INSTANCE (transient
  * lazy), and the probe itself is codegen'd — a reference-object call
  * inside the scan's WholeStageCodegen filter, upstream of the shuffle,
  * so the 100-TB fact side drops non-joining rows before paying
  * exchange bytes. No false negatives (the join stays exact, which the
  * oracle proves); false positives only cost shuffle bytes. */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  // The filter rides as a foldable BINARY child (the shape of Spark's own
  // internal BloomFilterMightContain, whose Literal gives content-based
  // equals/hashCode — a raw Array[Byte] constructor field would compare by
  // reference and defeat canonicalization-driven reuse).
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT key, got ${left.dataType.sql}")
    else if (right.dataType != BinaryType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable BINARY filter, got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(
      right.eval().asInstanceOf[Array[Byte]]))

  /** Called from generated code — must be public and row-cheap. */
  def containsLong(v: Long): Boolean = filter.mightContainLong(v)

  override def nullSafeEval(v: Any, ignoredBloom: Any): Any =
    containsLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the deserialized filter is a once-per-instance reference object; the
    // literal child's own codegen is just a cached reference, never a
    // per-row byte-array materialization
    val ref = ctx.addReferenceObj("graftBloom", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, (key, _bloom) => s"${ev.value} = $ref.containsLong($key);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object SketchExpressions {
  /** Aggregate: union of serialized count-min sketches. */
  def cmsMerge(c: Column): Column =
    GraftShims.column(CmsMergeAgg(GraftShims.expression(c)).toAggregateExpression())

  /** Scalar: estimated count of `item` in the serialized sketch. */
  def cmsEstimate(sketch: Column, item: Column): Column =
    GraftShims.column(CmsEstimate(GraftShims.expression(sketch), GraftShims.expression(item)))

  /** Aggregate: Misra–Gries k-counter heavy-hitter summary (map<string,bigint>). */
  def misraGries(c: Column, k: Int): Column =
    GraftShims.column(MisraGriesAgg(GraftShims.expression(c), k).toAggregateExpression())

  /** Scalar: bloom-filter membership probe for a BIGINT key against
    * serialized filter bytes (see [[BloomMightContain]]). */
  def bloomMightContain(key: Column, bloom: Array[Byte]): Column =
    GraftShims.column(BloomMightContain(GraftShims.expression(key),
      org.apache.spark.sql.catalyst.expressions.Literal.create(bloom, BinaryType)))
}
