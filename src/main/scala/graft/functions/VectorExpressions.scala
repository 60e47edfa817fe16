// Lives in the spark.sql namespace: AbstractDataType (the inputTypes
// contract of ImplicitCastInputTypes) and the Column<->Expression bridge
// (classic.ExpressionUtils) are private[sql] — the standard packaging for
// third-party native expressions.
package org.apache.spark.sql.graftvec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{LeafLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType, LongType, MapType}

/** Native Catalyst expression for the vector hot path.
  *
  * The builtin route — `aggregate(zip_with(a, b, _*_), 0d, _+_)` — is a
  * higher-order function chain that does NOT participate in whole-stage
  * codegen (interpreted lambda per element, boxed accumulator) and
  * allocates an intermediate zipped array per evaluation. That is fine per
  * row, but pairwise scorers evaluate a dot per CANDIDATE PAIR (n·k for
  * ANN probes, up to n² for exact near-dup baselines) — measured 3× total
  * query time on the sf0.1 near-dup scan. This expression generates a
  * tight primitive loop (`doGenCode`), keeping the scorer inside the
  * codegen'd stage.
  *
  * Semantics match the builtin chain bit-for-bit on equal-length arrays
  * (same left-to-right double accumulation); inputs are implicitly cast
  * (array<float> → array<double>) by ImplicitCastInputTypes exactly like
  * the HOF route's per-element cast. Null/length-mismatch handling:
  * null input → null; a NULL ELEMENT on either side → null result (the
  * HOF route's behavior — checked only when the array type admits nulls,
  * so statically null-free arrays keep the tight loop); trailing elements
  * beyond the shorter array are ignored (the HOF route nulls the whole
  * result instead — pairwise callers always score same-dimension vectors,
  * where both agree).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes
    with Serializable {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_dot"

  private def sideHasNulls(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i); i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val nullCheck =
        if (sideHasNulls(left) || sideHasNulls(right))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Unit-normalization in ONE array pass: out[i] = x[i] / sqrt(Σ x²).
  *
  * Replaces `transform(v, x -> x / l2Norm(v))`, whose interpreted lambda
  * re-evaluated the full O(d) norm per ELEMENT (O(d²) per vector — no
  * common-subexpression elimination inside HOF lambdas; ADVICE r2).
  * Same accumulation order and division as the HOF route, so outputs are
  * bit-identical on null-free input; null input or null element → null
  * (as DotProduct); an all-zero vector divides by zero to NaN elements,
  * exactly as the HOF route did — callers treat zero vectors as
  * degenerate input.
  */
case class NormalizeL2(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes with Serializable {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_normalize_l2"

  private def hasNulls: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getDouble(i); s += v * v; i += 1
    }
    val norm = math.sqrt(s)
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = x.getDouble(i) / norm; i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val nrm = ctx.freshName("nrm")
      val out = ctx.freshName("out")
      val nullCheck =
        if (hasNulls)
          s"if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  double v = $a.getDouble($i);
         |  $s += v * v;
         |}
         |if (!${ev.isNull}) {
         |  double $nrm = java.lang.Math.sqrt($s);
         |  double[] $out = new double[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = $a.getDouble($i) / $nrm;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature of a string-array column in ONE pass over the
  * shingles: each shingle is xxhash64'd ONCE (seed 42, Spark's own
  * XXH64 — the same primitive the builtin xxhash64 uses), then the
  * `numHashes` signature slots are derived by a multiply-shift universal
  * family `h_j = h·a_j + b_j` (odd a_j, natural 2^64 wraparound) with
  * min-accumulation into a primitive long[].
  *
  * The builtin-expression formulation — `transform(seq(0,n-1), i =>
  * array_min(transform(sh, s => xxhash64(i, s))))` — re-hashes every
  * shingle STRING once per hash function (n × |sh| string hashes through
  * an interpreted HOF chain, plus n intermediate arrays); this expression
  * does |sh| string hashes + n·|sh| long multiply-adds in a tight loop.
  * Signature VALUES differ from the builtin formulation (different but
  * equally uniform family — MinHash guarantees are family-agnostic);
  * recall tests pin the operator's behavior.
  */
case class MinHashSignature(child: Expression, numHashes: Int,
    portable: Boolean = false)
    extends UnaryExpression with ImplicitCastInputTypes with Serializable {

  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.StringType))

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType,
    containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_minhash"

  // deterministic splitmix64-scrambled multiply-shift parameters
  @transient private lazy val (as, bs): (Array[Long], Array[Long]) = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val a = Array.tabulate(numHashes)(j => mix(2L * j) | 1L) // odd
    val b = Array.tabulate(numHashes)(j => mix(2L * j + 1))
    (a, b)
  }

  /** Shared by eval and the codegen'd call. Portable mode (ORACLE
    * contract — graft.textops.PortableHash): inner hash = character
    * polynomial mod the 31-bit prime P (ASCII bytes — matching DuckDB's
    * `unicode` per char), slots = `((2j+1)·h + j·7919) mod P` — every
    * product < 2⁵², so DuckDB BIGINT arithmetic reproduces the signature
    * bit-for-bit. Default mode keeps the XXH64 multiply-shift family
    * (the scale path). */
  def computeSig(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val P = 2147483629L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        if (portable) {
          var h = 0L
          val bytes = s.getBytes
          var b = 0
          while (b < bytes.length) {
            h = (h * 131L + (bytes(b) & 0xffL)) % P
            b += 1
          }
          var j = 0
          while (j < numHashes) {
            val v = ((2L * j + 1L) * h + j.toLong * 7919L) % P
            if (v < sig(j)) sig(j) = v
            j += 1
          }
        } else {
          val h = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
          var j = 0
          while (j < numHashes) {
            val v = h * as(j) + bs(j)
            if (v < sig(j)) sig(j) = v
            j += 1
          }
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def nullSafeEval(a: Any): Any =
    computeSig(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashExpr", this,
      classOf[MinHashSignature].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.computeSig($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash of a string-array (token) column in ONE pass — the
  * native replacement for the builtin-HOF vote accumulation (per token a
  * `zip_with` over a 64-slot array through interpreted lambdas — the
  * measured q_simhash_pairs hot spot, ~64 boxed lambda evaluations per
  * token).
  *
  * Default mode: one XXH64 (seed 42 — bit-identical to the builtin
  * `xxhash64(string)`) per token, bit j of the hash votes ±1 on signature
  * bit j. Portable mode (ORACLE contract — graft.textops.PortableHash):
  * four character-polynomial hashes per token (multipliers
  * 131/137/139/149 mod the 31-bit prime), signature bit (16c + b) votes
  * with bit b of hash c — exactly the DuckDB-reproducible family the
  * portable HOF formulation defined; both modes produce bit-identical
  * values to their HOF twins (pinned by test). Ties (vote sum 0) leave
  * the bit clear. */
case class SimHashSignature(child: Expression, portable: Boolean = false)
    extends UnaryExpression with ImplicitCastInputTypes with Serializable {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.StringType))

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_simhash"

  private val P = 2147483629L
  private val Mults = Array(131L, 137L, 139L, 149L)

  /** Shared by eval and the codegen'd call. */
  def computeSig(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        if (portable) {
          val bytes = s.getBytes
          var c = 0
          while (c < 4) {
            val m = Mults(c)
            var h = 0L
            var b = 0
            while (b < bytes.length) { h = (h * m + (bytes(b) & 0xffL)) % P; b += 1 }
            var bit = 0
            while (bit < 16) {
              votes(16 * c + bit) += (((h >>> bit) & 1L).toInt * 2) - 1
              bit += 1
            }
            c += 1
          }
        } else {
          val h = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
          var j = 0
          while (j < 64) {
            votes(j) += (((h >>> j) & 1L).toInt * 2) - 1
            j += 1
          }
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override protected def nullSafeEval(a: Any): Any =
    computeSig(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhashExpr", this,
      classOf[SimHashSignature].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.computeSig($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Elementwise sum of array<double> vectors as a native typed aggregate —
  * the M-step primitive for distributed (spherical) k-means.
  *
  * The declarative alternatives both break at scale: `posexplode` +
  * groupBy(cid, pos) shuffles corpus×dim ROWS per iteration (the r2
  * verdict's called-out anti-pattern), and `collect_list` + fold pulls
  * every member vector of a cell into one row. This aggregate keeps one
  * double[] per group per partition (map-side partial aggregation), so
  * the shuffle volume is k × partitions vectors — independent of corpus
  * size.
  *
  * Semantics: null inputs and null elements are skipped entirely (a
  * vector with any null slot contributes nothing — consistent with
  * DotProduct's null-poisoning, but non-destructive for the sum); vectors
  * shorter than the first-seen dimension add to their prefix; empty group
  * → null.
  */
case class VectorSum(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]]
    with ImplicitCastInputTypes with UnaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_vector_sum"

  override def createAggregationBuffer(): Array[Double] = null

  private def addInto(buf: Array[Double], x: ArrayData): Array[Double] = {
    val m = x.numElements()
    var i = 0
    while (i < m) { if (x.isNullAt(i)) return buf; i += 1 }
    if (buf == null) x.toDoubleArray()
    else {
      val n = math.min(buf.length, m)
      i = 0
      while (i < n) { buf(i) += x.getDouble(i); i += 1 }
      buf
    }
  }

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buffer else addInto(buffer, v.asInstanceOf[ArrayData])
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] =
    if (b2 == null) b1
    else if (b1 == null) b2
    else {
      val n = math.min(b1.length, b2.length)
      var i = 0
      while (i < n) { b1(i) += b2(i); i += 1 }
      b1
    }

  override def eval(buffer: Array[Double]): Any =
    if (buffer == null) null else new GenericArrayData(buffer)

  // one marker byte distinguishes a NON-NULL zero-length buffer (a group
  // whose vectors were all empty — eval returns []) from the null
  // nothing-seen buffer: without it, serialize mapped both to zero bytes,
  // so the same group returned [] or null depending on whether partial
  // aggregation crossed a shuffle
  override def serialize(buffer: Array[Double]): Array[Byte] =
    if (buffer == null) Array.emptyByteArray
    else {
      val bb = java.nio.ByteBuffer.allocate(1 + 8 * buffer.length)
      bb.put(1: Byte)
      bb.asDoubleBuffer().put(buffer)
      bb.array()
    }

  override def deserialize(bytes: Array[Byte]): Array[Double] =
    if (bytes.isEmpty) null
    else {
      val out = new Array[Double]((bytes.length - 1) / 8)
      val bb = java.nio.ByteBuffer.wrap(bytes)
      bb.get()
      bb.asDoubleBuffer().get(out)
      out
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSum =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): VectorSum =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Order-sensitive polynomial document fingerprint of a token-array
  * column in ONE pass — the native replacement for the nested builtin-HOF
  * formulation (`aggregate(tokens, 0, (acc, t) => pmod(acc·1000003 +
  * aggregate(chars(t), 0, (a, c) => pmod(a·131 + c, P)), P))`): that
  * chain splits every token into per-character one-element strings and
  * runs two interpreted lambda folds per token — the measured
  * q_text_analysis hot spot. Values are bit-identical (pinned by test):
  * per token a rolling polynomial over CODEPOINTS (matching the HOF's
  * `ascii(ch)` per split character) mod the 31-bit prime P, combined
  * with multiplier 1000003 mod P. Null array → null; a null ELEMENT →
  * null (the HOF's propagation). */
case class PolyFingerprint(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes with Serializable {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.StringType))

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_fingerprint"

  private val P = 2147483629L

  /** Boxed Long (null when a token is null — the HOF propagation). */
  def computeFp(arr: ArrayData): java.lang.Long = {
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val s = arr.getUTF8String(i).toString
      var h = 0L
      var j = 0
      while (j < s.length) {
        val cp = s.codePointAt(j)
        h = (h * 131L + cp) % P
        j += Character.charCount(cp)
      }
      acc = (acc * 1000003L + h) % P
      i += 1
    }
    acc
  }

  override protected def nullSafeEval(a: Any): Any = {
    val r = computeFp(a.asInstanceOf[ArrayData])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("fpExpr", this, classOf[PolyFingerprint].getName)
    nullSafeCodeGen(ctx, ev, a => s"""
      java.lang.Long ${ev.value}Boxed = $ref.computeFp($a);
      if (${ev.value}Boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Boxed.longValue(); }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-physical-partition row counts as a map<int,long> aggregate, built
  * to ride an iterative algorithm's root-level `observe` (CollectMetrics):
  * the superstep-metrics log previously ran a separate count JOB per
  * superstep for exactly this information (a partition-id groupBy over the
  * just-rotated state — measured ~30–50 ms of pure job round-trip per
  * superstep, ~2–3 s across a 72-superstep convergence run). Each task
  * accumulates its own (partitionId → n) entry during the rotation's
  * materialization pass; the metrics accumulator merges the maps on the
  * driver — zero extra jobs, byte-identical log rows.
  *
  * The partition id comes from TaskContext inside `update` (evaluating
  * `spark_partition_id()` as an aggregate child would make the expression
  * non-deterministic, which CollectMetrics handles but the plainer form
  * avoids); rows evaluated outside a task (driver-local fallback paths)
  * count under partition -1. Buffer size is bounded by the number of
  * partitions the aggregate's task sees — one entry per task in the
  * observe use. Empty input → empty map (matching the job form, which
  * logs no rows for an empty state). */
case class PartitionRowCounts(
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.HashMap[Int, Long]]
    with LeafLike[Expression] {

  override def dataType: DataType =
    MapType(IntegerType, LongType, valueContainsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "graft_partition_row_counts"

  override def createAggregationBuffer(): scala.collection.mutable.HashMap[Int, Long] =
    scala.collection.mutable.HashMap.empty

  override def update(buffer: scala.collection.mutable.HashMap[Int, Long],
      input: InternalRow): scala.collection.mutable.HashMap[Int, Long] = {
    val tc = org.apache.spark.TaskContext.get()
    val pid = if (tc == null) -1 else tc.partitionId()
    buffer.update(pid, buffer.getOrElse(pid, 0L) + 1L)
    buffer
  }

  override def merge(b1: scala.collection.mutable.HashMap[Int, Long],
      b2: scala.collection.mutable.HashMap[Int, Long]): scala.collection.mutable.HashMap[Int, Long] = {
    b2.foreach { case (k, v) => b1.update(k, b1.getOrElse(k, 0L) + v) }
    b1
  }

  override def eval(buffer: scala.collection.mutable.HashMap[Int, Long]): Any = {
    // sorted keys: a deterministic external representation for log rows
    val ks = buffer.keys.toArray.sorted
    new ArrayBasedMapData(
      new GenericArrayData(ks.map(k => k: Any)),
      new GenericArrayData(ks.map(k => buffer(k): Any)))
  }

  override def serialize(buffer: scala.collection.mutable.HashMap[Int, Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 * buffer.size)
    buffer.foreach { case (k, v) => bb.putInt(k); bb.putLong(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.HashMap[Int, Long] = {
    val m = scala.collection.mutable.HashMap.empty[Int, Long]
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 12) m.update(bb.getInt(), bb.getLong())
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): PartitionRowCounts =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): PartitionRowCounts =
    copy(inputAggBufferOffset = newOffset)
}

object VectorExpressions {
  /** Codegen'd dot product of two array<numeric> columns, in double. */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Codegen'd one-pass unit normalization of an array<numeric> column. */
  def normalizeL2(a: Column): Column =
    ExpressionUtils.column(NormalizeL2(ExpressionUtils.expression(a)))

  /** Native elementwise-sum aggregate over an array<numeric> column. */
  def vectorSum(a: Column): Column =
    ExpressionUtils.column(
      VectorSum(ExpressionUtils.expression(a)).toAggregateExpression())

  /** Native one-pass MinHash signature (array<long>) of a string array. */
  def minhash(a: Column, numHashes: Int, portable: Boolean = false): Column =
    ExpressionUtils.column(MinHashSignature(ExpressionUtils.expression(a),
      numHashes, portable))

  /** One-pass 64-bit SimHash of a token-array column. */
  def simhash(tokens: Column, portable: Boolean = false): Column =
    ExpressionUtils.column(SimHashSignature(ExpressionUtils.expression(tokens),
      portable))

  /** One-pass polynomial document fingerprint of a token-array column. */
  def fingerprint(tokens: Column): Column =
    ExpressionUtils.column(PolyFingerprint(ExpressionUtils.expression(tokens)))

  /** map(partition_id → rows) metrics aggregate for `Dataset.observe` —
    * the superstep-log fusion (see [[PartitionRowCounts]]). */
  def partitionRowCounts(): Column =
    ExpressionUtils.column(PartitionRowCounts().toAggregateExpression())
}
