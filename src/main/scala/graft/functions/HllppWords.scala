package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType}

import graft.lake.NdvSketch

/** The register words of Spark's own HyperLogLog++ as a value: an
  * aggregate that runs the SAME per-value update and the SAME
  * register merge as `approx_count_distinct`
  * ([[org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper]]
  * — update, merge and estimator all delegated, nothing
  * re-implemented) but RETURNS the packed big-endian register words
  * instead of the estimate.
  *
  * This is the write-side half of the `write.ndv-columns` metadata
  * pushdown ([[graft.lake.NdvSketch]]): one of these per declared
  * column in the per-file stats pass records a sketch whose merge
  * across any file subset reproduces — bit-for-bit — the register
  * state a scan-side `approx_count_distinct` over those files
  * reaches, because register max is associative/commutative/
  * idempotent and the estimate is a pure function of the final state.
  *
  * Null inputs are skipped exactly as the scan-side aggregate skips
  * them; the empty sketch is all-zero words (the merge identity), so
  * a zero-row or all-null file records the identity and can never
  * perturb a union.
  */
case class HllppWords(
    child: Expression,
    p: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  @transient private lazy val helper = NdvSketch.helperFor(p)

  /** The SQL surface accepts any literal int — an unchecked precision
    * past the band would OOM (p=26 is ~54 MB of registers per group
    * buffer) or overflow the helper's Int register math outright
    * (p≥31), so refuse at analysis time with a real error message.
    */
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (p < NdvSketch.MinP || p > NdvSketch.MaxP)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_hll_words precision must be in " +
          s"[${NdvSketch.MinP}, ${NdvSketch.MaxP}], got $p")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](helper.numWords)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null)
      helper.update(new NdvSketch.WordsRow(buffer), 0, v, child.dataType)
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    helper.merge(new NdvSketch.WordsRow(buffer), new NdvSketch.WordsRow(other), 0, 0)
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    NdvSketch.wordsToPackedBytes(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] =
    NdvSketch.wordsToPackedBytes(buffer)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    NdvSketch.packedBytesToWords(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll_words"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllppWords =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllppWords =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllppWords =
    copy(child = newChild)
}

/** Combining aggregate for the GROUPED hybrid-range ndv rewrite:
  * merges per-group BINARY register-word partials (an interior
  * LocalRelation row and/or a boundary [[HllppWords]] row) by register
  * max — the union's partial columns are never null (both sides always
  * emit words; the all-zero identity for empty sketches), but a null
  * input is skipped defensively. Output is the merged words; the
  * [[HllMergeEstimate]] finisher above turns them into the estimate.
  */
case class HllppMergeWords(
    child: Expression,
    p: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  @transient private lazy val helper = NdvSketch.helperFor(p)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](helper.numWords)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null)
      helper.merge(new NdvSketch.WordsRow(buffer),
        new NdvSketch.WordsRow(
          NdvSketch.packedBytesToWords(v.asInstanceOf[Array[Byte]])), 0, 0)
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    helper.merge(new NdvSketch.WordsRow(buffer), new NdvSketch.WordsRow(other), 0, 0)
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    NdvSketch.wordsToPackedBytes(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] =
    NdvSketch.wordsToPackedBytes(buffer)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    NdvSketch.packedBytesToWords(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll_merge_words"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllppMergeWords =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllppMergeWords =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllppMergeWords =
    copy(child = newChild)
}

/** Scalar finisher for the hybrid-range ndv rewrite
  * ([[graft.sql.GraftRelationExpansion]]): merges a boundary scan's
  * register words (the [[HllppWords]] aggregate's BINARY output) with
  * the metadata interior's pre-merged words and returns Spark's own
  * estimate of the union — register max is set-union semantics, so
  * rows counted by both sides can never double-count. Evaluated once
  * per query on the one-row boundary aggregate; CodegenFallback is
  * free there.
  */
case class HllMergeEstimate(
    child: Expression, interior: Array[Byte], p: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  @transient private lazy val helper = NdvSketch.helperFor(p)

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    // the boundary aggregate's buffer starts all-zero (the merge
    // identity), so even an empty boundary yields valid words
    val boundary = child.eval(input).asInstanceOf[Array[Byte]]
    val acc = new NdvSketch.WordsRow(NdvSketch.packedBytesToWords(boundary))
    helper.merge(acc, new NdvSketch.WordsRow(
      NdvSketch.packedBytesToWords(interior)), 0, 0)
    helper.query(acc, 0)
  }

  override protected def withNewChildInternal(newChild: Expression): HllMergeEstimate =
    copy(child = newChild)
}
