package graft.ops

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{HashingTF, RegexTokenizer}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Model-based document quality scoring — the fastText-style classifier
  * gate every large LLM-corpus pipeline runs after the heuristic gates
  * (CCNet's LM filter, fastText quality classifiers): train a linear
  * model on hashed bag-of-words features over a SMALL labeled sample,
  * then score the full corpus at scan speed.
  *
  * The 100 TB shape is the split between the two halves:
  *
  *   - [[train]] runs MLlib (tokenizer → hashing-TF → logistic
  *     regression) on the labeled sample — driver-coordinated, sample-
  *     sized, executed once.
  *   - [[scoreWithWeights]] needs NO MLlib at inference: the exported
  *     weight vector rides the plan as a literal array and the logit is
  *     one codegen'd higher-order-function pass per document — token →
  *     hash → weight lookup → sum. No shuffle, no UDF, no model
  *     object on executors; 100 TB scores at scan speed. Parity with
  *     the MLlib model is exact because term hashing goes through the
  *     native [[graft.functions.TermIndex]] expression, which
  *     reproduces HashingTF's `hashUnsafeBytes2` — NOT SQL `hash()`,
  *     whose murmur3 variant diverges on tail bytes (see TermIndex
  *     scaladoc). Asserted to 1e-6 in QualityClassifierSpec — only
  *     float summation order differs.
  *
  * [[scorePortable]] is the oracle-checkable twin (engine-portable
  * PolyHash indices, integer weights derived from the index by a fixed
  * formula, exact integer logits) — same plan shape, every value
  * reproducible in DuckDB.
  */
object QualityClassifier {

  /** Fitted linear scorer: hashed-TF dims, per-index weights, intercept. */
  final case class QualityModel(dims: Int, weights: Array[Double], intercept: Double)

  private val TokenPattern = "\\s+"

  /** Train tokenizer → HashingTF(dims) → logistic regression on
    * `labelCol` (0/1) over `textCol`, returning the exported linear
    * model. Run this on a labeled SAMPLE (thousands of rows), never the
    * full corpus.
    */
  def train(
      labeled: DataFrame,
      textCol: String,
      labelCol: String,
      dims: Int = 1 << 12,
      maxIter: Int = 25): QualityModel = {
    val pipeline = new Pipeline().setStages(Array(
      new RegexTokenizer().setInputCol(textCol).setOutputCol("__tokens")
        .setPattern(TokenPattern).setToLowercase(false),
      new HashingTF().setInputCol("__tokens").setOutputCol("__features")
        .setNumFeatures(dims),
      new LogisticRegression().setFeaturesCol("__features").setLabelCol(labelCol)
        .setMaxIter(maxIter).setRegParam(1e-4)))
    val model = pipeline.fit(labeled)
    val lr = model.stages.last
      .asInstanceOf[org.apache.spark.ml.classification.LogisticRegressionModel]
    QualityModel(dims, lr.coefficients.toArray, lr.intercept)
  }

  /** Score `textCol` with an exported model: adds `quality_logit`
    * (margin; sigmoid of it is the keep-probability) as ONE
    * whole-stage-codegen HOF pass — `hash()` here is bit-identical to
    * HashingTF's term hashing, so indices match the training features
    * exactly.
    */
  def scoreWithWeights(df: DataFrame, textCol: String, m: QualityModel): DataFrame = {
    import org.apache.spark.sql.GraftShims
    def termIndex(c: Column): Column =
      GraftShims.column(graft.functions.TermIndex(GraftShims.expression(c), m.dims))
    val w = lit(m.weights)
    val tokens = filter(split(col(textCol), TokenPattern), t => length(t) > 0)
    val logit = aggregate(
      transform(tokens, t => element_at(w, termIndex(t) + 1)),
      lit(m.intercept),
      (acc, x) => acc + x)
    df.withColumn("quality_logit", logit)
  }

  /** Keep/drop gate at a probability threshold: logit > ln(p/(1-p)). */
  def gate(df: DataFrame, textCol: String, m: QualityModel, keepProb: Double = 0.5): DataFrame = {
    val threshold = math.log(keepProb / (1.0 - keepProb))
    scoreWithWeights(df, textCol, m).filter(col("quality_logit") > threshold)
  }

  /** Fitted K-class linear scorer: per-class weight rows + intercepts
    * over the same hashed-TF features; `labels` in the (sorted,
    * deterministic) index order the trainer used.
    */
  final case class MultiClassModel(
      dims: Int,
      labels: Seq[String],
      weights: Seq[Array[Double]],
      intercepts: Array[Double])

  /** Multinomial extension of [[train]] — the model-based LANGUAGE-ID
    * (or any K-way document routing) pass: fit multinomial logistic
    * regression over hashed bag-of-words on a labeled sample, export
    * the K weight rows. Label→index mapping is the SORTED distinct
    * label set, not StringIndexer's frequency order, so the exported
    * model is deterministic in the sample's content.
    */
  def trainMultiClass(
      labeled: DataFrame,
      textCol: String,
      labelCol: String,
      dims: Int = 1 << 12,
      maxIter: Int = 25): MultiClassModel = {
    val raw = labeled.select(col(labelCol)).distinct().collect().map(_.getString(0))
    require(!raw.contains(null),
      s"trainMultiClass: null '$labelCol' label(s) in the sample — a null " +
        "class has no index; filter or label those rows first")
    val labels = raw.sorted.toSeq
    require(labels.size >= 2, s"need >= 2 classes, got $labels")
    val toIdx = labels.zipWithIndex
      .foldLeft(lit(-1.0)) { case (acc, (l, i)) =>
        when(col(labelCol) === l, lit(i.toDouble)).otherwise(acc)
      }
    val pipeline = new Pipeline().setStages(Array(
      new RegexTokenizer().setInputCol(textCol).setOutputCol("__tokens")
        .setPattern(TokenPattern).setToLowercase(false),
      new HashingTF().setInputCol("__tokens").setOutputCol("__features")
        .setNumFeatures(dims),
      new LogisticRegression().setFeaturesCol("__features").setLabelCol("__label")
        .setFamily("multinomial").setMaxIter(maxIter).setRegParam(1e-4)))
    val model = pipeline.fit(labeled.withColumn("__label", toIdx))
    val lr = model.stages.last
      .asInstanceOf[org.apache.spark.ml.classification.LogisticRegressionModel]
    val k = labels.size
    val cm = lr.coefficientMatrix // k x dims
    val rows = (0 until k).map(r => Array.tabulate(dims)(c => cm(r, c)))
    MultiClassModel(dims, labels, rows, lr.interceptVector.toArray)
  }

  /** K-way classification at scan speed — [[scoreWithWeights]]'s
    * multi-class twin: K codegen'd HOF passes (one per class row, K is
    * small) produce the logit array; `predicted_label` is the argmax
    * (first-max on exact ties, deterministic). No MLlib, no UDF, no
    * shuffle at inference.
    */
  def classifyWithWeights(
      df: DataFrame, textCol: String, m: MultiClassModel): DataFrame = {
    import org.apache.spark.sql.GraftShims
    def termIndex(c: Column): Column =
      GraftShims.column(graft.functions.TermIndex(GraftShims.expression(c), m.dims))
    val tokens = filter(split(col(textCol), TokenPattern), t => length(t) > 0)
    val logits = m.weights.zipWithIndex.map { case (wk, k) =>
      aggregate(
        transform(tokens, t => element_at(lit(wk), termIndex(t) + 1)),
        lit(m.intercepts(k)),
        (acc, x) => acc + x)
    }
    val arr = array(logits: _*)
    df.withColumn("label_logits", arr)
      .withColumn("predicted_label",
        element_at(lit(m.labels.toArray),
          array_position(arr, array_max(arr)).cast("int")))
  }

  /** Engine-portable twin for the correctness gate: indices from the
    * portable PolyHash, INTEGER weights derived from the index by
    * `w(i) = ((i+1) * 2654435761) mod 1001 - 500`, logit as an exact
    * long sum — every step reproducible in ANSI-ish SQL, so DuckDB
    * value-checks the whole scoring plan shape (tokenize → hash → index
    * → weight → sum) that the murmur3 variant runs in production.
    */
  def scorePortable(df: DataFrame, textCol: String, idCol: String, dims: Int): DataFrame = {
    import org.apache.spark.sql.GraftShims
    def polyHash(c: Column): Column =
      GraftShims.column(graft.functions.PolyHash(GraftShims.expression(c)))
    val tokens = filter(split(col(textCol), TokenPattern), t => length(t) > 0)
    val logit = aggregate(
      transform(tokens, t =>
        ((polyHash(t) % dims + lit(1L)) * lit(2654435761L)) % 1001L - lit(500L)),
      lit(0L),
      (acc, x) => acc + x)
    df.select(col(idCol), logit.cast(LongType).as("logit_scaled"))
  }
}
