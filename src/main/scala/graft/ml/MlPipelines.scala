package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.{LinearSVC, NaiveBayes}
import org.apache.spark.ml.feature.{HashingTF, IDF, Tokenizer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Corpus

/** MLlib estimator/transformer surface — SURVEY §2.4 F1-F3, §2.9 R1,
  * §2.10 M1-M4 — mirroring the reference's PySpark pipelines
  * (`Spark/NaiveBayes/python/NaiveBayes.py:50-75`,
  * `Spark/SVM/python/SVM.py:50-76`) in pure JVM Scala:
  * Tokenizer → HashingTF(2^18) → IDF → {NaiveBayes | LinearSVC(maxIter=10,
  * regParam=0.1)} → randomSplit(0.75/0.25, seed=1234) → metrics.
  *
  * These queries are rows-only checked (no DuckDB oracle): feature hashing
  * (MurmurHash3 buckets) and the estimators are engine-defined, and
  * `randomSplit` membership is partition-layout-dependent (SURVEY §2.9 R1).
  * Deterministic sub-results (token counts, metric arithmetic) are oracled
  * through the hand-rolled pipeline queries instead.
  *
  * Scale: `fit` runs per-partition treeAggregate jobs (NB single-pass;
  * LinearSVC OWLQN ≤10 iterations over cached instances) — no driver-side
  * data beyond coefficient vectors.
  */
object MlPipelines {
  type Q = (SparkSession, String) => DataFrame

  private val Seed = 1234L

  /** Labeled corpus for ML: (label double, tweet string) like the reference's
    * two-column DataFrame (`NaiveBayes.py:48`). */
  private def corpus(s: SparkSession, d: String): DataFrame =
    Corpus.docs(s, d).select(Corpus.label.as("label"), col("text").as("tweet"))

  private def featurize = {
    val tok = new Tokenizer().setInputCol("tweet").setOutputCol("words")
    val tf = new HashingTF().setInputCol("words").setOutputCol("rawFeatures") // default 2^18
    val idf = new IDF().setInputCol("rawFeatures").setOutputCol("features")
    (tok, tf, idf)
  }

  /** Confusion + accuracy/weighted-F1 equivalent of `MulticlassMetrics`
    * (A5) as a pure DataFrame aggregation over (prediction, label). */
  private def binaryMetricsDf(scored: DataFrame): DataFrame =
    scored.agg(
      sum(when(col("prediction") === 1.0 && col("label") === 1.0, 1L).otherwise(0L)).as("tp"),
      sum(when(col("prediction") === 1.0 && col("label") === 0.0, 1L).otherwise(0L)).as("fp"),
      sum(when(col("prediction") === 0.0 && col("label") === 0.0, 1L).otherwise(0L)).as("tn"),
      sum(when(col("prediction") === 0.0 && col("label") === 1.0, 1L).otherwise(0L)).as("fn"))
    .select(col("tp"), col("fp"), col("tn"), col("fn"),
      round((col("tp") + col("tn")) / nullif(col("tp") + col("fp") + col("tn") + col("fn"), lit(0L)), 6).as("accuracy"),
      round((lit(2L) * col("tp")) / nullif(lit(2L) * col("tp") + col("fp") + col("fn"), lit(0L)), 6).as("f1"))

  private def fitScore[M <: org.apache.spark.ml.Model[M]](
      s: SparkSession, d: String,
      estimator: org.apache.spark.ml.Estimator[M]): DataFrame = {
    val (tok, tf, idf) = featurize
    val data = corpus(s, d)
    // DELIBERATE reference parity: IDF is fitted on the FULL corpus and
    // the split happens on the already-featurized frame, exactly as
    // `NaiveBayes.py:56-61` does (fit -> transform -> randomSplit). That
    // leaks test-set document frequencies into the features — reproducing
    // the reference's behavior is the contract here, so do not "fix" the
    // order without also changing the published-metrics comparison.
    val pipe = new Pipeline().setStages(Array(tok, tf, idf))
    // persist: the featurized frame feeds the estimator fit (train side) and
    // the scoring pass (test side) — uncached, tokenize+hash+IDF-scale reruns
    // per consumer
    val prepared = pipe.fit(data).transform(data).select("label", "features")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val Array(train, test) = prepared.randomSplit(Array(0.75, 0.25), seed = Seed)
    // transform with a summary-FREE copy of the model: classifier training
    // summaries (e.g. LinearSVCTrainingSummaryImpl) hold a SparkSession, and
    // the prediction UDF captures the model, so the summary would ride into
    // every task closure. Spark 4.1's classic SparkSession happens to pass
    // task serialization only while its lazy observationManager field is
    // still null — the first `Dataset.observe` anywhere in the JVM (obs1)
    // initializes it, after which an un-copied LinearSVCModel.transform
    // dies with "Task not serializable". `copy` transfers params and
    // coefficients but never the summary.
    val model = estimator.fit(train).copy(org.apache.spark.ml.param.ParamMap.empty)
    binaryMetricsDf(model.transform(test).select("prediction", "label"))
  }

  /** M1/M2: multinomial NB (smoothing 1.0 default) fit+transform → metrics. */
  val mlNb: Q = (s, d) =>
    fitScore(s, d, new NaiveBayes()) // defaults: smoothing=1.0, multinomial

  /** M3/M4: LinearSVC(maxIter=10, regParam=0.1) fit+transform → metrics. */
  val mlSvm: Q = (s, d) =>
    fitScore(s, d, new LinearSVC().setMaxIter(10).setRegParam(0.1))

  /** F1-F3: HashingTF + IDF shapes — per-doc nnz/total-TF before and after
    * IDF scaling (deterministic ints + engine-defined doubles; rows-only). */
  val f123: Q = (s, d) => {
    val (tok, tf, idf) = featurize
    val data = corpus(s, d)
    val withTf = tf.transform(tok.transform(data))
    val scaled = idf.fit(withTf).transform(withTf)
    import org.apache.spark.ml.linalg.Vector
    val nnz = udf((v: Vector) => v.numNonzeros)
    // sum over ACTIVE entries only — v.toArray would densify the 2^18-dim
    // sparse vector per row (250k doubles/row; dominated the whole bench)
    val tot = udf((v: Vector) => {
      var s = 0.0
      v.foreachActive((_, x) => s += x)
      s
    })
    scaled.select(
      nnz(col("rawFeatures")).as("tf_nnz"),
      round(tot(col("rawFeatures")), 0).cast("long").as("tf_total"),
      // after-IDF: numNonzeros can DROP (a term present in every doc has
      // idf = 0, zeroing its scaled value), and the value sum becomes the
      // engine-defined double the rows-only check tolerates
      nnz(col("features")).as("idf_nnz"),
      tot(col("features")).as("idf_total"))
      .groupBy("tf_nnz", "tf_total", "idf_nnz")
      .agg(count(lit(1)).as("n"), round(sum("idf_total"), 3).as("sum_idf_total"))
      .orderBy("tf_nnz", "tf_total", "idf_nnz")
  }

  /** R1: randomSplit(0.75/0.25, seed) disjointness + coverage invariants:
    * train+test = total and overlap = 0 (membership itself is engine RNG). */
  val r1: Q = (s, d) => {
    val data = Corpus.docs(s, d).select("doc_id")
    val Array(train, test) = data.randomSplit(Array(0.75, 0.25), seed = Seed)
    val nAll = data.count()
    val nTrain = train.count()
    val nTest = test.count()
    val overlap = train.intersect(test).count()
    val s2 = s
    import s2.implicits._
    Seq((nAll, nTrain, nTest, overlap, nTrain + nTest == nAll, overlap == 0L))
      .toDF("n_total", "n_train", "n_test", "n_overlap", "covers", "disjoint")
  }

  val queries: Map[String, Q] = Map(
    "m1_ml_naive_bayes" -> mlNb,
    "m3_ml_linear_svc" -> mlSvm,
    "f1_hashing_tf_idf" -> f123,
    "r1_random_split" -> r1,
  )

  /** No DuckDB oracles — engine-defined results; driver records rows-only. */
  val oracle: Map[String, String] = Map()
}
