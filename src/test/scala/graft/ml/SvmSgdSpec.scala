package graft.ml

import graft.SparkSpec

/** Corrected multi-epoch SVM: epochs must chain (weights evolve), the
  * first epoch must equal the single-pass gradient model, and checkpoints
  * must land like the reference's model_epoch_<e> files. */
class SvmSgdSpec extends SparkSpec {

  test("epoch 1 equals the single-pass gradient sums (all docs misclassified at w=0)") {
    val (summary, _) = SvmSgd.train(spark, sfDir, epochs = 1)
    val s1 = summary.head()
    val trainDocs = graft.ops.Corpus.cleanedSvm(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("is_train")).count()
    // at w=0 every doc has margin 0 < 1 → all misclassified
    assert(s1.getLong(1) === trainDocs)
    // and the weight set equals the epoch-5 bug-compat model's vocabulary
    val vocab = graft.ops.SentimentSvm.weights(spark, sfDir).count()
    assert(s1.getLong(2) === vocab)
  }

  test("epochs chain: misclassification count changes as weights learn") {
    val (summary, weights) = SvmSgd.train(spark, sfDir, epochs = 3)
    val rows = summary.collect().sortBy(_.getInt(0))
    assert(rows.length === 3)
    // after epoch 1 the model is non-zero, so later epochs see different margins
    val Seq(m1, m2, m3) = rows.toSeq.map(_.getLong(1))
    assert(m2 != m1 || m3 != m2, "chained epochs must change the margin landscape")
    assert(weights.count() > 0)
  }

  test("epoch checkpoints are written and readable") {
    val dir = java.nio.file.Files.createTempDirectory("graft_svm_ckpt").toString
    SvmSgd.train(spark, sfDir, epochs = 2, checkpointDir = Some(dir))
    val e2 = spark.read.parquet(s"$dir/model_epoch_2")
    assert(e2.columns.toSeq === Seq("word", "weight"))
    assert(e2.count() > 0)
  }
}
