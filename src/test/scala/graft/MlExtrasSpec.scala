package graft

import graft.ml.LogReg
import graft.similarity.KMeans
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MlExtrasSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("PCA: unit-norm loadings, eigen residual small, deterministic") {
    val sf = "/root/testdata/sf0.001"
    def run() = SparkEntry.queries("ml_pca")(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    val rows = run()
    assert(rows.length == 4)
    val v = rows.map(_._2)
    val lambda = rows.head._3
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-3, "loadings not unit")
    // top eigenvalue of a correlation matrix is >= trace/4 = 1
    assert(lambda >= 1.0 - 1e-6)
    // eigen residual: recompute C from the same data, check Cv ≈ λv
    import spark.implicits._
    val li = Tables.lineitem(spark, sf)
    val names = rows.map(_._1) // sorted: discount, extendedprice, quantity, tax
    val cors = (for { i <- 0 until 4; j <- 0 until 4 } yield (i, j)).map {
      case (i, j) if i == j => 1.0
      case (i, j) => li.agg(corr(col(names(i)), col(names(j)))).head.getDouble(0)
    }
    val resid = (0 until 4).map { i =>
      val cv = (0 until 4).map(j => cors(i * 4 + j) * v(j)).sum
      math.abs(cv - lambda * v(i))
    }.max
    assert(resid < 0.05, s"eigen residual $resid")
    assert(run().toSeq == rows.toSeq, "not deterministic")
  }

  test("quantile normalization equalizes group distributions") {
    val rows = SparkEntry.queries("feat_quantile_norm")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length == 5)
    // after mapping onto the pooled distribution, every group's mean
    // and sd sit within a tight band of each other
    val means = rows.map(_._3)
    val sds = rows.map(_._4)
    assert((means.max - means.min) / means.max < 0.05,
      s"means diverge: ${means.toSeq}")
    assert((sds.max - sds.min) / sds.max < 0.05, s"sds diverge: ${sds.toSeq}")
  }

  test("logreg: loss decreases and fit is deterministic") {
    import spark.implicits._
    val li = Tables.lineitem(spark, TestSpark.sf)
      .select(($"l_returnflag" === "R").cast("double").as("label"),
        $"l_quantity", $"l_discount")
    val fit = LogReg.fit(li, "label", Seq("l_quantity", "l_discount"), iters = 5)
    assert(fit.losses.size == 5)
    assert(fit.losses.last < fit.losses.head) // GD makes progress
    assert(fit.losses.forall(l => !l.isNaN && !l.isInfinite))
    assert(fit.accuracy >= 0.5)
    val again = LogReg.fit(li, "label", Seq("l_quantity", "l_discount"), iters = 5)
    assert(again.weights == fit.weights && again.intercept == fit.intercept)
  }

  test("logreg separates a linearly separable label") {
    import spark.implicits._
    // label := quantity above its median — near-perfectly separable
    // on the standardized feature, so accuracy must be high.
    val li = Tables.lineitem(spark, TestSpark.sf)
      .select(($"l_quantity" >= 25).cast("double").as("label"), $"l_quantity")
    val fit = LogReg.fit(li, "label", Seq("l_quantity"), iters = 20, lr = 2.0)
    assert(fit.accuracy > 0.95, s"accuracy ${fit.accuracy}")
    assert(fit.weights.head._2 > 0) // higher quantity → label 1
  }

  test("kmeans clusters cover the corpus and are deterministic") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val total = emb.count()
    val out = SparkEntry.queries("ml_kmeans")(spark, TestSpark.sf).collect()
    assert(out.map(_.getLong(0)).toSet.subsetOf((0L until 8L).toSet))
    assert(out.map(_.getLong(1)).sum == total)
    val cents1 = KMeans.fit(emb, "vec_id", "embedding", k = 4, iters = 2)
    val cents2 = KMeans.fit(emb, "vec_id", "embedding", k = 4, iters = 2)
    assert(cents1 == cents2)
  }

  test("kmeans iterations do not increase mean distance to centroid") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, TestSpark.sf)
    def inertia(iters: Int): Double = {
      val cents = KMeans.fit(emb, "vec_id", "embedding", k = 8, iters = iters)
      emb.select(Util.cosine($"embedding",
          KMeans.centroidFor(
            KMeans.cellExpr($"embedding", cents), cents)).as("cos"))
        .agg(avg($"cos")).collect()(0).getDouble(0)
    }
    // mean cosine-to-assigned-centroid should improve with iterations
    assert(inertia(3) >= inertia(0) - 1e-9)
  }

  test("fitMulti fails fast on collinear features") {
    import spark.implicits._
    val df = Tables.lineitem(spark, TestSpark.sf)
      .select($"l_quantity", ($"l_quantity" * 2).as("q2"), $"l_extendedprice")
    val e = intercept[IllegalArgumentException] {
      graft.ml.LinearModel.fitMulti(df, Seq("l_quantity", "q2"),
        "l_extendedprice")
    }
    assert(e.getMessage.contains("collinear"))
  }

  test("one-hot auto-discovery fails fast on high-cardinality columns") {
    import spark.implicits._
    val df = Tables.orders(spark, TestSpark.sf)
      .select($"o_orderkey".cast("string").as("k"))
    val e = intercept[IllegalArgumentException] {
      graft.features.Encoders.oneHotAuto(df, "k", "k", maxCategories = 10)
    }
    assert(e.getMessage.contains("one-hot"))
  }

  test("naive Bayes scores every held-out doc exactly once") {
    // The synthetic corpus shares one vocabulary across languages, so
    // accuracy is uninformative — numeric correctness is the DuckDB
    // oracle's job. Here: every odd (held-out) doc with at least one
    // in-vocabulary token gets exactly one argmax prediction, the
    // predicted labels come from the training label set, and the
    // confusion matrix is deterministic.
    import spark.implicits._
    val rows = SparkEntry.queries("ml_nb_lang")(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val langs = Tables.documents(spark, TestSpark.sf)
      .filter($"doc_id" % 2 === 0).select($"lang").distinct()
      .as[String].collect().toSet
    assert(rows.map(_._2).toSet.subsetOf(langs))
    val heldOut = Tables.documents(spark, TestSpark.sf)
      .filter($"doc_id" % 2 === 1).count()
    val total = rows.map(_._3).sum
    assert(total <= heldOut && total > heldOut / 2,
      s"scored $total of $heldOut held-out docs")
    val again = SparkEntry.queries("ml_nb_lang")(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(again.toSeq == rows.toSeq)
  }
}
