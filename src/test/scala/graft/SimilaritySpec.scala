package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  // 4-dim corpus with an obvious structure: 1≈0 (same direction),
  // 2 orthogonal, 3 opposite, 4 nearly aligned with 0.
  private val embeddings = Seq(
    (0L, vec(1, 0, 0, 0), 0),
    (1L, vec(2, 0, 0, 0), 0),
    (2L, vec(0, 1, 0, 0), 0),
    (3L, vec(-1, 0, 0, 0), 1),
    (4L, vec(0.9, 0.1, 0, 0), 1))
    .toDF("vec_id", "embedding", "label")

  test("cosine: aligned=1, orthogonal=0, opposite=-1") {
    val r = embeddings.as("a").crossJoin(embeddings.as("b"))
      .filter(col("a.vec_id") === 0 && col("b.vec_id").isin(1, 2, 3))
      .select(col("b.vec_id"),
        round(Similarity.cosine(
          col("a.embedding").cast("array<double>"),
          col("b.embedding").cast("array<double>")), 6).as("c"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(1L) == 1.0)
    assert(r(2L) == 0.0)
    assert(r(3L) == -1.0)
  }

  test("native ArrayDot is bit-identical to the built-ins fold on fixture vectors") {
    val embs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v")).limit(300)
    val pairs = embs.as("a").crossJoin(embs.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id")).limit(2000)
    val diff = pairs.select(
      Similarity.dot(col("a.v"), col("b.v")).as("native"),
      Similarity.dotBuiltins(col("a.v"), col("b.v")).as("ref"))
      .filter(col("native") =!= col("ref")).count()
    assert(diff == 0)
  }

  test("bruteForceTopK ranks by cosine with deterministic ties") {
    val top = Similarity.bruteForceTopK(embeddings, Seq(0L), k = 3)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(top.head == (1L, 1))      // same direction → rank 1
    assert(top(1) == (4L, 2))        // nearly aligned → rank 2
    assert(top(2) == (2L, 3))        // orthogonal beats opposite
  }

  test("lshTopK: results are a subset of brute-force candidates, same-direction vectors share a bucket") {
    val brute = Similarity.bruteForceTopK(embeddings, Seq(0L), 4, vecCol = "embedding")
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    val lsh = Similarity.lshTopK(embeddings, Seq(0L), 4, nPlanes = 4, dim = 4)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(lsh.nonEmpty)
    // identical-direction vector must land in the same hyperplane bucket
    assert(lsh.map(_._1).contains(1L))
    // every LSH score equals the brute-force score for that vec
    lsh.foreach { case (id, c) => assert(brute(id) == c) }
  }

  test("lshTopK recall on the fixture corpus is reasonable") {
    val sf = "/root/testdata/sf0.001"
    val embs = Tables.load(spark, sf, "embeddings")
    val qids = Seq(0L, 1L, 2L)
    val brute = Similarity.bruteForceTopK(embs, qids, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(embs, qids, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    // single-probe 6-plane LSH: recall well above random (64 buckets)
    assert(recall > 0.2, s"recall=$recall")
  }

  test("ivfTopK: scores agree with brute force, same-direction vector shares the cell") {
    val sf = "/root/testdata/sf0.001"
    val embs = Tables.load(spark, sf, "embeddings")
    val qids = Seq(0L, 1L, 2L)
    val brute = Similarity.bruteForceTopK(embs, qids, 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val ivf = Similarity.ivfTopK(embs, qids, 10, (0 until 16).map(_.toLong * 7))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(ivf.nonEmpty)
    // every IVF hit carries the exact brute-force score (subset property)
    ivf.foreach { case (k, c) => assert(brute.get(k).forall(_ == c)) }
    // the recall of single-probe IVF is bounded but nonzero
    val recall = ivf.map(_._1).count(brute.contains).toDouble / brute.size
    assert(recall > 0.1, s"recall=$recall")
  }

  test("ivf multi-probe: recall(nprobe=2) >= recall(nprobe=1), scores stay exact") {
    val sf = "/root/testdata/sf0.001"
    val embs = Tables.load(spark, sf, "embeddings")
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val cids = (0 until 16).map(_.toLong * 7)
    val brute = Similarity.bruteForceTopK(embs, qids, 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    def run(np: Int): Array[((Long, Long), Double)] =
      Similarity.ivfTopK(embs, qids, 10, cids, nprobe = np)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    def recall(xs: Array[((Long, Long), Double)]): Double =
      xs.map(_._1).count(brute.contains).toDouble / brute.size
    val p1 = run(1)
    val p2 = run(2)
    assert(recall(p2) >= recall(p1),
      s"nprobe=2 recall ${recall(p2)} < nprobe=1 recall ${recall(p1)}")
    // widening the probe set must never change a score, only add candidates
    p2.foreach { case (k, c) => assert(brute.get(k).forall(_ == c)) }
  }

  test("ivfTrain: deterministic Lloyd iterations improve assignment quality") {
    val sf = "/root/testdata/sf0.001"
    val embs = Tables.load(spark, sf, "embeddings")
    import org.apache.spark.sql.functions._
    val corpus = embs.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nv", Similarity.norm(col("v")))
    val initIds = (0 until 8).map(_.toLong)
    def objective(centroids: org.apache.spark.sql.DataFrame): Double =
      Similarity.ivfAssign(corpus, centroids)
        .join(centroids, col("cell") === col("cid"))
        .select(avg(Similarity.cosine(col("v"), col("cv"))).as("o"))
        .collect().head.getDouble(0)
    val init = corpus.filter(col("vec_id").isin(initIds: _*))
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nv").as("ncv"))
    val trained = Similarity.ivfTrain(embs, initIds, iters = 3)
    assert(trained.count() <= 8 && trained.count() > 0)
    // mean member→centroid cosine should not degrade under Lloyd updates
    assert(objective(trained) >= objective(init) - 1e-9)
    // determinism: same seeds → identical centroids
    val again = Similarity.ivfTrain(embs, initIds, iters = 3)
    assert(trained.orderBy("cid").collect().toSeq ==
      again.orderBy("cid").collect().toSeq)
    // trained centroids drive the same search path
    val r = Similarity.ivfTopKWith(corpus, Seq(0L, 1L), 5, trained)
    assert(r.count() > 0)
  }

  test("nearDupPairs finds aligned pairs within label blocks only") {
    val pairs = Similarity.nearDupPairs(embeddings, "label", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L))) // 3,4 share label 1 but are anti-aligned
  }
}
