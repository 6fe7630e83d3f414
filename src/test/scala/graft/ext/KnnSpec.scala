package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** kNN classification composition: the vote stage ([[Similarity.knnVote]])
  * over IVF-PQ candidates — the documented 100 TB serving path — must
  * agree with the brute-force candidate stream on a corpus where
  * coarse structure exists (the RecallSpec planted-cluster fixture:
  * 16 tight clusters, label = cluster id). */
class KnnSpec extends SparkSpec {
  import spark.implicits._

  test("IVF-PQ candidates through knnVote recover cluster labels, equal to brute") {
    val rnd = new scala.util.Random(7)
    val dim = 64
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val centers = Array.fill(16)(unit(Array.fill(dim)(rnd.nextGaussian())))
    val rows = for (m <- 0 until 30; cl <- 0 until 16) yield {
      val v = unit(centers(cl).map(_ + 0.1 * rnd.nextGaussian()))
      (m.toLong * 16 + cl, v)
    }
    val e = Similarity.vecsOf(spark, rows.toDF("vec_id", "v"))
    val labels = rows.map { case (id, _) => (id, (id % 16).toInt) }
      .toDF("vec_id", "label")

    // queries = member-1 of every cluster (vec_id in [16, 32))
    val ivfCands = Similarity
      .ivfPqTopKOn(e, nprobe = 2, k = 5, qLo = 16, qHi = 32)
      .select(col("query_id"), col("cand_id"))
    val ivfPred = Similarity.knnVote(ivfCands, labels).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("pred_label"),
        r.getAs[Boolean]("correct")))

    assert(ivfPred.length == 16)
    assert(ivfPred.forall(_._3), s"IVF-kNN mislabeled: ${ivfPred.filterNot(_._3).toSeq}")

    // brute candidates through the SAME vote stage agree prediction-
    // for-prediction (k=5 same-cluster neighbors dominate both streams)
    val q = e.filter(col("vec_id") >= 16 && col("vec_id") < 32)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qn"))
    val c = e.select(col("vec_id").as("cand_id"), col("v").as("cv"), col("norm").as("cn"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("cand_id").asc)
    val bruteCands = broadcast(q)
      .join(c, col("query_id") =!= col("cand_id"))
      .withColumn("cos", expr("graft_dot(qv, cv)") / (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(wr)).filter(col("rk") <= 5)
      .select(col("query_id"), col("cand_id"))
    val brutePred = Similarity.knnVote(bruteCands, labels).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("pred_label"))).toMap

    assert(ivfPred.map(p => (p._1, p._2)).toMap == brutePred)
  }
}
