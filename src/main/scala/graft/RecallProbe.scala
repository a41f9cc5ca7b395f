package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{ProductQuantization, Similarity}

/** Recall measurement harness for the ANN tiers — the tool behind every
  * "measured mean recall@5, floor sits just under the minimum" note in
  * SimilarityQueries. Run per SF dir:
  *
  *   sbt "runMain graft.RecallProbe /root/testdata/sf0.01"
  *
  * Prints one line per tier: `RECALL <tier> <dir> <mean_recall@5>`.
  * The floors pinned in SimilarityQueries must sit just UNDER the
  * minimum across sf0.001/0.01/0.1, so a quality regression trips the
  * in-plan gate while fixture-to-fixture variance does not. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the gate's own recall definition — measurement and enforcement
    // share one implementation by construction
    def meanRecall(approx: DataFrame, exact: DataFrame): Double =
      graft.queries.SimilarityQueries.perQueryRecall(approx, exact)
        .agg(avg("recall_at_5")).head().getDouble(0)

    for (dir <- dirs) {
      val emb = Tables.embeddings(spark, dir)
      val q = emb.filter(col("vec_id") < 20)
      val brute = Similarity.bruteForceTopK(emb, q, 5).cache()
      brute.count()
      val km = Similarity.fitQuantizer(emb, 16)
      val pq8 = ProductQuantization.fitPq(emb, m = 8, ksub = 16)
      val pq16 = ProductQuantization.fitPq(emb, m = 16, ksub = 16)
      val tiers = Seq(
        "lsh" -> Similarity.lshTopK(emb, q, 5, planes = 8, multiProbe = 3),
        "ivf" -> Similarity.ivfTopK(emb, q, 5, km, 4, "vec_id", "embedding"),
        "pq_m8_r20" -> ProductQuantization.pqTopK(emb, q, 5, pq8, rerank = 20),
        "pq_m8_r50" -> ProductQuantization.pqTopK(emb, q, 5, pq8, rerank = 50),
        "pq_m16_r20" -> ProductQuantization.pqTopK(emb, q, 5, pq16, rerank = 20),
        "pq_m16_r50" -> ProductQuantization.pqTopK(emb, q, 5, pq16, rerank = 50),
        "ivfpq_p4_r50" -> ProductQuantization.ivfPqTopK(emb, q, 5, km, pq16,
          nprobe = 4, rerank = 50))
      tiers.foreach { case (tier, approxDf) =>
        println(f"RECALL $tier%-10s $dir ${meanRecall(approxDf, brute)}%.4f")
      }
      brute.unpersist()
    }
    spark.stop()
  }
}
