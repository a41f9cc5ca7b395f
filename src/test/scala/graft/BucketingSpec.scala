package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.GraftFunctions

/** Scale-path artifacts: bucketed co-located joins (the shuffle-free
  * fact-fact join layout for 100 TB) and the SQL function registration. */
class BucketingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed tables join without any shuffle exchange") {
    val e = Tables.events(spark, TestSpark.Sf)
    e.select("event_id", "user_id", "value")
      .write.mode("overwrite").bucketBy(8, "user_id").sortBy("user_id")
      .saveAsTable("ev_bucketed")
    e.groupBy("user_id").agg(count(lit(1)).as("n"))
      .write.mode("overwrite").bucketBy(8, "user_id").sortBy("user_id")
      .saveAsTable("usr_bucketed")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("ev_bucketed").join(spark.table("usr_bucketed"), "user_id")
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should be shuffle-free:\n$plan")
      assert(joined.count() == e.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("incrementalDedupIndexed == incrementalDedup (bucketed index is lossless)") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, TestSpark.Sf)
    val corpus = docs.filter(col("doc_id") < 60)
    val batch = docs.filter(col("doc_id") >= 60 && col("doc_id") < 120)
    val tmp = java.nio.file.Files.createTempDirectory("graft-idx-spec")
    try {
      Dedup.writeCorpusIndex(corpus, "idx_spec", tmp.toString)
      val direct = Dedup.incrementalDedup(corpus, batch)
        .orderBy("doc_id").collect().toSeq
      val indexed = Dedup.incrementalDedupIndexed(spark, "idx_spec", batch)
        .orderBy("doc_id").collect().toSeq
      assert(indexed.nonEmpty && indexed == direct)
      // a probe whose banding scheme differs from the build fails loudly
      val err = intercept[IllegalArgumentException] {
        Dedup.incrementalDedupIndexed(spark, "idx_spec", batch, k = 4, r = 2)
      }
      assert(err.getMessage.contains("band keys would not align"), err.getMessage)
    } finally {
      Seq("_fp", "_bands", "_docs", "_meta")
        .foreach(s => spark.sql(s"DROP TABLE IF EXISTS idx_spec$s"))
      graft.IoUtil.deleteRecursively(tmp)
    }
  }

  test("indexed probe joins read bucketed corpus scans with no corpus-side exchange") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, TestSpark.Sf)
    val corpus = docs.filter(col("doc_id") < 60)
    val batch = docs.filter(col("doc_id") >= 60 && col("doc_id") < 120)
    val tmp = java.nio.file.Files.createTempDirectory("graft-idx-plan")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      Dedup.writeCorpusIndex(corpus, "idx_plan", tmp.toString)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // the fp probe join in isolation: index side must come straight
      // off the bucketed scan (Bucketed: true, no Exchange above it);
      // the batch side is the ONLY exchange
      val probe = batch
        .select(col("doc_id"), graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
        .join(spark.table("idx_plan_fp"), "fp")
      probe.collect()
      val plan = probe.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(plan.contains("Bucketed: true"), plan)
      assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
        s"expected exactly one exchange (the batch side):\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      Seq("_fp", "_bands", "_docs", "_meta")
        .foreach(s => spark.sql(s"DROP TABLE IF EXISTS idx_plan$s"))
      graft.IoUtil.deleteRecursively(tmp)
    }
  }

  test("graft_dot is callable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .as[Double].head()
    assert(r == 11.0)
  }

  test("graft_hyperplane_bucket is callable from SQL and matches the Column form") {
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, TestSpark.Sf).limit(50)
    emb.createOrReplaceTempView("emb_sql_test")
    val viaSql = spark.sql(
      "SELECT vec_id, graft_hyperplane_bucket(embedding, 0, 8) AS b FROM emb_sql_test")
      .as[(Long, Long)].collect().sorted.toSeq
    val viaCol = emb.select($"vec_id",
      graft.operators.Similarity.bucketId("embedding", 8).as("b"))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(viaSql == viaCol)
  }
}
