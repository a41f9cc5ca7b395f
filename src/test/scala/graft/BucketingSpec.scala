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
