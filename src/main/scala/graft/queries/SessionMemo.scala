package graft.queries

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Session-scoped memo: values keyed by (SparkSession, K), evicted when
  * the owning session's SparkContext ends — ONE eviction listener per
  * session regardless of how many keys miss. The single implementation
  * behind every query-layer cache (features, models, quantizers, pair
  * sets); hand-rolled copies drift (one dropped the listener guard). */
class SessionMemo[K, V] {
  private val map =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, K), V]
  private val hooked =
    scala.collection.concurrent.TrieMap.empty[SparkSession, Boolean]

  def getOrElseUpdate(spark: SparkSession, key: K)(mk: => V): V = {
    hooked.getOrElseUpdate(spark, {
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          map.filterInPlace { case ((s, _), _) => s != spark }
          hooked.remove(spark)
        }
      })
      true
    })
    map.getOrElseUpdate((spark, key), mk)
  }
}
