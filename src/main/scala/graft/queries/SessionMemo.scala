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
    // At-most-once builds (r19, parallel bench warmup): TrieMap's
    // getOrElseUpdate is atomic on INSERTION but may evaluate `mk`
    // more than once under a race — for a GBT fit that's a wasted
    // double-train, and for a cache()d frame the loser leaks a cached
    // copy. Double-checked locking on the memo instance serializes
    // builds only; hits stay lock-free. Nested builds (metrics →
    // classifier → features) acquire DIFFERENT memo instances' locks
    // in dependency-DAG order, so no cycle exists to deadlock on.
    map.get((spark, key)) match {
      case Some(v) => v
      case None => this.synchronized {
        map.get((spark, key)) match {
          case Some(v) => v
          case None =>
            val v = mk
            map.put((spark, key), v)
            v
        }
      }
    }
  }
}
