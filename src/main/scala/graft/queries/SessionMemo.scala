package graft.queries

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Session-scoped memo: values keyed by (SparkSession, K), evicted when
  * the owning session's SparkContext ends — ONE eviction listener per
  * session regardless of how many keys miss. The single implementation
  * behind every query-layer cache (features, models, quantizers, pair
  * sets); hand-rolled copies drift (one dropped the listener guard).
  *
  * `name` identifies the instance in the lock-timeout diagnostic — the
  * only place it surfaces. */
class SessionMemo[K, V](name: String = "memo") {
  private val map =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, K), V]
  private val hooked =
    scala.collection.concurrent.TrieMap.empty[SparkSession, Boolean]
  private val buildLock = new java.util.concurrent.locks.ReentrantLock

  def getOrElseUpdate(spark: SparkSession, key: K)(mk: => V): V = {
    // Listener registration is at-most-once via putIfAbsent-then-
    // register-on-win (advice r19): TrieMap.getOrElseUpdate may
    // evaluate its thunk twice under a race — exactly the parallel-
    // warmup scenario — and the loser would leave a duplicate eviction
    // listener attached to the session forever. putIfAbsent is atomic;
    // only the thread that WON the insert registers the hook.
    if (!hooked.contains(spark) && hooked.putIfAbsent(spark, true).isEmpty) {
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          map.filterInPlace { case ((s, _), _) => s != spark }
          hooked.remove(spark)
        }
      })
    }
    // At-most-once builds (r19, parallel bench warmup): TrieMap's
    // getOrElseUpdate is atomic on INSERTION but may evaluate `mk`
    // more than once under a race — for a GBT fit that's a wasted
    // double-train, and for a cache()d frame the loser leaks a cached
    // copy. Double-checked locking on the memo instance serializes
    // builds only; hits stay lock-free. Nested builds (metrics →
    // classifier → features) acquire DIFFERENT memo instances' locks
    // in dependency-DAG order, so no cycle exists to deadlock on —
    // but that ordering is a CONVENTION, not enforced (advice r19):
    // builds block holding the lock for a whole Spark job, so an
    // accidental inversion between two concurrent warmers would hang
    // the bench silently under plain synchronized. tryLock with a
    // generous timeout (far beyond any legitimate build, which is a
    // GBT fit at ~tens of seconds) turns that hang into a named error.
    map.get((spark, key)) match {
      case Some(v) => v
      case None =>
        if (!buildLock.tryLock(10, java.util.concurrent.TimeUnit.MINUTES))
          throw new IllegalStateException(
            s"SessionMemo '$name': build lock not acquired within 10 " +
              s"minutes waiting on key $key (lock state: $buildLock, " +
              s"waiter: ${Thread.currentThread().getName}) — likely a " +
              "memo lock-order inversion between concurrent warmers; " +
              "check the dependency-DAG acquisition order of the memos " +
              "involved")
        try {
          map.get((spark, key)) match {
            case Some(v) => v
            case None =>
              val v = mk
              map.put((spark, key), v)
              v
          }
        } finally buildLock.unlock()
    }
  }
}
