package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.streaming.StreamingQueryListener

/**
 * Stream-stop maintenance hooks. An ingest loop's out-of-band
 * compaction finishes on the maintenance thread but only FLIPS on the
 * next between-batch trigger call — so a stream that stops right
 * after the background write finishes would strand the result as a
 * pending orphan until some future writer runs (crash recovery clears
 * it, but the work is lost). These hooks close that gap: when the
 * loop's query terminates — `stop()`, source exhaustion, or failure —
 * any finished pending compaction for the loop's tables finalizes
 * immediately ([[graft.sources.Bucketing.finalizeMaintenance]]); a
 * JVM shutdown hook does the same best-effort for whatever is still
 * pending at exit.
 */
object Maintenance {

  /** Attach a terminate-listener to `q` that finalizes pending
    * maintenance for `tables` when this query (and only this one)
    * terminates, then detaches itself. `tables` is BY-NAME — resolved
    * at termination time, so epoch-grouped member names (which a
    * mid-stream rebuild regenerates) are current when the finalize
    * runs. Returns `q` for chaining. */
  private[streaming] def finalizeOnStop(q: StreamingQuery,
      spark: SparkSession, tables: => Seq[String]): StreamingQuery = {
    ensureShutdownHook()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
        if (e.id == q.id) {
          tables.foreach { t =>
            try { graft.sources.Bucketing.finalizeMaintenance(spark, t); () }
            catch { case ex: Throwable =>
              System.err.println(
                s"graft: finalize-on-stop for $t failed: ${ex.getMessage}")
            }
          }
          spark.streams.removeListener(this)
        }
      }
    }
    spark.streams.addListener(listener)
    q
  }

  private val hookInstalled = new java.util.concurrent.atomic.AtomicBoolean(false)
  private def ensureShutdownHook(): Unit =
    if (hookInstalled.compareAndSet(false, true)) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        // best-effort: the context may already be stopping — crash
        // recovery handles anything this misses
        SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
          .filter(s => !s.sparkContext.isStopped)
          .foreach { s =>
            graft.sources.Bucketing.pendingTables.foreach { t =>
              try { graft.sources.Bucketing.finalizeMaintenance(s, t); () }
              catch { case _: Throwable => () }
            }
          }
      }, "graft-maintenance-shutdown"))
      ()
    }
}
