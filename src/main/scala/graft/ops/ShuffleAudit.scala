package graft.ops

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame

/** Measured shuffle/spill volume for one materialization — the
  * "measure, don't guess" primitive behind byte-level plan
  * regression gates: PlanQualitySpec pins plan SHAPES, but a shape
  * can stay constant while a projection regression triples the bytes
  * crossing the cluster. At 100 TB shuffle bytes ARE the cost model,
  * so the specs pin them directly (relative budgets, never absolute
  * wall-clock).
  *
  * Mechanics: a SparkListener accumulates task-level shuffle
  * read/write and spill. Actions block until their jobs finish, but
  * event DELIVERY is async — the bus preserves per-listener order,
  * so once the listener has seen JobEnd for every JobStart it has
  * also seen every TaskEnd of those jobs; [[measure]] polls for that
  * quiescence (bounded wait) before reading the counters.
  */
object ShuffleAudit {

  final case class Volume(shuffleWrite: Long, shuffleRead: Long,
                          spill: Long, tasks: Int)

  private final class Acc extends SparkListener {
    val write = new AtomicLong; val read = new AtomicLong
    val spill = new AtomicLong; val tasks = new AtomicInteger
    val started = new AtomicInteger; val ended = new AtomicInteger
    override def onJobStart(j: SparkListenerJobStart): Unit = { started.incrementAndGet(); () }
    override def onJobEnd(j: SparkListenerJobEnd): Unit = { ended.incrementAndGet(); () }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        spill.addAndGet(m.diskBytesSpilled + m.memoryBytesSpilled)
        tasks.incrementAndGet()
      }
      ()
    }
  }

  /** Runs `df.count()` under a fresh listener and returns the
    * shuffle/spill volume of exactly the jobs it triggered. Not
    * concurrency-safe by design (a parallel query on the same context
    * would be counted too) — this is a measurement harness, run it
    * alone. */
  def measure(df: DataFrame): Volume = {
    val sc = df.sparkSession.sparkContext
    val acc = new Acc
    sc.addSparkListener(acc)
    try {
      df.count()
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while ((acc.started.get == 0 || acc.ended.get < acc.started.get) &&
             System.nanoTime() < deadline) Thread.sleep(10)
      require(acc.started.get > 0 && acc.ended.get >= acc.started.get,
        s"listener not quiescent: ${acc.started.get} started, ${acc.ended.get} ended")
      Volume(acc.write.get, acc.read.get, acc.spill.get, acc.tasks.get)
    } finally sc.removeSparkListener(acc)
  }
}
