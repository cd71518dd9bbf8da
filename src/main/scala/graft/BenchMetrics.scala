package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.GraftShim

/** Cumulative task-metric counters fed by a SparkListener, so Bench can
  * report not just wall time but the quantities that actually predict
  * cluster cost at 100 TB: shuffle bytes (network), spill bytes (memory
  * pressure → disk), and input bytes (scan efficiency / pushdown). A
  * per-query delta of these is stable across co-tenant noise, unlike
  * wall time on this host.
  */
final class BenchMetrics extends SparkListener {
  private val shufRead  = new AtomicLong
  private val shufWrite = new AtomicLong
  private val spillMem  = new AtomicLong
  private val spillDisk = new AtomicLong
  private val input     = new AtomicLong
  private val tasks     = new AtomicLong

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val m = e.taskMetrics
    if (m != null) {
      shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      spillMem.addAndGet(m.memoryBytesSpilled)
      spillDisk.addAndGet(m.diskBytesSpilled)
      input.addAndGet(m.inputMetrics.bytesRead)
      tasks.incrementAndGet()
    }
  }

  /** Point-in-time counter values (listener bus drained first so every
    * task of the just-finished action is included).
    */
  def snapshot(sc: SparkContext): BenchMetrics.Snap = {
    GraftShim.drainListenerBus(sc)
    BenchMetrics.Snap(shufRead.get, shufWrite.get, spillMem.get,
      spillDisk.get, input.get, tasks.get)
  }
}

object BenchMetrics {
  final case class Snap(shufRead: Long, shufWrite: Long, spillMem: Long,
      spillDisk: Long, input: Long, tasks: Long) {
    def -(o: Snap): Snap = Snap(shufRead - o.shufRead,
      shufWrite - o.shufWrite, spillMem - o.spillMem,
      spillDisk - o.spillDisk, input - o.input, tasks - o.tasks)
    def json: String =
      s"""{"shuffle_read":$shufRead,"shuffle_write":$shufWrite,""" +
        s""""spill_mem":$spillMem,"spill_disk":$spillDisk,""" +
        s""""input":$input,"tasks":$tasks}"""
  }

  def install(sc: SparkContext): BenchMetrics = {
    val l = new BenchMetrics
    sc.addSparkListener(l)
    l
  }
}
