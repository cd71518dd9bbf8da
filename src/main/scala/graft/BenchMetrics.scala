package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
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

  private val stages =
    new java.util.concurrent.ConcurrentLinkedQueue[BenchMetrics.StageRec]

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

  /** Per-stage attribution (BENCH_DETAIL.json only — stdout has a hard
    * tail budget): which exchange/scan inside a query carries the bytes
    * and the wall time. The name is the stage's SQL operators (RDD
    * scope names, innermost first — under AQE the callsite is always
    * `withThreadLocalCaptured`, so the scopes are what identify the
    * exchange/codegen-span/scan); falls back to the callsite for
    * non-SQL stages. Metrics are the stage-aggregated task metrics.
    * Bench drains this queue at the start of every timed run and
    * reports the records of the SAME run it reports the wall for, so
    * stage rows never mix iterations (SURVEY §8g).
    */
  override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
    val si = e.stageInfo
    val m = si.taskMetrics
    val dur = (for (s <- si.submissionTime; c <- si.completionTime)
      yield c - s).getOrElse(0L)
    val scopes = GraftShim.stageScopeNames(si)
    val name =
      if (scopes.nonEmpty) scopes.mkString(" < ")
      else si.name.takeWhile(_ != '\n')
    stages.add(BenchMetrics.StageRec(
      si.stageId,
      name.take(80).replaceAll("[^A-Za-z0-9 ._:()$\\[\\]=#@<-]", ""),
      si.numTasks, dur,
      if (m != null) m.shuffleReadMetrics.totalBytesRead else 0L,
      if (m != null) m.shuffleWriteMetrics.bytesWritten else 0L,
      if (m != null) m.inputMetrics.bytesRead else 0L,
      if (m != null) m.memoryBytesSpilled else 0L,
      if (m != null) m.diskBytesSpilled else 0L))
  }

  /** Drain and return every stage completed since the last call. */
  def drainStages(sc: SparkContext): Seq[BenchMetrics.StageRec] = {
    GraftShim.drainListenerBus(sc)
    val out = Seq.newBuilder[BenchMetrics.StageRec]
    var r = stages.poll()
    while (r != null) { out += r; r = stages.poll() }
    out.result()
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
  final case class StageRec(id: Int, name: String, tasks: Int, ms: Long,
      shufRead: Long, shufWrite: Long, input: Long,
      spillMem: Long = 0L, spillDisk: Long = 0L) {
    def json: String =
      s"""{"id":$id,"name":"$name","tasks":$tasks,"ms":$ms,""" +
        s""""shuffle_read":$shufRead,"shuffle_write":$shufWrite,""" +
        s""""input":$input,"spill_mem":$spillMem,""" +
        s""""spill_disk":$spillDisk}"""
  }

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
