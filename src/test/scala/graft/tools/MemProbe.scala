package graft.tools

import java.lang.management.ManagementFactory
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Memory-pressure probe (TEST scope, like ScaleGen/LshKnobProbe): runs
  * named `SparkEntry.queries` entries on a corpus dir and reports, per
  * query, the metrics a 100 TB capacity plan actually needs:
  *
  *  - `task_peak`  — max per-task `peakExecutionMemory` (Tungsten
  *    execution memory: hash maps, sort buffers). This is the number
  *    that must fit `spark.executor.memory × memoryFraction / cores`
  *    on a real cluster; it is per-TASK, so it holds regardless of
  *    executor count.
  *  - `spill_mem` / `spill_disk` — total `memoryBytesSpilled` /
  *    `diskBytesSpilled` across the query. Nonzero disk spill means
  *    the shape survives under memory pressure (degrades, not OOMs);
  *    zero means the partitioning kept every partition in budget.
  *  - `heap_peak` — max JVM heap-pool peak across the query (pool
  *    peaks reset before each query). local[32] runs all 32 "executor"
  *    threads in one JVM, so this is the whole-machine proxy, NOT a
  *    per-executor number; task_peak is the per-executor-core truth.
  *
  * Metrics come from a `SparkListener` on `onTaskEnd` (the public
  * listener API — the REST status store is private[spark]). The
  * listener bus is asynchronous; a short settle loop after each action
  * waits for the per-query task counter to go quiet before reading.
  *
  * usage: Test/runMain graft.tools.MemProbe <dir> <query>...
  */
object MemProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val names = args.tail.toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val taskPeak = new AtomicLong(0)
    val memSpill = new AtomicLong(0)
    val diskSpill = new AtomicLong(0)
    val tasksEnded = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          taskPeak.getAndAccumulate(m.peakExecutionMemory, math.max)
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
        }
        tasksEnded.incrementAndGet()
      }
    })
    val pools = ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)

    def mb(b: Long): String = f"${b / 1048576.0}%.1f"

    names.foreach { name =>
      // warm pass on the query's own dir would double-count; warm on
      // sf0.001 (Bench hygiene) so codegen cost stays out of the probe
      try SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
      spark.catalog.clearCache()
      System.gc()
      taskPeak.set(0); memSpill.set(0); diskSpill.set(0); tasksEnded.set(0)
      pools.foreach(_.resetPeakUsage())
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(name)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // settle: the listener bus is async — wait until the task-end
      // counter stops moving (two consecutive identical reads 200ms apart)
      var prev = -1L
      while (prev != tasksEnded.get()) { prev = tasksEnded.get(); Thread.sleep(200) }
      val heapPeak = pools.map(_.getPeakUsage.getUsed).sum
      println(f"[memprobe] $name rows=$rows wall=$wall%.1fs " +
        s"task_peak_mb=${mb(taskPeak.get)} spill_mem_mb=${mb(memSpill.get)} " +
        s"spill_disk_mb=${mb(diskSpill.get)} heap_peak_mb=${mb(heapPeak)}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
