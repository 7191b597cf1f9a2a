package graft

import java.io.File

/** Spark on-disk scratch measurement — the `spark-` / `blockmgr-`
  * trees (shuffle files, block-manager spill, checkpoint blocks) under
  * the deployment's scratch roots. ONE helper shared by the Bench
  * protocol sampler and Retrieval's inter-batch GC gate (round-17
  * verdict minor #6: the two walkers had drifted into copies; round-17
  * advice medium: both assumed java.io.tmpdir, so a deployment with
  * `spark.local.dir` / SPARK_LOCAL_DIRS pointing elsewhere — standard
  * on real clusters — measured ~0 forever and silently disabled the
  * round-14 disk-wall protection in exactly the regime it exists for).
  */
object Scratch {

  private def size(f: File): Long =
    if (f.isFile) f.length
    else Option(f.listFiles).map(_.iterator.map(size).sum).getOrElse(0L)

  /** Scratch roots, in Spark's own precedence for local dirs: every
    * path in `spark.local.dir` (comma-separated), else SPARK_LOCAL_DIRS
    * (env), else java.io.tmpdir.
    */
  def roots(conf: org.apache.spark.SparkConf): Seq[File] = {
    val dirs = conf.getOption("spark.local.dir")
      .orElse(sys.env.get("SPARK_LOCAL_DIRS"))
      .getOrElse(System.getProperty("java.io.tmpdir", "/tmp"))
    dirs.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map(new File(_))
  }

  /** (bytes held, any scratch tree visible). `found = false` means the
    * walk cannot see this deployment's scratch at all — e.g. cluster
    * mode, where shuffle scratch lives on the executors' disks — and a
    * caller gating CLEANUP on occupancy must treat it as "assume
    * occupied" (fail toward cleaning), not as "empty".
    */
  def bytesAndFound(conf: org.apache.spark.SparkConf): (Long, Boolean) = {
    val trees = roots(conf)
      .flatMap(r => Option(r.listFiles).map(_.toSeq).getOrElse(Nil))
      .filter(f => f.getName.startsWith("spark-") ||
        f.getName.startsWith("blockmgr-"))
    (trees.iterator.map(size).sum, trees.nonEmpty)
  }

  def bytes(conf: org.apache.spark.SparkConf): Long = bytesAndFound(conf)._1
}
