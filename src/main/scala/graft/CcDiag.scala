package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-job cost breakdown for dedup_clusters (dev diagnostic, not a
  * declared query): prints each Spark job's summed task CPU/wall so the
  * scaling rehearsal can attribute superlinear CPU to a concrete job
  * (VERDICT r9 item 6 follow-through).
  */
object CcDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("cc-diag")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.configure(spark)

    val jobCpu = new ConcurrentHashMap[Int, Long]()
    val jobRun = new ConcurrentHashMap[Int, Long]()
    val jobTasks = new ConcurrentHashMap[Int, Long]()
    val jobDesc = new ConcurrentHashMap[Int, String]()
    val stageToJob = new ConcurrentHashMap[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        js.stageIds.foreach(s => stageToJob.put(s, js.jobId))
        val names = js.stageInfos.map(si => si.name.takeWhile(_ != '(')).distinct
        jobDesc.put(js.jobId, names.mkString("|").take(120))
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val j = stageToJob.getOrDefault(te.stageId, -1)
        val m = te.taskMetrics
        if (m != null) {
          jobCpu.merge(j, m.executorCpuTime, Long.box(_) + _)
          jobRun.merge(j, m.executorRunTime, Long.box(_) + _)
        }
        jobTasks.merge(j, 1L, Long.box(_) + _)
      }
    })

    val query = args.drop(1).headOption.getOrElse("dedup_clusters")
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(query)(spark, sfDir).count()
    println(f"CCDIAG $query total wall ${(System.nanoTime() - t0) / 1e9}%.2f s rows $n")
    import scala.jdk.CollectionConverters._
    jobCpu.keySet().asScala.toSeq.sorted.foreach { j =>
      println(f"CCDIAG job $j%3d cpu ${jobCpu.get(j) / 1e9}%8.2f run ${jobRun.get(j) / 1e3}%8.2f tasks ${jobTasks.getOrDefault(j, 0L)}%4d  ${jobDesc.getOrDefault(j, "")}")
    }
    spark.stop()
  }
}
