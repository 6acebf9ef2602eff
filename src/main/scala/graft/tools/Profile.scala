package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Dev tool: run a query once warm then once measured, reporting wall
  * time, #jobs, #stages, #tasks and summed task/executor time — tells
  * scheduling overhead apart from compute.
  * Usage: runMain graft.tools.Profile <q1> [q2 ...]
  */
object Profile {
  def main(a: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val perStage = new java.util.concurrent.ConcurrentHashMap[Int, (Int, Long, Long)]
    val stageNames = new java.util.concurrent.ConcurrentHashMap[Int, String]
    val tasks = new AtomicInteger; val taskNanos = new AtomicLong
    val cpuNanos = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        stageNames.put(s.stageInfo.stageId, s.stageInfo.name.take(80))
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) {
          taskNanos.addAndGet(t.taskMetrics.executorRunTime * 1000000L)
          cpuNanos.addAndGet(t.taskMetrics.executorCpuTime)
          perStage.merge(t.stageId,
            (1, t.taskMetrics.executorCpuTime, t.taskMetrics.executorRunTime),
            (a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3))
        }
      }
    })
    a.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, d).queryExecution.toRdd.count() // warm
      Thread.sleep(300) // let listener drain
      jobs.set(0); stages.set(0); tasks.set(0); taskNanos.set(0); cpuNanos.set(0)
      perStage.clear(); stageNames.clear()
      val t0 = System.nanoTime()
      fn(spark, d).queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"PROFILE $name%-30s wall=$wall%.3f jobs=${jobs.get}%d " +
        f"stages=${stages.get}%d tasks=${tasks.get}%d " +
        f"taskSum=${taskNanos.get / 1e9}%.3f cpuSum=${cpuNanos.get / 1e9}%.3f")
      import scala.jdk.CollectionConverters._
      perStage.asScala.toSeq.sortBy(-_._2._2).take(8).foreach { case (sid, (n, cpu, run)) =>
        println(f"  STAGE $sid%5d tasks=$n%3d cpu=${cpu / 1e9}%7.3f run=${run / 1e3}%7.3f  ${stageNames.getOrDefault(sid, "")}")
      }
    }
    spark.stop()
  }
}
