package graft.tools

import org.apache.spark.sql.SparkSession

/** TimeOne + wall-clock stack sampler: runs a comma-separated battery
  * query sequence in one session (battery conditions) and samples EVERY
  * JVM thread (driver and executors) every ~150 ms during the LAST
  * query, printing the most-sampled frames split by thread group.
  * Distinguishes executor compute, driver planning/analysis, and lock
  * waits that stage metrics can't attribute.
  * args: name[,name...] sfDir
  */
object TimeProfile {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').map(_.trim).filter(_.nonEmpty)
    val sfDir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.local.dir", "/dev/shm/spark-graft")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    names.init.foreach { n =>
      val t0 = System.nanoTime()
      val r = graft.SparkEntry.queries(n)(spark, sfDir).count()
      println(f"TIMEPROF $n rows=$r sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }

    val counts = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val it = Thread.getAllStackTraces.entrySet().iterator()
        while (it.hasNext) {
          val en = it.next()
          val tn = en.getKey.getName
          val grp =
            if (tn.startsWith("Executor task launch")) "EXEC"
            else if (tn == "main") "MAIN"
            else if (tn.contains("dag-scheduler")) "DAG"
            else "OTHER:" + tn.takeWhile(c => !c.isDigit).take(24)
          val st = en.getValue
          val seen = new java.util.HashSet[String]()
          var i = 0
          while (i < st.length && i < 24) {
            val f = st(i)
            val key = grp + " " + f.getClassName + "." + f.getMethodName
            if (seen.add(key))
              counts.computeIfAbsent(key, _ => new java.util.concurrent.atomic.AtomicLong()).incrementAndGet()
            i += 1
          }
          // also record the TOP frame separately to see where time is spent exactly
          if (st.nonEmpty) {
            val f = st(0)
            val key = "TOP." + grp + " " + f.getClassName + "." + f.getMethodName
            counts.computeIfAbsent(key, _ => new java.util.concurrent.atomic.AtomicLong()).incrementAndGet()
          }
        }
        Thread.sleep(150)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    val t0 = System.nanoTime()
    val r = graft.SparkEntry.queries(names.last)(spark, sfDir).count()
    val sec = (System.nanoTime() - t0) / 1e9
    sampling = false
    println(f"TIMEPROF ${names.last} rows=$r sec=$sec%.3f (profiled)")
    import scala.jdk.CollectionConverters._
    val rows = counts.asScala.toSeq.map { case (k, v) => (k, v.get()) }
    println("== inclusive frames (top 40) ==")
    rows.filterNot(_._1.startsWith("TOP.")).sortBy(-_._2).take(40)
      .foreach { case (k, n) => println(f"$n%6d  $k") }
    println("== top-of-stack frames (top 25) ==")
    rows.filter(_._1.startsWith("TOP.")).sortBy(-_._2).take(25)
      .foreach { case (k, n) => println(f"$n%6d  $k") }
    spark.stop()
  }
}
