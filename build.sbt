ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "selfkgspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Panama vector API (incubator module shipped with this JDK): the
// quantized-dot SIMD kernel (candidates/DotSimd.java) compiles against
// it and probes for it at runtime — a JVM without the module degrades
// to the scalar loop, bit-identically.
// DotSimd.java compiles ONLY when the build JVM itself resolves the
// incubator module (.jvmopts adds it to sbt's JVM; zinc's Java API
// extraction loads produced classes reflectively, so a module-less
// build JVM must skip the file). Nothing references DotSimd at compile
// time — candidates/DotQ.java binds it via MethodHandle and the
// scoring loop falls back to the scalar kernel, bit-identically.
lazy val hasVectorModule: Boolean =
  try { Class.forName("jdk.incubator.vector.ShortVector"); true }
  catch { case _: Throwable => false }
javacOptions ++= (if (hasVectorModule) Seq("--add-modules", "jdk.incubator.vector") else Seq.empty)
Compile / unmanagedSources := {
  val srcs = (Compile / unmanagedSources).value
  if (hasVectorModule) srcs else srcs.filterNot(_.getName == "DotSimd.java")
}
compileOrder := CompileOrder.JavaThenScala
javaOptions ++= jdk17AddOpens ++
  // forked run/test JVMs use the same java as the build JVM; only pass
  // the incubator module when it exists (a bare --add-modules of a
  // missing module fails JVM startup outright)
  (if (hasVectorModule) Seq("--add-modules", "jdk.incubator.vector") else Seq.empty) ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Shuffle/spill scratch on tmpfs: this VM's block device serializes
  // concurrent shuffle-file IO (jstack showed 30/32 executor threads in
  // FileChannel.transferTo), inverting 8-vs-32-core scaling. A real
  // cluster gives each executor local NVMe; tmpfs is the single-node
  // stand-in. ~5-15 GB at bench scale, 126 GB available.
  "-Dspark.local.dir=/dev/shm/spark-graft",
  // local[32] executes 32 concurrent tasks in ONE JVM: at bench scale
  // (50-100k docs, dim 256) the persisted banded LSH sets + shuffle
  // buffers GC-thrash an 8g heap and invert the core-scaling
  // measurement. The sandbox has 125 GiB; size like a real executor.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
// Benchmarked mains only (not tests): Xms=Xmx so G1 never uncommits and
// re-faults regions between the bench's per-level sessions (they share
// one JVM). Deliberately NO -XX:+AlwaysPreTouch: this VM's guest-kernel
// page-allocation path is pathologically slow AND variable (measured
// 44-286 MB/s, 95%+ sys time, single-threaded dd to tmpfs; 8 GiB of
// JVM pretouch cost 3-7 MINUTES wall) — pre-faulting 24g up front can
// burn the whole bench budget before main() runs. With a fixed
// committed heap the faults are paid lazily, exactly once, mostly
// inside the warmup run that the bench already discards.
run / javaOptions ++= Seq(
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
