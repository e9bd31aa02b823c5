ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dcafsspark"
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// Bootstrap: install the compile-guard pre-commit hook on every sbt load
// (round-8 verdict: tools/pre-commit existed but was never linked into
// .git/hooks, so the round-7 failure class — committing a non-compiling
// tree — stayed live; any sbt invocation now repairs the link).
Global / onLoad := {
  val prev = (Global / onLoad).value
  prev.andThen { state =>
    try {
      val hooks = file(".git/hooks")
      val link = hooks / "pre-commit"
      // File.exists() follows symlinks — a DANGLING link reads as absent,
      // and createSymbolicLink would then throw into the catch-all,
      // silently leaving the guard broken; detect and remove stale links
      val stale = java.nio.file.Files.isSymbolicLink(link.toPath) &&
        !link.exists()
      if (stale) java.nio.file.Files.delete(link.toPath)
      if (hooks.isDirectory && !link.exists() &&
          !java.nio.file.Files.isSymbolicLink(link.toPath)) {
        java.nio.file.Files.createSymbolicLink(
          link.toPath, java.nio.file.Paths.get("../../tools/pre-commit"))
        state.log.info("installed .git/hooks/pre-commit -> tools/pre-commit")
      }
    } catch {
      // a failed install leaves the commit guard broken — say so rather
      // than silently continuing (round-9 advice)
      case t: Throwable =>
        state.log.warn(s"pre-commit hook install failed: $t")
    }
    state
  }
}
