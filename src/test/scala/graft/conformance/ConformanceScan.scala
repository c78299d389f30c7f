package graft.conformance

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Diagnostic sweep over every candidate case in the reference eval
  * corpus (query+data+result files sharing a basename): prints one
  * status line per case so the curated suite list in
  * [[W3cConformanceSpec]] can be maintained from evidence.
  * Run: sbt 'Test/runMain graft.conformance.ConformanceScan'
  */
object ConformanceScan {
  def main(args: Array[String]): Unit = {
    require(W3c.available, s"reference eval corpus not present at ${W3c.EvalDir}")
    val spark = graft.TestSpark.spark
    val dir = Paths.get(W3c.EvalDir)
    val names = Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.endsWith(".rq")).map(_.dropRight(3))
      .filter { b =>
        Files.exists(dir.resolve(s"$b.srx")) &&
          (Files.exists(dir.resolve(s"$b.ttl")) || Files.exists(dir.resolve(s"$b.trig")))
      }
      .toVector.sorted
    val only = args.headOption
    var pass = 0; var fail = 0; var err = 0
    names.filter(n => only.forall(n.contains)).foreach { n =>
      val r = W3c.runCase(spark, n)
      r match {
        case W3c.Pass => pass += 1; println(s"PASS $n")
        case W3c.Fail(d) => fail += 1; println(s"FAIL $n :: ${d.linesIterator.mkString(" / ").take(400)}")
        case W3c.Err(m) => err += 1; println(s"ERR  $n :: ${Option(m).getOrElse("").take(300)}")
      }
    }
    println(s"== pass=$pass fail=$fail err=$err total=${pass + fail + err}")
    spark.stop()
  }
}
