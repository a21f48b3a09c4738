package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.ExplainMode

import graft.SparkEntry

/** Dev-only plan capture for the optimization rounds: write
  * `.explain("formatted")` for selected gates (and
  * [[graft.operators.PlanProbes]] internals) to `<outDir>/<name>_<tag>.txt`.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <tag> <name1,name2,...|all>
  *
  * Gates whose result is materialized via localCheckpoint show the trivial
  * checkpoint-scan plan here — for those, the `PlanProbes` entries carry
  * the meaningful internal plans (see OPTIMIZATION_r17.md Methodology).
  * Building the frame RUNS side-effectful gates (index builds) — same
  * behavior as Profile.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r17")
    val tag = args.lift(1).getOrElse("before")
    val sel = args.lift(2).getOrElse("all")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = ToolSession.local(defaultCpus = "4", shuffleFromCpus = true)
    val all: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
      SparkEntry.queries ++ graft.operators.PlanProbes.probes
    val names =
      if (sel == "all") all.keys.toSeq.sorted
      else sel.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      all.get(n) match {
        case None => System.err.println(s"[plandump] unknown name: $n")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
            Files.writeString(Paths.get(outDir, s"${n}_$tag.txt"), plan)
            println(s"[plandump] wrote $outDir/${n}_$tag.txt")
            spark.catalog.clearCache()
            spark.sparkContext.getPersistentRDDs.values
              .foreach(_.unpersist(blocking = true))
            spark.streams.active.foreach(q => try q.stop() catch { case _: Throwable => () })
          } catch { case e: Throwable =>
            System.err.println(s"[plandump] $n failed: ${e.getClass.getSimpleName}: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
