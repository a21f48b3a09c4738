package graft.tools

/** Intra-session idempotence check: every registered gate runs TWICE in
  * one long-lived SparkSession and must produce identical results.
  *
  * The driver's Verify is single-pass and the bench only counts rows, so
  * neither would catch a gate whose second invocation reads stale
  * session state — the failure mode the consume-once memos
  * (GraphQueries.statsMemo, DedupOps.cmMemo) and session-scoped caches
  * could develop under refactoring. This is the library-user scenario:
  * a notebook session calling the same operator repeatedly.
  *
  * Comparison is exact: sorted collected row strings (same JVM, same
  * formatting) plus the schema. Usage:
  *   sbt "runMain graft.tools.RepeatCheck [sfDir]"
  * prints one OK/MISMATCH line per gate and exits nonzero on mismatch.
  */
object RepeatCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val s = ToolSession.local(defaultCpus = "16", shuffleFromCpus = true)
    graft.functions.GraftFunctions.register(s)
    var bad = 0
    for (q <- graft.SparkEntry.registry) {
      def snap(): (Seq[String], String) = {
        val df = q.run(s, dir)
        (df.schema.map(f => s"${f.name}:${f.dataType.sql}").toSeq,
          df.collect().map(_.toString).sorted.mkString("\n"))
      }
      val (sa, ra) = snap()
      val (sb, rb) = snap()
      // drop gate-scoped caches between gates (the d01-convention caches
      // are released by the bench harness in suite mode; this sweep is a
      // long-lived session, so accumulated MEMORY_AND_DISK entries would
      // otherwise degrade later gates under cache pressure — r10 ADVICE)
      s.catalog.clearCache()
      if (sa == sb && ra == rb) println(s"REPEAT OK ${q.name}")
      else {
        bad += 1
        println(s"REPEAT MISMATCH ${q.name}: schemaEq=${sa == sb} rowsEq=${ra == rb}")
      }
    }
    println(s"REPEAT DONE gates=${graft.SparkEntry.registry.size} mismatches=$bad")
    s.stop()
    if (bad > 0) sys.exit(1)
  }
}
