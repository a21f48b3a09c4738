package graft.tools

import java.io.{BufferedWriter, FileOutputStream, OutputStreamWriter}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.er.{EntityResolution, FixtureNerModel}
import graft.pipeline.{CyberPipeline, PipelineConfig}

/** Timed end-to-end CyberPipeline run at the REFERENCE's data scale
  * (round-9 VERDICT item 8): BASELINE.md's 6 min 43 s notebook wall time
  * covers ~200k parsed CVEs, 286 alerts, 3.6k raw NER labels, 4,024
  * techniques, ~10k GitHub repo payloads, dedupe training over the 4
  * labeled-pair sets, and a 12-step threshold sweep. PipelineSpec proves
  * stage correctness on committed fixtures; this tool makes the baseline
  * comparison apples-to-apples by generating a synthetic input set at
  * those row counts (seeded, deterministic; the reference's raw inputs
  * are not redistributable) and timing the full chain cold.
  *
  * Phases (each timed separately, one JSON line at the end):
  *   1. pipeline  — CyberPipeline.run: NVD 21-file gz-JSON parse → MITRE
  *      STIX → alert munge/extraction → NER+ER → GitHub joins → CSV
  *      export (c7-c76 minus training, cold checkpoints);
  *   2. er_train  — spark.ml logistic pair scorer over the 4 committed
  *      ner_training_*.json labeling sessions (the c41 dedupe train);
  *   3. er_sweep  — the c42 threshold sweep (12 thresholds x 4 types)
  *      over the pipeline's own entity vocabulary.
  *
  * Usage: runMain graft.tools.PipelineBench [baseDir]  (default /tmp/graft_pipe)
  */
object PipelineBench {

  private def writeGz(path: String)(body: BufferedWriter => Unit): Unit = {
    val w = new BufferedWriter(new OutputStreamWriter(
      new GZIPOutputStream(new FileOutputStream(path)), "UTF-8"), 1 << 20)
    try body(w) finally w.close()
  }

  private def writeText(path: String, s: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), s)

  /** 21 yearly NVD 1.1 feeds, ~200k items total, ~5% carrying a GitHub
    * reference drawn from the 10k-repo pool the payload tables cover.
    */
  private def genNvd(dir: String, rnd: java.util.Random): Unit = {
    val years = 2002 to 2022
    val perYear = 200000 / years.size
    years.foreach { year =>
      writeGz(s"$dir/nvdcve-1.1-$year.json.gz") { w =>
        w.write("""{"CVE_data_type":"CVE","spec":"1.1","CVE_Items":[""")
        var i = 0
        while (i < perYear) {
          if (i > 0) w.write(",")
          val id = f"CVE-$year-${10000 + i}%d"
          val repo = rnd.nextInt(10000)
          val ghRef = if (rnd.nextInt(20) == 0)
            s""",{"url":"https://github.com/org$repo/repo$repo","name":"gh","refsource":"MISC","tags":["Exploit"]}"""
          else ""
          val impact = if (year >= 2005)
            s""","impact":{"baseMetricV3":{"cvssV3":{"baseScore":${(rnd.nextInt(90) + 10) / 10.0},"attackVector":"NETWORK"},"exploitabilityScore":${(rnd.nextInt(39) + 1) / 10.0},"impactScore":${(rnd.nextInt(59) + 1) / 10.0}}}"""
          else ""
          val vnd = rnd.nextInt(2000)
          val prd = rnd.nextInt(8000)
          val child = if (rnd.nextInt(10) == 0)
            s""","children":[{"cpe_match":[{"vulnerable":true,"cpe23Uri":"cpe:2.3:o:vendor${rnd.nextInt(2000)}:product${rnd.nextInt(8000)}:1.0:*:*:*:*:*:*:*"}]}]"""
          else ""
          w.write(
            s"""{"cve":{"CVE_data_meta":{"ID":"$id"},""" +
            s""""references":{"reference_data":[{"url":"https://example.com/advisory/$year/$i","name":"adv","refsource":"MISC","tags":[]}$ghRef]},""" +
            s""""description":{"description_data":[{"lang":"en","value":"A vulnerability in product$prd allows remote attackers to execute code via crafted input item $i."}]}},""" +
            s""""publishedDate":"$year-${f"${rnd.nextInt(12) + 1}%02d"}-${f"${rnd.nextInt(28) + 1}%02d"}T${f"${rnd.nextInt(24)}%02d"}:${f"${rnd.nextInt(60)}%02d"}Z"$impact,""" +
            s""""configurations":{"nodes":[{"operator":"OR","cpe_match":[{"vulnerable":true,"cpe23Uri":"cpe:2.3:a:vendor$vnd:product$prd:1.0:*:*:*:*:*:*:*"}]$child}]}}""")
          i += 1
        }
        w.write("]}")
      }
    }
  }

  /** STIX 2.0 bundle: 14 tactics + 4,024 live attack-patterns (T1000–
    * T5023) with markdown-ish descriptions exercising the minimd chain.
    */
  private def genMitre(path: String): Unit = {
    val tactics = Seq("initial-access", "execution", "persistence",
      "privilege-escalation", "defense-evasion", "credential-access",
      "discovery", "lateral-movement", "collection", "command-and-control",
      "exfiltration", "impact", "reconnaissance", "resource-development")
    val sb = new StringBuilder
    sb.append("""{"type":"bundle","id":"bundle--graft-bench","spec_version":"2.0","objects":[""")
    tactics.zipWithIndex.foreach { case (t, i) =>
      if (i > 0) sb.append(",")
      sb.append(s"""{"type":"x-mitre-tactic","id":"x-mitre-tactic--$i","x_mitre_shortname":"$t","name":"${t.split('-').map(_.capitalize).mkString(" ")}"}""")
    }
    (0 until 4024).foreach { i =>
      val ttp = s"T${1000 + i}"
      sb.append(",")
      sb.append(
        s"""{"type":"attack-pattern","id":"attack-pattern--$i","name":"Technique $ttp",""" +
        s""""external_references":[{"source_name":"mitre-attack","external_id":"$ttp","url":"https://attack.mitre.org/techniques/$ttp"}],""" +
        s""""kill_chain_phases":[{"kill_chain_name":"mitre-attack","phase_name":"${tactics(i % tactics.size)}"}],""" +
        s""""description":"# Overview #\\nAdversaries may use <code>tool$i</code> per https://attack.mitre.org/techniques/$ttp/001 patterns.",""" +
        s""""x_mitre_platforms":["Windows","Linux"],"x_mitre_data_sources":["Process monitoring"],""" +
        s""""x_mitre_detection":"Monitor for tool$i execution."}""")
    }
    sb.append("]}")
    writeText(path, sb.toString)
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/tmp/graft_pipe")
    // golden ER training fixtures: arg 2 overrides the repo-root-relative
    // default so the tool can run from a packaged jar / different cwd
    val goldenDir = args.lift(1).getOrElse("src/test/resources/golden")
    new java.io.File(s"$base/nvd").mkdirs()
    val spark = ToolSession.local()
    import spark.implicits._

    // ---- generation (untimed, idempotent) ----
    val marker = new java.io.File(s"$base/.generated")
    if (!marker.exists()) {
      val rnd = new java.util.Random(42)
      genNvd(s"$base/nvd", rnd)
      genMitre(s"$base/enterprise-attack.json")

      // 286 alerts; ~3.3 CVE mentions + ~3 TTP mentions each (931 / 826
      // edge targets); entity names referenced so NER labels have support
      val alerts = (0 until 286).map { a =>
        val year = 2002 + (a % 21)
        val cves = (0 until (3 + a % 2)).map(j =>
          f"CVE-$year-${10000 + (a * 37 + j * 911) % 9523}%d").distinct
        val ttps = (0 until 3).map(j => s"T${1000 + (a * 13 + j * 401) % 4024}").distinct
        val text = s"Alert $a: threat actors exploit ${cves.mkString(", ")} using " +
          ttps.map(t => s"[$t]").mkString(" and ") +
          s". The Entity${a % 200} Corp group and Entity${(a * 7) % 200} Systems were observed. " +
          "Additional hardening guidance follows for affected organizations."
        (s"/alert/aa$a", f"AA22-$a%03dA :", s"Synthetic Alert $a",
          s"Original release date: January ${a % 28 + 1}, 2022 | Last revised: February 1, 2022",
          text)
      }.toDF("link", "alert_id", "title", "date", "text")
      alerts.coalesce(1).write.mode("overwrite").parquet(s"$base/alerts_raw")

      // 3,654 NER mentions over a variant-rich vocabulary (ER workload):
      // 800 entities x up-to-3 spelling variants across the 4 types
      val types = Seq("ORG", "GPE", "PERSON", "PRODUCT")
      val mrnd = new java.util.Random(7)
      val mentions = (0 until 3654).map { m =>
        val ent = mrnd.nextInt(800)
        val variant = mrnd.nextInt(3) match {
          case 0 => s"Entity$ent Corp"
          case 1 => s"Entity$ent Corp inc"
          case _ => s"Entity$ent Corps"
        }
        (f"AA22-${mrnd.nextInt(286)}%03dA", variant, types(ent % 4))
      }.toDF("alert_id", "label", "type")
      mentions.coalesce(1).write.mode("overwrite").parquet(s"$base/mentions")

      // GitHub payloads: 10k repos, ~4 languages + ~6 contributors each
      // (37k / 57k final-edge scale)
      val langs = Seq("Python", "C", "Go", "Rust", "Java", "Shell")
      val grnd = new java.util.Random(11)
      (0 until 10000).map { k =>
        val m = (0 until 3 + grnd.nextInt(3))
          .map(j => langs((k + j) % langs.size) -> (grnd.nextInt(100000) + 1L)).toMap
        (s"https://api.github.com/repos/org$k/repo$k", "success", m)
      }.toDF("url", "status", "languages")
        .coalesce(4).write.mode("overwrite").parquet(s"$base/gh_langs")
      (0 until 10000).map { k =>
        val cs = (0 until 5 + grnd.nextInt(3)).map(j =>
          (s"user${(k * 3 + j * 17) % 50000}", grnd.nextInt(500) + 1L)) :+
          (s"dependabot[bot]", 3L)
        (s"https://api.github.com/repos/org$k/repo$k", "success", cs)
      }.toDF("url", "status", "contributors")
        .withColumn("contributors", expr(
          "transform(contributors, c -> struct(c._1 AS login, c._2 AS contributions))"))
        .coalesce(4).write.mode("overwrite").parquet(s"$base/gh_contribs")
      marker.createNewFile()
    }

    // ---- timed phases ----
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // cold checkpoints: fresh work/out dirs per invocation
    val stamp = sys.env.getOrElse("SPARK_GRAFT_RUN_ID",
      java.lang.management.ManagementFactory.getRuntimeMXBean.getName.hashCode.toHexString)
    val conf = PipelineConfig(
      nvdGlob = s"$base/nvd/*.json.gz",
      mitreBundle = s"$base/enterprise-attack.json",
      alertsParquet = s"$base/alerts_raw",
      workDir = s"$base/work_$stamp", outDir = s"$base/out_$stamp",
      githubLanguagesParquet = Some(s"$base/gh_langs"),
      githubContributorsParquet = Some(s"$base/gh_contribs"))
    val ner = FixtureNerModel(spark.read.parquet(s"$base/mentions"))
    val (counts, tPipe) = timed(CyberPipeline.run(spark, conf, ner))

    // c41 analog: logistic pair scorer per labeled type
    val (_, tTrain) = timed {
      Seq("ORG", "GPE", "PERSON", "PRODUCT").foreach { tpe =>
        val df = spark.read.option("multiLine", value = true)
          .json(s"$goldenDir/ner_training_$tpe.json")
        def pairs(c: String): Seq[(String, String)] =
          if (!df.columns.contains(c)) Seq.empty
          else df.select(explode(col(c)).as("p"))
            .select(col("p.__value__").as("v")).collect()
            .map { r =>
              val v = r.getSeq[org.apache.spark.sql.Row](0)
              (v(0).getAs[String]("label"), v(1).getAs[String]("label"))
            }.toSeq
        val labeled = (pairs("match").map(p => (p._1, p._2, tpe, 1.0)) ++
          pairs("distinct").map(p => (p._1, p._2, tpe, 0.0)))
          .toDF("label_a", "label_b", "type", "is_match")
        EntityResolution.trainPairScorer(labeled)
      }
    }

    // c42 analog: 12-threshold sweep over the pipeline's own vocabulary
    val vocab = spark.read.parquet(s"${conf.workDir}/alert_ner")
      .select(col("id"), col("label"), col("type")).distinct()
    val (sweepRows, tSweep) = timed(
      EntityResolution.elbowSweep(vocab).count())

    val nvdRows = counts.getOrElse("cve_node_data", -1L)
    println(s"""{"metric":"pipeline_e2e","baseline_sec":403,""" +
      s""""sec_pipeline":${f"$tPipe%.1f"},"sec_er_train":${f"$tTrain%.1f"},""" +
      s""""sec_er_sweep":${f"$tSweep%.1f"},""" +
      s""""sec_total":${f"${tPipe + tTrain + tSweep}%.1f"},""" +
      s""""cve_nodes":$nvdRows,"sweep_rows":$sweepRows,""" +
      s""""counts":{${counts.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }.mkString(",")}}}""")
    spark.stop()
  }
}
