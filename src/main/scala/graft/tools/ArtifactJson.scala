package graft.tools

/** Merge a section into a committed JSON artifact PROPERLY (round-13
  * ADVICE: DriftProbe's string surgery appended a duplicate key when
  * re-run against an artifact that already had its section): parse the
  * existing file, REPLACE the top-level key, re-serialize. Idempotent
  * under re-runs; a non-object artifact is wrapped rather than clobbered.
  */
object ArtifactJson {
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  def merge(path: String, key: String, sectionJson: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    val cur: JValue =
      if (java.nio.file.Files.exists(p))
        JsonMethods.parse(new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
      else JObject()
    val sec = JsonMethods.parse(sectionJson)
    val merged = cur match {
      case JObject(fields) => JObject(fields.filterNot(_._1 == key) :+ (key -> sec))
      case other => JObject(List("artifact" -> other, key -> sec))
    }
    java.nio.file.Files.writeString(p,
      JsonMethods.pretty(JsonMethods.render(merged)) + "\n")
  }
}
