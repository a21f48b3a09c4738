package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Versioned-snapshot metadata for at-rest indexes — the reader half of
  * the [[IndexLock]] story (r13 VERDICT item 1: the exclusive lock made
  * every query serialize against every other query and block appends; a
  * production retrieval service is query-dominant, so reads must not
  * lock).
  *
  * The recipe is the standard lakehouse one (the Iceberg/Delta commit
  * protocol reduced to its essentials): every committed index state is an
  * IMMUTABLE set of parquet directories, named by one manifest file, and
  * the manifest itself is published atomically — so a reader resolves the
  * newest manifest ONCE and then reads only files that can never change
  * under it.
  *
  * Layout under an index loc:
  *
  *   <loc>/_manifests/m.<version>      committed manifests (immutable;
  *                                     written as .tmp then RENAMED —
  *                                     rename is atomic on local FS and
  *                                     HDFS, so a listed manifest is
  *                                     always complete)
  *   <loc>/<table>/v-<uuid>            immutable table version/segment
  *                                     dirs; mutators only ever CREATE
  *                                     new ones, never modify or append
  *                                     to a published one
  *
  * Manifest content: one `table=rel1,rel2` line per table, rel paths
  * relative to loc. Multi-entry tables are append families (postings,
  * doclen, assign, codes, deleted): a reader unions the listed segments.
  * Single-entry tables are replace families (dfreq, stats, centroids,
  * codebooks).
  *
  * Commit protocol (writers hold [[IndexLock]], so publishes never race
  * each other): write all new table dirs → [[IndexLock.verify]] the fence
  * → publish manifest version N+1. The manifest publish is the ONLY
  * commit point; a crash (or a fenced-out zombie aborting at verify)
  * leaves orphan table dirs that no manifest references — invisible to
  * every reader, reclaimed by [[vacuum]]. This retires the r11 staleness-
  * marker discipline (delete stats first, rewrite last): there is no
  * in-place mutation left to tear.
  *
  * Readers: [[current]] lists `_manifests` and takes the highest version
  * — one listing + one small-file read per query, no lock, no waiting.
  * Old versions are retained until an explicit [[vacuum]] (writers never
  * delete data at commit), so a reader holding a resolved manifest stays
  * consistent even across later commits; [[IndexStore]] read paths
  * additionally materialize their (top-k-bounded) results, which bounds
  * the window a vacuum could race.
  */
object IndexManifest {
  final case class Manifest(loc: String, version: Long,
      tables: Map[String, Seq[String]]) {
    /** Absolute paths of `table`'s version/segment dirs (empty if none). */
    def paths(table: String): Seq[String] =
      tables.getOrElse(table, Nil).map(rel => s"$loc/$rel")
  }

  private def fs(s: SparkSession, path: String) =
    new Path(path).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def mdir(loc: String) = new Path(s"$loc/_manifests")

  private val NameRx = """m\.(\d+)""".r

  /** All committed manifest versions at `loc`, ascending (empty if the
    * loc has never committed).
    */
  private def versions(s: SparkSession, loc: String): Seq[Long] = {
    val f = fs(s, loc)
    if (!f.exists(mdir(loc))) Nil
    else f.listStatus(mdir(loc)).toSeq.flatMap(st => st.getPath.getName match {
      case NameRx(n) => Some(n.toLong)
      case _ => None // .tmp leftovers from a crashed publish are ignored
    }).sorted
  }

  /** Newest committed state, resolved once — the reader entry point. */
  def current(s: SparkSession, loc: String): Option[Manifest] =
    versions(s, loc).lastOption.map(v => read(s, loc, v))

  /** Newest committed version number; 0 if never committed. */
  def currentVersion(s: SparkSession, loc: String): Long =
    versions(s, loc).lastOption.getOrElse(0L)

  /** All RETAINED committed versions, ascending — what a time-travel
    * read may pin ([[at]]). Superseded versions disappear once
    * [[vacuum]] reclaims them, so retention is the deployer's
    * `keepManifests` choice, not an unbounded log.
    */
  def retainedVersions(s: SparkSession, loc: String): Seq[Long] =
    versions(s, loc)

  /** A SPECIFIC committed state, if still retained — the time-travel /
    * audit read: the returned manifest names immutable files, so a
    * pinned version replays bit-identically for as long as vacuum
    * retention keeps it.
    */
  def at(s: SparkSession, loc: String, version: Long): Option[Manifest] =
    versions(s, loc).find(_ == version).map(v => read(s, loc, v))

  private def read(s: SparkSession, loc: String, v: Long): Manifest = {
    val p = new Path(s"$loc/_manifests/m.$v")
    val in = fs(s, loc).open(p)
    val content = try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, "UTF-8")
    } finally in.close()
    val tables = content.linesIterator.map(_.trim).filter(_.nonEmpty).map { l =>
      val i = l.indexOf('=')
      require(i > 0, s"malformed manifest line in $p: $l")
      val rels = l.substring(i + 1).split(',').toSeq.filter(_.nonEmpty)
      l.substring(0, i) -> rels
    }.toMap
    Manifest(loc, v, tables)
  }

  /** Commit `tables` as the next manifest version and return it. Caller
    * MUST hold the loc's [[IndexLock]] (single writer) and have verified
    * its fence immediately before calling — the rename here is the
    * commit.
    */
  def publish(s: SparkSession, loc: String,
      tables: Map[String, Seq[String]]): Long = {
    val f = fs(s, loc)
    f.mkdirs(mdir(loc))
    val v = currentVersion(s, loc) + 1
    val body = tables.toSeq.sortBy(_._1)
      .map { case (t, rels) => s"$t=${rels.mkString(",")}" }.mkString("\n")
    val tmp = new Path(s"$loc/_manifests/m.$v.tmp")
    val out = f.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    val dst = new Path(s"$loc/_manifests/m.$v")
    if (!f.rename(tmp, dst))
      throw new java.io.IOException(s"manifest publish rename $tmp -> $dst failed")
    v
  }

  /** A fresh (not yet referenced) version-dir relative path for `table`. */
  def newRel(table: String): String =
    s"$table/v-${java.util.UUID.randomUUID().toString.take(13)}"

  /** Reclaim table dirs no retained manifest references, and manifests
    * older than the newest `keepManifests`. Takes the loc's [[IndexLock]]
    * (deleting data is the one destructive act left in the protocol).
    * `keepManifests` ≥ 1; the default 2 keeps one superseded state so a
    * reader that resolved just before the newest commit can still finish
    * an un-materialized scan.
    */
  def vacuum(s: SparkSession, loc: String, keepManifests: Int = 2): Unit =
    IndexLock.withLock(s, loc) { _ =>
      val f = fs(s, loc)
      val vs = versions(s, loc)
      if (vs.nonEmpty) {
        val keep = vs.takeRight(math.max(1, keepManifests))
        val referenced: Set[String] =
          keep.flatMap(v => read(s, loc, v).tables.values.flatten).toSet
        // drop superseded manifests (and crashed-publish .tmp leftovers)
        f.listStatus(mdir(loc)).foreach { st =>
          val keepIt = st.getPath.getName match {
            case NameRx(n) => keep.contains(n.toLong)
            case _ => false
          }
          if (!keepIt) f.delete(st.getPath, false)
        }
        // drop unreferenced table version dirs; legacy pre-manifest
        // layouts (<table>.parquet dirs) are unreferenced by construction
        // and reclaimed the same way
        f.listStatus(new Path(loc)).foreach { top =>
          val name = top.getPath.getName
          if (!name.startsWith("_") && top.isDirectory) {
            val children = f.listStatus(top.getPath)
            val isVersioned = children.nonEmpty &&
              children.forall(_.getPath.getName.startsWith("v-"))
            if (isVersioned) {
              children.foreach { c =>
                if (!referenced.contains(s"$name/${c.getPath.getName}"))
                  f.delete(c.getPath, true)
              }
              if (f.listStatus(top.getPath).isEmpty) f.delete(top.getPath, false)
            } else if (!referenced.exists(_.startsWith(s"$name/")))
              f.delete(top.getPath, true) // legacy table dir
          }
        }
      }
    }
}
