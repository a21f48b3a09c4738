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
  *                                     written as .tmp then committed by
  *                                     an EXCLUSIVE create — atomic, so a
  *                                     listed manifest is always complete
  *                                     and a version can commit only once)
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
  * each other): resolve the base manifest (version B) → write all new
  * table dirs → [[IndexLock.verify]] the fence → publish manifest
  * version B+1. The publish is PUT-IF-ABSENT on the version number (the
  * Delta/Iceberg conditional commit): the manifest body is written to a
  * tmp file and committed by an exclusive-create of `m.(B+1)` — a hard
  * link on `file:` paths (atomic + fails-if-exists by POSIX contract),
  * a rename elsewhere (fails-if-exists on HDFS) — so a writer whose
  * lease expired mid-operation and whose lock was broken CANNOT land a
  * stale-based state over the new holder's commit even if it slips past
  * the fence check: its base version is no longer current, its target
  * name is taken, and the publish throws. At most one publish per
  * version ever succeeds. A crash (or a fenced-out zombie aborting at
  * verify/publish) leaves orphan table dirs that no manifest references
  * — invisible to every reader, reclaimed by [[vacuum]]. This retires
  * the r11 staleness-marker discipline (delete stats first, rewrite
  * last): there is no in-place mutation left to tear.
  *
  * Readers: [[current]] resolves the newest committed version with a
  * LIST-free fast path when possible — committed versions are dense
  * (put-if-absent publish) and vacuum retains a contiguous newest
  * suffix, so from the JVM's last-known version it probes `m.(v+1)`,
  * `m.(v+2)`, … by existence (HEAD, not LIST — the cheap operation on
  * an object store at service QPS) and only falls back to listing
  * `_manifests` when the probe chain has a vacuumed gap or the loc was
  * never seen. The fast path can never resolve BELOW a version this JVM
  * already observed (the cache is monotone max). Old versions are
  * retained until an explicit [[vacuum]] (writers never delete data at
  * commit), so a reader holding a resolved manifest stays consistent
  * even across later commits; [[IndexStore]] read paths additionally
  * materialize their (top-k-bounded) results, which bounds the window a
  * vacuum could race.
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
  private def mpath(loc: String, v: Long) = new Path(s"$loc/_manifests/m.$v")

  private val NameRx = """m\.(\d+)""".r

  /** Newest version this JVM has observed per loc — the LIST-free resolve
    * fast path's starting point. Monotone max: a resolve can never go
    * BELOW a version already observed here.
    */
  private val lastKnown =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private[graft] def noteVersion(loc: String, v: Long): Unit =
    lastKnown.merge(loc, v,
      (a, b) => if (a.longValue >= b.longValue) a else b)

  /** Test hook: drop the loc's cached version so a spec can exercise the
    * cold / stale-cache resolve paths a cross-process reader would see.
    */
  private[graft] def forget(loc: String): Unit = lastKnown.remove(loc)

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

  /** Newest committed version, fast path first: from the JVM's last-known
    * version walk `m.(v+1)`, `m.(v+2)`, … by EXISTENCE probes (committed
    * versions are dense and vacuum keeps a contiguous newest suffix, so
    * if `m.(v+1)` exists the walk reaches the newest; if it doesn't,
    * either `v` is still newest — `m.v` exists, the newest is never
    * vacuumed — or the chain was vacuumed past `v` and the LIST fallback
    * runs). A cold cache LISTs once and is warm thereafter.
    */
  /** Fast-path probe-walk cap (r15 ADVICE): a reader JVM whose cache is
    * far behind a hot writer would otherwise pay an unbounded SERIAL
    * HEAD chain that a single LIST beats; past this many steps the walk
    * abandons to the LIST fallback, the cache jumps to newest, and
    * subsequent resolves are flat again.
    */
  private val ProbeWalkCap = 16

  private def resolveNewest(s: SparkSession, loc: String): Option[Long] = {
    val f = fs(s, loc)
    val cached = Option(lastKnown.get(loc)).map(_.longValue).getOrElse(0L)
    val fast: Option[Long] =
      if (cached <= 0L) None
      else if (f.exists(mpath(loc, cached + 1))) {
        var v = cached + 1
        var steps = 1
        while (steps < ProbeWalkCap && f.exists(mpath(loc, v + 1))) {
          v += 1; steps += 1
        }
        if (steps >= ProbeWalkCap) None // far behind a hot writer: LIST
        else Some(v)
      } else if (f.exists(mpath(loc, cached))) Some(cached)
      else None
    val out = fast.orElse(versions(s, loc).lastOption)
    out.foreach(noteVersion(loc, _))
    out
  }

  /** Newest committed state, resolved once — the reader entry point. */
  def current(s: SparkSession, loc: String): Option[Manifest] =
    resolveNewest(s, loc).map(v => read(s, loc, v))

  /** Newest committed version number; 0 if never committed. */
  def currentVersion(s: SparkSession, loc: String): Long =
    resolveNewest(s, loc).getOrElse(0L)

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

  /** Commit `tables` as manifest version `base + 1` and return it, where
    * `base` is the version the mutation RESOLVED and derived its state
    * from (0 for a from-scratch build). Put-if-absent on the version
    * number: if `m.(base+1)` already exists — another writer committed
    * since the caller resolved `base` — the publish throws loudly
    * instead of silently discarding the other commit. Caller MUST hold
    * the loc's [[IndexLock]] (single writer) and have verified its fence
    * immediately before calling; this CAS is the backstop for the
    * residual window the lease/fence protocol cannot close (a holder
    * broken between verify and publish).
    */
  def publish(s: SparkSession, loc: String,
      tables: Map[String, Seq[String]], base: Long): Long = {
    val f = fs(s, loc)
    f.mkdirs(mdir(loc))
    val v = base + 1
    val body = tables.toSeq.sortBy(_._1)
      .map { case (t, rels) => s"$t=${rels.mkString(",")}" }.mkString("\n")
    val tmp = new Path(
      s"$loc/_manifests/m.$v.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = f.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    val dst = mpath(loc, v)
    def conflict(): Nothing = {
      f.delete(tmp, false)
      throw new java.util.ConcurrentModificationException(
        s"manifest publish conflict at $loc: version $v already committed " +
          s"(this writer's base $base is stale — its lease expired and " +
          "another holder committed); aborting, uncommitted table dirs " +
          "stay unreferenced")
    }
    if (f.getScheme == "file") {
      // exclusive create via hard link: atomic AND fails-if-exists by
      // POSIX contract (rename would silently overwrite here)
      try java.nio.file.Files.createLink(
        java.nio.file.Paths.get(dst.toUri.getPath),
        java.nio.file.Paths.get(tmp.toUri.getPath))
      catch { case _: java.nio.file.FileAlreadyExistsException => conflict() }
      f.delete(tmp, false)
    } else {
      // HDFS rename fails when the destination exists; the pre-check
      // narrows the window on filesystems where it doesn't
      if (f.exists(dst)) conflict()
      if (!f.rename(tmp, dst)) {
        if (f.exists(dst)) conflict()
        throw new java.io.IOException(s"manifest publish rename $tmp -> $dst failed")
      }
    }
    noteVersion(loc, v)
    v
  }

  /** A fresh (not yet referenced) version-dir relative path for `table`. */
  def newRel(table: String): String =
    s"$table/v-${java.util.UUID.randomUUID().toString.take(13)}"

  /** Retention floor for [[vacuum]]: a superseded manifest YOUNGER than
    * this many ms is retained regardless of `keepManifests` — the
    * operator-facing answer to "how long may an external reader or
    * auditor hold a resolved version?" (commit COUNTS are not a unit a
    * deployment can reason about; wall time is). 0 (the gate/dev
    * default) disables the floor; production sizes it to the longest
    * un-materialized scan / audit window (RUNBOOK "At-rest index
    * maintenance").
    */
  def defaultVacuumMinAgeMs: Long = sys.env.getOrElse(
    "SPARK_GRAFT_INDEX_VACUUM_MIN_AGE_MS", "0").toLong

  /** Reclaim table dirs no retained manifest references, and manifests
    * older than the newest `keepManifests` — except that any manifest
    * younger than `minAgeMs` is retained regardless of count (the
    * age-based reader-protection floor). Takes the loc's [[IndexLock]]
    * (deleting data is the one destructive act left in the protocol).
    * `keepManifests` ≥ 1; the default 2 keeps one superseded state so a
    * reader that resolved just before the newest commit can still finish
    * an un-materialized scan. Young manifests are the NEWEST ones
    * (publishes are serialized), so the retained set stays a contiguous
    * newest suffix — the invariant the [[current]] fast path probes on.
    */
  def vacuum(s: SparkSession, loc: String, keepManifests: Int = 2,
      minAgeMs: Long = defaultVacuumMinAgeMs): Unit =
    IndexLock.withLock(s, loc) { _ =>
      val f = fs(s, loc)
      val vs = versions(s, loc)
      if (vs.nonEmpty) {
        val youngFloor = System.currentTimeMillis() - minAgeMs
        val young =
          if (minAgeMs <= 0) Set.empty[Long]
          else vs.filter(v =>
            f.getFileStatus(mpath(loc, v)).getModificationTime >= youngFloor).toSet
        // contiguity by CONSTRUCTION, not by mtime assumption (r15
        // ADVICE): publishes are serialized so young manifests are
        // normally the newest — but a copyDir-cloned loc resets every
        // mtime and clock skew can age-invert, making an OLDER manifest
        // "young" and the count∪age union gappy; the fast path's
        // dense-suffix invariant would then stop at a pre-gap version
        // and resolve a stale newest. Retaining everything at-or-above
        // the union's minimum keeps the suffix dense no matter what the
        // mtimes claim.
        val keepFloor =
          (vs.takeRight(math.max(1, keepManifests)) ++ young).min
        val keep = vs.filter(_ >= keepFloor)
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
