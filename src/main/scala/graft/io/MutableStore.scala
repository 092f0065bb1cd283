package graft.io

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared machinery of the MUTABLE-STORE protocol — the tombstone +
  * versioned-atomic-compaction shape every incremental store in this
  * engine follows (posting tables, SQ8 codes, binary signatures, the
  * dedup hash/shingle stores, the fuzzy signature store):
  *
  *  - mutations are TAG-KEYED dirs (idempotent overwrite under
  *    at-least-once redelivery): `delta_<tag>` appends,
  *    `_tombstones/<tag>` deletes recording the LEGS they cover
  *    (base + delta tags live at delete time — a later append is not
  *    covered, so delete-then-re-add revives);
  *  - probes mask each leg with only its covering tombstones
  *    (broadcast anti-joins; the no-mutation fast path is the store's
  *    original scan);
  *  - compaction folds deltas + consumed tombstones into a FRESH
  *    version path (built under an `_`-prefixed temp — invisible to
  *    recursive listings even half-written — then renamed in; a
  *    version path is NEVER reused, so cached file listings cannot
  *    alias fresh data), and COMMITS with one atomic replace of the
  *    state json carrying the version pointer + folded + consumed
  *    lists; GC is LAGGED behind [[gcRetention]] prior commits;
  *  - every mutation/compaction flow holds the store's WRITER LEASE
  *    ([[withWriterLock]]) — the single-writer contract is enforced,
  *    not documented: a second writer fails loudly instead of
  *    silently dropping a live tag in an interleaved
  *    read-modify-write, and the commit primitives themselves refuse
  *    to run outside a lease.
  */
private[graft] object MutableStore {

  val stateName = "_graft_store_state.json"
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  // ------------------------------------------------------ writer lease
  //
  // The protocol is SINGLE-WRITER per store: every mutation/compaction
  // is a read(state) → write(legs) → commit(state) cycle, and two of
  // them interleaving would silently drop a live tag from the committed
  // lists. The lease makes the contract ENFORCED rather than
  // documented: a mutation flow runs inside [[withWriterLock]], which
  // atomically creates a sibling `__writer_lock` file (CREATE_NEW — the
  // filesystem arbitrates between processes); a second writer fails
  // LOUDLY instead of losing an update. Reentrant within a thread
  // (compactions call commit primitives), and a crashed writer's stale
  // lock is stolen after `ttlMs` via an atomic rename (exactly one
  // stealer can win the move).

  private val held = new ThreadLocal[scala.collection.mutable.Set[String]] {
    override def initialValue() = scala.collection.mutable.Set.empty[String]
  }

  private def lockPath(dir: String): java.nio.file.Path = {
    val d = java.nio.file.Paths.get(dir).toAbsolutePath.normalize
    d.getParent.resolve(d.getFileName.toString + "__writer_lock")
  }

  /** Fails loudly when a state-committing primitive runs OUTSIDE a
    * writer lease — the guard that keeps every mutation path wired
    * through [[withWriterLock]] (a new flow that forgets the lease
    * breaks its own spec instead of silently racing). */
  private def assertWriter(what: String): Unit =
    if (held.get().isEmpty)
      throw new IllegalStateException(
        s"$what outside a writer lease — every mutation/compaction flow " +
          "must run inside MutableStore.withWriterLock(dir) " +
          "(single-writer protocol, enforced)")

  /** Run `body` holding the store's writer lease. Default TTL 10 min:
    * long enough for any single compaction here, short enough that a
    * crashed writer's debris never wedges a deployment. */
  def withWriterLock[A](
      dir: String, owner: String = "", ttlMs: Long = 10L * 60L * 1000L)(body: => A): A = {
    val lock = lockPath(dir)
    val key = lock.toString
    if (held.get().contains(key)) return body // reentrant
    var attempts = 0
    var acquired = false
    while (!acquired) {
      try {
        java.nio.file.Files.createDirectories(lock.getParent)
        val tag = s"$owner@${java.lang.management.ManagementFactory.getRuntimeMXBean.getName}" +
          s" thread=${Thread.currentThread().getId} since=${System.currentTimeMillis()}"
        java.nio.file.Files.write(lock, tag.getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        acquired = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          val age =
            try System.currentTimeMillis() -
              java.nio.file.Files.getLastModifiedTime(lock).toMillis
            catch { case _: Throwable => Long.MaxValue } // vanished → retry create
          if (age > ttlMs) {
            // expired (crashed writer): steal via atomic move to a
            // unique debris name — of N concurrent stealers exactly one
            // move succeeds, everyone then races CREATE_NEW again
            val debris = lock.resolveSibling(
              s"${lock.getFileName}_expired_${System.nanoTime()}")
            try {
              java.nio.file.Files.move(lock, debris)
              java.nio.file.Files.deleteIfExists(debris)
            } catch { case _: Throwable => () }
            attempts += 1
            if (attempts > 8)
              throw new IllegalStateException(
                s"could not acquire the writer lease at $lock after $attempts steals")
          } else {
            val holder =
              try new String(java.nio.file.Files.readAllBytes(lock), "UTF-8")
              catch { case _: Throwable => "<unreadable>" }
            throw new IllegalStateException(
              s"store $dir already has a live writer ($holder) — the mutable-store " +
                s"protocol is single-writer; lease expires ${ttlMs - age} ms from now")
          }
      }
    }
    held.get().add(key)
    try body
    finally {
      held.get().remove(key)
      try java.nio.file.Files.deleteIfExists(lock) catch { case _: Throwable => () }
    }
  }

  /** Committed state: current base version (0 = legacy/initial
    * layout), folded delta tags, consumed tombstone tags, and — when
    * the store has taken a mutation since the protocol landed — the
    * COMMITTED live delta / live tombstone tag lists (the
    * snapshot-pinned-probe contract: a mutation is live exactly when
    * the state names it; `None` = legacy store, resolve by listing).
    * One [[state]] call is ONE atomic read of the json — a probe that
    * derives its whole leg set from a single State can never see a
    * torn mix of two commits. */
  final case class State(v: Int, folded: Set[String], deadTombs: Set[String],
      live: Option[Seq[String]] = None, liveTombs: Option[Seq[String]] = None,
      priors: Seq[String] = Seq.empty)

  def state(dir: String): State = {
    val p = java.nio.file.Paths.get(dir, stateName)
    if (!java.nio.file.Files.exists(p))
      return State(0, Set.empty, Set.empty)
    // an EXISTING state file that fails to parse is a loud error, not a
    // silent fallback: degrading to State(0, ...) would resolve the
    // legacy base path (`dir` instead of `dir_v<N>`) — serving the
    // WRONG data. Unreachable under atomic writes + the writer lease,
    // so reaching it means the store dir was corrupted externally.
    try {
      val n = mapper.readTree(java.nio.file.Files.readString(p))
      import scala.jdk.CollectionConverters._
      def set(k: String) = if (n.has(k))
        n.get(k).elements().asScala.map(_.asText()).toSet else Set.empty[String]
      def opt(k: String) = if (n.has(k))
        Some(n.get(k).elements().asScala.map(_.asText()).toSeq.sorted) else None
      // every writer stamps "v" — a parseable file without it is as
      // corrupt as an unparseable one
      require(n.hasNonNull("v"), s"state file $p carries no version field")
      State(n.get("v").asInt(),
        set("folded"), set("deadTombs"), opt("live"), opt("liveTombs"),
        opt("priors").getOrElse(Seq.empty))
    } catch { case e: Throwable =>
      throw new IllegalStateException(
        s"corrupt store state at $p — refusing to fall back to the legacy " +
          "v=0 layout, which could resolve a superseded base path", e)
    }
  }

  /** COMMIT a mutation into the state file's live-tag lists — creating
    * the file (v = 0, empty fold lists) for a store that never
    * compacted. The write is one atomic replace, so probes reading the
    * state see the old or new commit, never a tear. Single-writer like
    * every mutation. */
  def commitLiveLists(
      dir: String, live: Seq[String], liveTombs: Seq[String]): Unit = {
    assertWriter(s"commitLiveLists($dir)")
    val p = java.nio.file.Paths.get(dir, stateName)
    if (java.nio.file.Files.exists(p))
      patchStringArrays(p, "live" -> live, "liveTombs" -> liveTombs)
    else {
      def arr(s: Seq[String]) = s.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
      java.nio.file.Files.createDirectories(p.getParent)
      Artifact.writeAtomic(p,
        s"""{"v":0,"folded":[],"deadTombs":[],"live":${arr(live)},"liveTombs":${arr(liveTombs)}}""")
    }
  }

  def tombRoot(dir: String): String = s"$dir/_tombstones"

  /** One live tombstone batch and the legs it covers. */
  final case class Tomb(tag: String, covered: Set[String])

  def liveTombs(dir: String): Seq[Tomb] = liveTombsOf(dir, state(dir))

  /** Live tombstones resolved against ONE already-read state — the
    * committed liveTombs list when the state carries it, the legacy
    * listing (minus deadTombs) otherwise. Per-tag stats jsons are
    * immutable once written (tag-keyed overwrite rewrites identical
    * content), so reading them after the one state read cannot tear. */
  def liveTombsOf(dir: String, st: State): Seq[Tomb] =
    liveTombTagsOf(dir, st).map { tag =>
      val n = mapper.readTree(java.nio.file.Files.readString(
        java.nio.file.Paths.get(tombRoot(dir), tag, "_stats.json")))
      import scala.jdk.CollectionConverters._
      Tomb(tag, n.get("covered").elements().asScala.map(_.asText()).toSet)
    }

  /** Live tombstone TAGS against one already-read state — committed
    * list when present, legacy listing (minus deadTombs) otherwise. */
  def liveTombTagsOf(dir: String, st: State): Seq[String] =
    st.liveTombs.getOrElse {
      val root = java.nio.file.Paths.get(tombRoot(dir))
      if (!java.nio.file.Files.exists(root)) Seq.empty[String]
      else {
        val s = java.nio.file.Files.list(root)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala
            .filter(p => java.nio.file.Files.exists(p.resolve("_stats.json")))
            .map(_.getFileName.toString).filterNot(st.deadTombs).toSeq.sorted
        } finally s.close()
      }
    }

  /** Write a tombstone's stats json (LAST — a tombstone is live only
    * once it exists). `covered` = base + the live delta tags NOW. */
  def writeTombStats(dir: String, tag: String, covered: Seq[String]): Unit = {
    assertWriter(s"writeTombStats($dir, $tag)")
    Artifact.writeAtomic(
      java.nio.file.Paths.get(tombRoot(dir), tag, "_stats.json"),
      covered.map(t => "\"" + t + "\"")
        .mkString("""{"covered":[""", ",", "]}"))
  }

  /** Atomically commit a new store state (a compaction's commit point:
    * version pointer + folded/consumed lists + the surviving live
    * legs). */
  def commitState(dir: String, v: Int, folded: Seq[String], deadTombs: Seq[String],
      live: Seq[String] = Seq.empty, liveTombs: Seq[String] = Seq.empty,
      priors: Seq[String] = Seq.empty): Unit = {
    assertWriter(s"commitState($dir)")
    def arr(s: Seq[String]) = s.map("\"" + _ + "\"").mkString("[", ",", "]")
    Artifact.writeAtomic(
      java.nio.file.Paths.get(dir, stateName),
      s"""{"v":$v,"folded":${arr(folded.sorted)},"deadTombs":${arr(deadTombs.sorted)},"live":${arr(live.sorted)},"liveTombs":${arr(liveTombs.sorted)},"priors":${arr(priors.sorted)}}""")
  }

  /** The source leg of a store row, derived from its file path. */
  def legOf: Column =
    when(input_file_name().rlike("/delta_[^/]+/"),
      regexp_extract(input_file_name(), "/delta_([^/]+)/", 1))
      .otherwise(lit("base"))

  def deleteDir(p: java.nio.file.Path): Unit = {
    if (!java.nio.file.Files.exists(p)) return
    val walk = java.nio.file.Files.walk(p)
    try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(f => java.nio.file.Files.deleteIfExists(f))
    finally walk.close()
  }

  /** Highest `<prefix><N>` version dir on disk (committed or debris) —
    * the next version must skip past BOTH. */
  def maxOnDiskVersion(dir: String, prefixes: Seq[String]): Int = {
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(root)) return 0
    val s = java.nio.file.Files.list(root)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString)
        .flatMap(nm => prefixes.collectFirst {
          // strip the PREFIX, not "leading non-digits" — a prefix may
          // itself contain digits (e.g. a `graft_bm25del_x_v` stem)
          case p if nm.matches(java.util.regex.Pattern.quote(p) + "\\d+") =>
            nm.substring(p.length).toInt
        })
        .foldLeft(0)(math.max)
    } finally s.close()
  }

  // -------------------------------------------------- GC retention
  //
  // Lagged GC generalized from "exactly one commit" to a RETENTION
  // KNOB (the Iceberg snapshot-expiry analogue): every compaction
  // commit pushes the PRE-compaction snapshot's reference set
  // (version + live delta tags + live tombstone tags) onto the
  // sidecar's `priors` list, and the NEXT compaction's GC protects the
  // newest `gcRetention - 1` entries, dropping only the refs of older
  // ones (minus anything a protected/current snapshot still names).
  // Default 1 = the engine's historical behavior: a pinned probe
  // survives exactly one concurrent commit. Retention R = a probe
  // survives R consecutive commits.

  /** How many PRIOR compaction commits a pinned probe must survive —
    * the PROCESS-WIDE default (the maintenance writer's policy, like
    * spark.sql.shuffle.partitions); set >1 when long-running probes
    * overlap a compaction-heavy mutation stream. A PER-STORE policy
    * ([[setGcRetention]]) overrides it. */
  @volatile var gcRetention: Int = 1

  private def retentionFile(dir: String): java.nio.file.Path = {
    val d = java.nio.file.Paths.get(dir).toAbsolutePath.normalize
    d.getParent.resolve(d.getFileName.toString + "__gc_retention")
  }

  /** PERSIST a per-store retention policy (a sibling sidecar, so it
    * survives processes and applies to whichever maintenance writer
    * compacts next); None clears back to the process default. */
  def setGcRetention(dir: String, n: Option[Int]): Unit = n match {
    case Some(v) =>
      require(v >= 1, s"retention must be >= 1, got $v")
      Artifact.writeAtomic(retentionFile(dir), v.toString)
    case None =>
      java.nio.file.Files.deleteIfExists(retentionFile(dir))
  }

  /** PERSIST a TIME-based per-store retention policy (the Iceberg
    * snapshot-expiry TTL form): a prior snapshot's refs stay
    * GC-protected until `ttlMs` has passed since the commit that
    * superseded it — the natural knob when the bound is "probes never
    * run longer than X", independent of how often compactions land. */
  def setGcRetentionTtl(dir: String, ttlMs: Long): Unit = {
    require(ttlMs >= 0, s"ttl must be >= 0, got $ttlMs")
    Artifact.writeAtomic(retentionFile(dir), s"ttl:$ttlMs")
  }

  /** `dir`'s governing policy: Left(n prior commits) or Right(ttl ms).
    * Per-store file when set, the process default otherwise. */
  def gcPolicyOf(dir: String): Either[Int, Long] = {
    val p = retentionFile(dir)
    if (!java.nio.file.Files.exists(p)) Left(gcRetention)
    else
      try {
        val s = java.nio.file.Files.readString(p).trim
        if (s.startsWith("ttl:")) Right(math.max(0L, s.stripPrefix("ttl:").toLong))
        else Left(math.max(1, s.toInt))
      } catch {
        case e: Throwable => throw new IllegalStateException(
          s"corrupt per-store retention policy at $p", e)
      }
  }

  /** The commit-count retention governing `dir` (TTL policies have no
    * single count; callers needing one use [[gcPolicyOf]]). */
  def gcRetentionOf(dir: String): Int =
    gcPolicyOf(dir).swap.getOrElse(gcRetention)

  /** One retained prior snapshot's reference set. `supersededAtMs` is
    * the wall-clock of the commit that retired it (feeds the TTL
    * policy; 0 for entries written before the stamp existed — they
    * expire immediately under TTL, the conservative legacy bound). */
  final case class SnapRef(v: Int, live: Seq[String], tombs: Seq[String],
      supersededAtMs: Long = 0L)

  /** `priors` entries are strings (they ride the same sorted
    * string-array sidecar machinery as every other committed list);
    * tags are sanitized batch ids, never containing '|' or ','. The
    * leading zero-padded version keeps the sorted array NEWEST-LAST,
    * so decode order is deterministic. */
  def encodeRef(r: SnapRef): String =
    f"${r.v}%09d|${r.live.mkString(",")}|${r.tombs.mkString(",")}|${r.supersededAtMs}"

  def decodeRef(s: String): SnapRef = {
    val parts = s.split("\\|", -1)
    require(parts.length == 3 || parts.length == 4,
      s"malformed prior-snapshot ref: $s")
    def tags(x: String) = if (x.isEmpty) Seq.empty[String] else x.split(",").toSeq
    SnapRef(parts(0).toInt, tags(parts(1)), tags(parts(2)),
      if (parts.length == 4) parts(3).toLong else 0L)
  }

  /** Hard cap on retained priors under a TTL policy — bounds the
    * sidecar list if compactions land faster than snapshots expire. */
  private val maxTtlPriors = 64

  /** Split a committed `priors` list (any order on disk) into the
    * retention-PROTECTED newest entries and the DUE-for-GC rest,
    * under `dir`'s governing policy (N prior commits, or TTL since
    * the superseding commit). */
  def splitPriors(dir: String, priors: Seq[String]): (Seq[SnapRef], Seq[SnapRef]) = {
    val refs = priors.map(decodeRef).sortBy(-_.v)
    gcPolicyOf(dir) match {
      case Left(n) =>
        val keep = math.max(0, n - 1)
        (refs.take(keep), refs.drop(keep))
      case Right(ttl) =>
        val now = System.currentTimeMillis()
        val (young, old) = refs.partition(r => now - r.supersededAtMs <= ttl)
        (young.take(maxTtlPriors), old ++ young.drop(maxTtlPriors))
    }
  }

  /** The `priors` list a compaction COMMITS: the pre-compaction
    * snapshot pushed on top of the still-protected entries (GC at this
    * compaction's start already dropped the rest), commit-stamped for
    * the TTL policy. */
  def pushPrior(
      dir: String, protectedRefs: Seq[SnapRef], pre: SnapRef): Seq[String] = {
    val stamped =
      if (pre.supersededAtMs > 0L) pre
      else pre.copy(supersededAtMs = System.currentTimeMillis())
    val cap = gcPolicyOf(dir) match {
      case Left(n) => math.max(1, n)
      case Right(_) => maxTtlPriors
    }
    (stamped +: protectedRefs).take(cap).map(encodeRef).sorted
  }

  /** A tombstone is consumed when every covered leg is the base, is
    * folding now, or folded earlier (its dir is gone). */
  def consumedTombs(tombs: Seq[Tomb], folding: Seq[String], liveNow: Set[String]): Seq[Tomb] =
    tombs.filter(_.covered.forall(c =>
      c == "base" || folding.contains(c) || !liveNow.contains(c)))

  /** A sorted string-array field of a committed state/sidecar json —
    * None when the FIELD is absent (a sidecar written before the
    * committed-live-leg protocol; callers then fall back to the legacy
    * directory-listing resolution). */
  def optStringSeq(
      node: Option[com.fasterxml.jackson.databind.JsonNode],
      key: String): Option[Seq[String]] =
    node.filter(_.has(key)).map { n =>
      import scala.jdk.CollectionConverters._
      n.get(key).elements().asScala.map(_.asText()).toSeq.sorted
    }

  /** Recursive on-disk byte size — the numerator/denominator feeds of
    * the size-ratio compaction policies. */
  def duBytes(path: java.nio.file.Path): Long = {
    if (!java.nio.file.Files.exists(path)) return 0L
    val walk = java.nio.file.Files.walk(path)
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(java.nio.file.Files.size(_)).sum
    } finally walk.close()
  }

  /** Base bytes of a FLAT-layout store (seed files at the dir root, or
    * the committed `base_v<N>` dir after a compaction). */
  def flatBaseBytes(dir: String): Long = {
    val st = state(dir)
    if (st.v > 0) duBytes(java.nio.file.Paths.get(dir, s"base_v${st.v}"))
    else {
      val root = java.nio.file.Paths.get(dir)
      if (!java.nio.file.Files.exists(root)) return 0L
      val s = java.nio.file.Files.list(root)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter { p =>
            val nm = p.getFileName.toString
            !nm.startsWith("delta_") && !nm.startsWith("base_v") &&
              !nm.startsWith("_") && !nm.startsWith(".")
          }
          .map(duBytes).sum
      } finally s.close()
    }
  }

  /** Live delta bytes of a flat-layout store. */
  def flatDeltaBytes(dir: String, liveTags: Seq[String]): Long =
    liveTags.map(t => duBytes(java.nio.file.Paths.get(dir, s"delta_$t"))).sum

  /** Atomically PATCH string-array fields of an existing json file
    * (read → set → one atomic replace) — the MUTATION-COMMIT primitive
    * of the snapshot-pinned-probe protocol: an append/delete records
    * its tag in the owning sidecar's `live`/`liveTombs` list AFTER its
    * leg dir is fully written, so a mutation is live exactly when the
    * committed state names it and a probe resolves its WHOLE leg set
    * from ONE sidecar read (no directory listing can be torn against a
    * concurrent commit). Single-writer like every mutation; a crash
    * between the leg write and this patch leaves the leg invisible —
    * at-least-once redelivery rewrites both. No-op when the file does
    * not exist (never-ensured store → legacy listing resolution). */
  def patchStringArrays(
      path: java.nio.file.Path, updates: (String, Seq[String])*): Unit = {
    assertWriter(s"patchStringArrays($path)")
    if (!java.nio.file.Files.exists(path)) return
    val node = mapper.readTree(java.nio.file.Files.readString(path))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    updates.foreach { case (k, vs) =>
      val arr = node.putArray(k)
      vs.sorted.foreach(arr.add)
    }
    Artifact.writeAtomic(path, node.toString)
  }
}
