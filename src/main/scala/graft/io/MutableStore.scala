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
  *    lists; GC runs last, best-effort.
  */
private[graft] object MutableStore {

  val stateName = "_graft_store_state.json"
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

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
      live: Option[Seq[String]] = None, liveTombs: Option[Seq[String]] = None)

  def state(dir: String): State = {
    val p = java.nio.file.Paths.get(dir, stateName)
    if (!java.nio.file.Files.exists(p))
      return State(0, Set.empty, Set.empty)
    try {
      val n = mapper.readTree(java.nio.file.Files.readString(p))
      import scala.jdk.CollectionConverters._
      def set(k: String) = if (n.has(k))
        n.get(k).elements().asScala.map(_.asText()).toSet else Set.empty[String]
      def opt(k: String) = if (n.has(k))
        Some(n.get(k).elements().asScala.map(_.asText()).toSeq.sorted) else None
      State(if (n.hasNonNull("v")) n.get("v").asInt() else 0,
        set("folded"), set("deadTombs"), opt("live"), opt("liveTombs"))
    } catch { case _: Throwable => State(0, Set.empty, Set.empty) }
  }

  /** COMMIT a mutation into the state file's live-tag lists — creating
    * the file (v = 0, empty fold lists) for a store that never
    * compacted. The write is one atomic replace, so probes reading the
    * state see the old or new commit, never a tear. Single-writer like
    * every mutation. */
  def commitLiveLists(
      dir: String, live: Seq[String], liveTombs: Seq[String]): Unit = {
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
  def writeTombStats(dir: String, tag: String, covered: Seq[String]): Unit =
    Artifact.writeAtomic(
      java.nio.file.Paths.get(tombRoot(dir), tag, "_stats.json"),
      covered.map(t => "\"" + t + "\"")
        .mkString("""{"covered":[""", ",", "]}"))

  /** Atomically commit a new store state (a compaction's commit point:
    * version pointer + folded/consumed lists + the surviving live
    * legs). */
  def commitState(dir: String, v: Int, folded: Seq[String], deadTombs: Seq[String],
      live: Seq[String] = Seq.empty, liveTombs: Seq[String] = Seq.empty): Unit = {
    def arr(s: Seq[String]) = s.map("\"" + _ + "\"").mkString("[", ",", "]")
    Artifact.writeAtomic(
      java.nio.file.Paths.get(dir, stateName),
      s"""{"v":$v,"folded":${arr(folded.sorted)},"deadTombs":${arr(deadTombs.sorted)},"live":${arr(live.sorted)},"liveTombs":${arr(liveTombs.sorted)}}""")
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
