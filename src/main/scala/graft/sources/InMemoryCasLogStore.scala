package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.{FileSystem, Path}

/** Reference [[LogStore]] built on an EXTERNAL compare-and-swap table —
  * the architecture a production object-store deployment needs (the
  * role DynamoDB plays for the reference's conditional put,
  * /root/reference/index.js:368, and for Delta-on-S3): the atomic
  * decision lives in the CAS table, the filesystem only materializes
  * the already-decided bytes. Here the "table" is a JVM-wide
  * ConcurrentHashMap, which makes this implementation suitable for
  * single-JVM multi-threaded use and for CONTRACT TESTING (it is the
  * second implementation the conformance suite runs, proving the suite
  * itself isn't shaped around Hadoop primitives); a real S3 deployment
  * swaps the map for a conditional PUT (`If-None-Match: *`) or a
  * DynamoDB-style row CAS and keeps everything else.
  *
  * Protocol per [[putIfAbsent]] call:
  *
  *  1. CAS the (qualified dst → json) row into the table. The FIRST
  *     caller wins; everyone else loses — this is the entire
  *     serialization point, no filesystem state participates.
  *  2. The winner writes `dst` (plain create — safe, the CAS already
  *     made this path single-writer) and returns true.
  *  3. A loser READ-REPAIRS: if `dst` is not yet visible (the winner
  *     may still be mid-write, or crashed between CAS and write), it
  *     re-materializes the winner's bytes from the table before
  *     returning false — so after ANY false return, the destination
  *     holds the winner's manifest. This is the recovery step a
  *     DynamoDB-backed store runs on read ("complete the put"), folded
  *     into the loser path. Concurrent repairers write byte-identical
  *     content through a temp file + link/rename, so a half-written
  *     manifest is never listable.
  *
  * Crash window: a winner that dies between steps 1 and 2 leaves the
  * commit decided-but-unmaterialized until the next contender repairs
  * it — the standard external-CAS trade-off, and why readers of a
  * CAS-backed log must treat the TABLE, not the directory listing, as
  * the source of version truth when the two disagree. [[CommitLog]]'s
  * retry loop (lost CAS → re-read → next version) hits the repair path
  * naturally.
  *
  * Instantiated by name via `spark.graft.logStore.class` (no-arg
  * constructor, per the [[LogStore]] contract); state is per-JVM in
  * the companion so every instance shares one table.
  */
final class InMemoryCasLogStore extends LogStore {
  override def putIfAbsent(fs: FileSystem, dst: Path, json: String): Boolean = {
    val key = fs.makeQualified(dst).toString
    val prior = InMemoryCasLogStore.table.putIfAbsent(key, json)
    if (prior == null) {
      // temp + rename, NOT a plain create: a direct create makes dst
      // listable before its bytes land, and the reader contract says a
      // half-written manifest must never be observable. A racing loser
      // repair may rename over this — byte-identical, so harmless.
      InMemoryCasLogStore.materialize(fs, dst, json)
      true
    } else {
      if (!fs.exists(dst)) InMemoryCasLogStore.materialize(fs, dst, prior)
      false
    }
  }
}

object InMemoryCasLogStore {
  /** The JVM-wide CAS table: qualified destination URI → winning json.
    * Cleared only via [[reset]] (tests); a production swap-in replaces
    * this with the external conditional-PUT/row-CAS service. */
  private val table = new ConcurrentHashMap[String, String]()

  /** Materialize already-decided bytes at `dst` (winner write and
    * loser read-repair share this). Temp file + rename keeps
    * half-written files out of directory listings; a LOSING rename is
    * benign only when `dst` is already visible (every caller for one
    * dst carries byte-identical content). A rename that fails with NO
    * manifest visible must throw (ADVICE r11): swallowing it would let
    * the winner's putIfAbsent return true while the committed version
    * stays invisible to directory-listing readers forever — with no
    * later contender guaranteed to read-repair it. */
  private def materialize(fs: FileSystem, dst: Path, json: String): Unit = {
    val tmp = new Path(dst.getParent,
      s".tmp-cas-${java.util.UUID.randomUUID()}.json")
    fs.mkdirs(dst.getParent)
    val out = fs.create(tmp, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    val renamed =
      try fs.rename(tmp, dst)
      catch { case _: java.io.IOException => false }
      finally fs.delete(tmp, false)
    if (!renamed && !fs.exists(dst))
      throw new java.io.IOException(
        s"CAS materialize: rename to $dst failed and no manifest is " +
          "visible — the decided commit could not be made durable")
  }

  /** Test hook: drop all CAS state (a fresh "table"). */
  private[graft] def reset(): Unit = table.clear()
}
