package graft.tools

import org.apache.hadoop.fs.{FileSystem, Path}

/** Shared recursive-listing plumbing for the operational tools (DistCopy,
  * Compact): decoded relative paths and crash-leftover filtering.
  */
private[tools] object TreeListing {

  /** Relative path of `p` under the qualified base `qbase`, as a DECODED
    * path string. `qbase.toUri.relativize(p.toUri).toString` percent-encodes
    * URI-special characters (a space becomes %20), and the result was then
    * re-parsed LITERALLY via `new Path(base + "/" + rel)` — so any tree
    * containing such names failed to copy with FileNotFoundException.
    * `Path.toString` yields the decoded form on both sides, so plain string
    * prefix arithmetic is exact for every name `Path` itself can represent. */
  def rel(qbase: Path, p: Path): String = {
    val b = qbase.toString
    val f = p.toString
    require(f.startsWith(b + "/"), s"$f is not under $b")
    f.substring(b.length + 1)
  }

  /** In-flight task-attempt temp from a crashed prior DistCopy/Compact run
    * (`.{name}.distcp-{attempt}` / `.{name}.compact-{attempt}`). These are
    * filtered from listings: FileSystem.listFiles does NOT hide dotfiles, so
    * a copy FROM a destination holding a stale temp would propagate it. */
  def isStaleTemp(name: String): Boolean =
    name.startsWith(".") &&
      (name.contains(".distcp-") || name.contains(".compact-"))

  /** Recursive file listing of `qbase` as a stream of (relative path,
    * length) — an Iterator so callers above a spill threshold can drain it
    * to disk without ever materializing the whole tree in driver memory. */
  def list(fs: FileSystem, qbase: Path): Iterator[(String, Long)] = {
    val it = fs.listFiles(qbase, true)
    new Iterator[(String, Long)] {
      def hasNext: Boolean = it.hasNext
      def next(): (String, Long) = {
        val s = it.next()
        (rel(qbase, s.getPath), s.getLen)
      }
    }.filterNot { case (r, _) => isStaleTemp(new Path(r).getName) }
  }
}
