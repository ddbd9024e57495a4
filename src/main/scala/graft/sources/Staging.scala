package graft.sources

/** The fingerprint-once publish protocol shared by every staged
  * fixture writer (JSONL, zstd-JSONL, ORC, Avro, WARC): the corpus
  * lands under `root/<safe-name>__fp<hex>`, stale siblings from an
  * older fingerprint are deleted first, the write goes to a hidden
  * tmp dir and publishes via atomic rename, `_SUCCESS` marks a
  * complete publish, and a lost rename race keeps whichever full
  * write landed. ONE implementation — the five writers carried
  * near-identical copies whose `_SUCCESS` handling had already
  * started to drift (Spark committers write the marker themselves;
  * hand-rolled writers must create it), so a protocol fix applied to
  * one copy would silently miss the rest.
  */
private[sources] object Staging {

  private[sources] def safeName(name: String): String =
    name.map(c => if (c.isLetterOrDigit || c == '.' || c == '-') c else '_')

  private[sources] def deleteTree(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteTree)
    f.delete(): Unit
  }

  /** The per-partition shard file `part-NNNNN.<ext>` of the current
    * task — ONE definition of the naming/truncate discipline the
    * hand-rolled writers (zstd-JSONL, Avro, WARC) previously copied
    * (a pad-width or durability fix must not need re-applying per
    * writer).
    */
  private[sources] def partFile(tmpPath: String,
                                ext: String): java.io.File = {
    val pid = org.apache.spark.TaskContext.getPartitionId()
    new java.io.File(tmpPath, f"part-$pid%05d.$ext")
  }

  /** Run `write` into a fresh tmp dir and publish it as
    * `root/<safe>__fp<hex>`; returns the published path. `write`
    * receives the tmp dir (already created) and may write through
    * Spark (whose committer adds its own `_SUCCESS`) or by hand —
    * the marker is ensured after the rename either way. `what`
    * names the caller in the lost-race failure message.
    */
  private[sources] def publishOnce(root: String, name: String,
                                   fingerprint: Long, what: String)
                                  (write: java.io.File => Unit): String = {
    val safe = safeName(name)
    val dirName = s"${safe}__fp${java.lang.Long.toHexString(fingerprint)}"
    val dir = new java.io.File(root, dirName)
    val done = new java.io.File(dir, "_SUCCESS")
    if (!done.isFile) {
      // stale siblings: same name, older fingerprint — dead fixtures
      Option(new java.io.File(root).listFiles())
        .getOrElse(Array.empty)
        .filter(f => f.getName.startsWith(s"${safe}__fp") &&
          f.getName != dirName)
        .foreach(deleteTree)
      // a SAME-NAME dir without _SUCCESS is, by this protocol's own
      // definition, an incomplete publish (a crash in the
      // rename→marker window): delete it like a stale sibling — left
      // in place it fails the rename below on EVERY subsequent run, a
      // permanent wedge only a manual delete could clear
      if (dir.exists()) deleteTree(dir)
      // tmp write + atomic rename (the stage disk tier's publish
      // protocol): a concurrent or crashed process never observes a
      // half-written corpus under the published name. The tmp name is
      // PER-ATTEMPT unique (pid + nanos, the Stages disk-tier
      // discipline): a shared deterministic tmp let two concurrent
      // same-fingerprint publishers interleave — one deleting and
      // rewriting the dir the other was about to rename — publishing
      // a mixed partial corpus under _SUCCESS
      val tmp = new java.io.File(root,
        s".$dirName.tmp-${ProcessHandle.current().pid()}-${System.nanoTime()}")
      tmp.mkdirs()
      try write(tmp)
      catch { case e: Throwable => deleteTree(tmp); throw e }
      if (!tmp.renameTo(dir)) {
        // lost a publish race: keep whichever full write landed,
        // drop ours
        deleteTree(tmp)
        if (!done.isFile)
          throw new java.io.IOException(s"$what: could not publish $dir")
      } else {
        // a failed marker (e.g. a racer deleted our just-renamed,
        // not-yet-marked dir as incomplete) must fail LOUD — an
        // unmarked publish reads as incomplete forever
        try { done.createNewFile(): Unit } // no-op if a committer wrote it
        catch { case e: java.io.IOException =>
          throw new java.io.IOException(
            s"$what: published $dir but could not mark it complete", e) }
      }
    }
    dir.toString
  }
}
