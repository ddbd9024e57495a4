package graft.sources

import java.io.File
import org.scalatest.funsuite.AnyFunSuite

/** The fingerprint-once publish protocol's crash/concurrency pins —
  * no Spark needed, the protocol is plain files + locks.
  */
class StagingSpec extends AnyFunSuite {

  private def freshRoot(tag: String): File = {
    val d = new File(s"target/test_staging/$tag-${System.nanoTime()}")
    d.mkdirs()
    d
  }

  private def slurp(f: File): String =
    new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")

  test("publishOnce: publishes once, returns the marked dir, and a " +
      "second call is a no-op fast path that never re-runs write") {
    val root = freshRoot("once")
    var calls = 0
    def pub() = Staging.publishOnce(root.toString, "t", 0x2aL, "spec") {
      tmp => calls += 1
        java.nio.file.Files.write(new File(tmp, "data").toPath,
          "v1".getBytes("UTF-8")): Unit
    }
    val p1 = pub()
    val p2 = pub()
    assert(p1 === p2 && calls === 1)
    assert(new File(p1, "_SUCCESS").isFile)
    assert(slurp(new File(p1, "data")) === "v1")
  }

  test("dead-tmp sweep: a crashed attempt's tmp dir (dead pid) is " +
      "reclaimed at the next publish; a LIVE pid's in-flight tmp " +
      "and unrelated dotfiles survive") {
    val root = freshRoot("sweep")
    // a tmp dir whose embedded pid is certainly dead (pid_max is
    // bounded well below this on linux)
    val dead = new File(root, ".t__fpbeef.tmp-999999999-1")
    new File(dead, "sub").mkdirs()
    // a tmp dir attributed to THIS live process — must not be swept
    val live = new File(root,
      s".t__fpbeef.tmp-${ProcessHandle.current().pid()}-1")
    live.mkdirs()
    // an unrelated dotfile that merely shares the prefix style
    val other = new File(root, ".other__fp1.tmp-999999999-1")
    other.mkdirs()
    Staging.publishOnce(root.toString, "t", 0xbeefL, "spec") { tmp =>
      java.nio.file.Files.write(new File(tmp, "data").toPath,
        "x".getBytes("UTF-8")): Unit
    }
    assert(!dead.exists(), "dead-pid tmp should be swept")
    assert(live.exists(), "live-pid tmp must survive the sweep")
    assert(other.exists(), "other fixtures' tmp dirs are not ours to sweep")
    // the sweep stays reachable AFTER the fixture is published: a
    // remnant whose pid was alive during the publish-time sweep (a
    // concurrent publisher killed later) must still be reclaimed by
    // a fast-path call, not leak behind the _SUCCESS short-circuit.
    // Negative-nanos names (System.nanoTime has an arbitrary origin)
    // must match the sweep pattern too.
    val lateDead = new File(root, ".t__fpbeef.tmp-999999998--42")
    lateDead.mkdirs()
    Staging.publishOnce(root.toString, "t", 0xbeefL, "spec") { _ =>
      fail("published fixture must not re-write")
    }
    assert(!lateDead.exists(),
      "post-publish crash remnant leaked behind the fast path")
  }

  test("pid-recycled remnant: a tmp dir whose last write predates " +
      "its pid's process START is reclaimed despite the pid being " +
      "alive (round-15 ADVICE: isAlive matches ANY process with " +
      "that pid)") {
    val root = freshRoot("recycle")
    val self = ProcessHandle.current()
    val start = self.info().startInstant()
    assume(start.isPresent, "platform exposes no process start time")
    // a remnant attributed to OUR (live) pid, but last modified an
    // hour before this JVM started — only a dead prior owner of the
    // recycled pid can have written it
    val recycled = new File(root, s".t__fpbeef.tmp-${self.pid()}-7")
    recycled.mkdirs()
    assert(recycled.setLastModified(
      start.get.toEpochMilli - 3600L * 1000))
    Staging.publishOnce(root.toString, "t", 0xbeefL, "spec") { tmp =>
      java.nio.file.Files.write(new File(tmp, "data").toPath,
        "x".getBytes("UTF-8")): Unit
    }
    assert(!recycled.exists(),
      "recycled-pid remnant must be reclaimed, not leak forever")
  }

  test("unmarked same-name dir (crash in the rename->marker window) " +
      "is replaced, not a permanent wedge") {
    val root = freshRoot("unmarked")
    val stale = new File(root, "t__fp2a")
    stale.mkdirs()
    java.nio.file.Files.write(new File(stale, "data").toPath,
      "partial".getBytes("UTF-8"))
    val p = Staging.publishOnce(root.toString, "t", 0x2aL, "spec") { tmp =>
      java.nio.file.Files.write(new File(tmp, "data").toPath,
        "full".getBytes("UTF-8")): Unit
    }
    assert(slurp(new File(p, "data")) === "full")
    assert(new File(p, "_SUCCESS").isFile)
  }

  test("stale siblings of an OLDER fingerprint are deleted; the " +
      "published dir of the CURRENT fingerprint is never touched by " +
      "a later same-fingerprint call") {
    val root = freshRoot("siblings")
    val old = new File(root, "t__fp1")
    old.mkdirs()
    java.nio.file.Files.write(new File(old, "_SUCCESS").toPath,
      Array.empty[Byte])
    val p = Staging.publishOnce(root.toString, "t", 0x2L, "spec") { tmp =>
      java.nio.file.Files.write(new File(tmp, "data").toPath,
        "v2".getBytes("UTF-8")): Unit
    }
    assert(!old.exists(), "older-fingerprint sibling should be deleted")
    // the same call again: fast path, dir untouched (mtime unchanged
    // is hard to assert portably; content + marker suffice)
    val p2 = Staging.publishOnce(root.toString, "t", 0x2L, "spec") {
      _ => fail("write must not re-run on a published fingerprint")
    }
    assert(p === p2 && slurp(new File(p2, "data")) === "v2")
  }

  test("concurrent same-fingerprint publishers SERIALIZE: exactly one " +
      "write runs, both see the same complete publish, and no " +
      "publisher can delete the other's just-renamed dir") {
    val root = freshRoot("race")
    val writes = new java.util.concurrent.atomic.AtomicInteger(0)
    val started = new java.util.concurrent.CountDownLatch(2)
    def pub(): String =
      Staging.publishOnce(root.toString, "t", 0x7L, "spec") { tmp =>
        writes.incrementAndGet()
        // hold the critical section long enough that an unserialized
        // racer would interleave its delete/rename here
        Thread.sleep(150)
        java.nio.file.Files.write(new File(tmp, "data").toPath,
          s"by-${Thread.currentThread().getName}".getBytes("UTF-8")): Unit
      }
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = (1 to 2).map { _ =>
      Future { started.countDown(); started.await(); pub() }
    }
    val paths = fs.map(Await.result(_, 30.seconds))
    assert(paths.distinct.size === 1)
    assert(writes.get() === 1,
      "the second publisher must take the done.isFile fast path " +
        "inside the lock, not re-write")
    assert(new File(paths.head, "_SUCCESS").isFile)
    assert(slurp(new File(paths.head, "data")).startsWith("by-"))
  }
}
