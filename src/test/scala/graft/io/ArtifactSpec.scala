package graft.io

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

/** The shared ensure protocol: fingerprint equality semantics and the
  * build lock (racing builders serialize; the loser reuses). */
class ArtifactSpec extends AnyFunSuite {

  test("ensure builds once, reuses on same fingerprint, rebuilds on change") {
    val dir = Files.createTempDirectory("art").toString
    val builds = new AtomicInteger(0)
    val fp1 = Artifact.fingerprintJson(10L, 42L, "k" -> "v")
    assert(Artifact.ensure(dir, "_sc.json", fp1) { builds.incrementAndGet() })
    assert(!Artifact.ensure(dir, "_sc.json", fp1) { builds.incrementAndGet() })
    assert(builds.get() == 1, "same fingerprint must not rebuild")
    // any changed component — count, hash, or a param — rebuilds
    assert(Artifact.ensure(dir, "_sc.json",
      Artifact.fingerprintJson(10L, 42L, "k" -> "w")) { builds.incrementAndGet() })
    assert(builds.get() == 2)
  }

  test("a crashed build (sidecar missing) is rebuilt on the next ensure") {
    val dir = Files.createTempDirectory("artcrash").toString
    val fp = Artifact.fingerprintJson(1L, 2L)
    intercept[RuntimeException] {
      Artifact.ensure(dir, "_sc.json", fp) { throw new RuntimeException("boom") }
    }
    assert(!Files.exists(java.nio.file.Paths.get(dir, "_sc.json")),
      "a failed build must not look complete")
    val built = Artifact.ensure(dir, "_sc.json", fp) { () }
    assert(built, "the next ensure must rebuild after a crash")
  }

  test("racing builders serialize under the dir lock; exactly one builds") {
    val dir = Files.createTempDirectory("artrace").toString
    val fp = Artifact.fingerprintJson(5L, 7L)
    val builds = new AtomicInteger(0)
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        Artifact.ensure(dir, "_sc.json", fp) {
          builds.incrementAndGet()
          Thread.sleep(50) // widen the race window
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(builds.get() == 1,
      s"exactly one racer must build; ${builds.get()} did")
  }
}
