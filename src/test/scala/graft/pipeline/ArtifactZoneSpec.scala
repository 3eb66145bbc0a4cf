package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Contract tests for the shared artifact-commit kernel (in this package
  * so the `private[pipeline]` surface is directly drivable).
  */
class ArtifactZoneSpec extends AnyFunSuite with SparkFixture {

  private def tmpSiblings(dir: java.io.File): Seq[String] = {
    val parent = dir.getParentFile
    if (parent == null || !parent.isDirectory) Seq.empty
    else parent.listFiles().toSeq.map(_.getName)
      .filter(_.startsWith(dir.getName + ".tmp-"))
  }

  test("a build that throws leaves neither the artifact nor tmp debris") {
    val dir = new java.io.File("target/artifactzone-spec/failing")
    org.apache.commons.io.FileUtils.deleteQuietly(dir.getParentFile)
    val source = new java.io.File(sf0001, "documents.parquet")
    val boom = intercept[IllegalStateException] {
      ArtifactZone.ensure(spark, dir.getPath, source) { tmp =>
        // simulate a build dying mid-write: partial output, then failure
        new java.io.File(tmp).mkdirs()
        java.nio.file.Files.write(
          new java.io.File(tmp, "part-partial").toPath, Array[Byte](1, 2, 3))
        throw new IllegalStateException("simulated build failure")
      }
    }
    assert(boom.getMessage.contains("simulated build failure"))
    assert(!dir.exists(), "no artifact dir may be committed from a failed build")
    assert(tmpSiblings(dir).isEmpty,
      "a failed build must clean up its partial tmp dir")
  }

  test("an algorithm-version bump invalidates the artifact; same version reuses") {
    val dir = new java.io.File("target/artifactzone-spec/versioned")
    org.apache.commons.io.FileUtils.deleteQuietly(dir.getParentFile)
    val source = new java.io.File(sf0001, "documents.parquet")
    import spark.implicits._
    var builds = 0
    def ensure(version: String) =
      ArtifactZone.ensure(spark, dir.getPath, source, version) { tmp =>
        builds += 1
        Seq(builds.toLong).toDF("v")
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmp)
      }
    ensure("algo-v1").count()
    ensure("algo-v1").count()
    assert(builds === 1, "an unchanged version must serve the committed artifact")
    // the source file is untouched, but the algorithm changed: must rebuild —
    // a source-only fingerprint would silently serve the v1 index against
    // v2 query-time computation
    ensure("algo-v2").count()
    assert(builds === 2, "a version bump must force a rebuild")
    ensure("algo-v2").count()
    assert(builds === 2)
  }

  test("a racing builder that loses the swap to a SAME-fingerprint winner " +
      "self-heals by reading the winner's commit (r13); a broken swap onto " +
      "a stale dir still throws") {
    val dir = new java.io.File("target/artifactzone-spec/raced")
    org.apache.commons.io.FileUtils.deleteQuietly(dir.getParentFile)
    val source = new java.io.File(sf0001, "documents.parquet")
    import spark.implicits._
    def build(marker: Long)(tmp: String): Unit =
      Seq(marker).toDF("v")
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmp)
    val prodRename = ArtifactZone.renameHook
    try {
      // hook: the loser's rename fails, and the WINNER's identical-
      // fingerprint commit appears at dir in the same instant — exactly
      // the cross-JVM race window (delete → concurrent commit → rename)
      ArtifactZone.renameHook = (_, dst) => {
        val winnerTmp = dst.getPath + ".winner"
        build(marker = 42L)(winnerTmp)
        java.nio.file.Files.write(
          new java.io.File(winnerTmp, "_GRAFT_SRC").toPath,
          RawZone.sourceFingerprint(source).getBytes("UTF-8"))
        new java.io.File(winnerTmp).renameTo(dst)
        false // this builder's own rename "failed"
      }
      val got = ArtifactZone.ensure(spark, dir.getPath, source)(build(7L))
      // the loser must serve the WINNER's rows, not throw, not its own
      assert(got.collect().map(_.getLong(0)).toSeq === Seq(42L))
      assert(tmpSiblings(dir).isEmpty, "the loser's tmp must be cleaned up")
    } finally ArtifactZone.renameHook = prodRename
    // broken-swap arm: rename fails and NO fresh winner exists → loud
    val dir2 = new java.io.File("target/artifactzone-spec/broken")
    try {
      ArtifactZone.renameHook = (_, _) => false
      val boom = intercept[IllegalStateException] {
        ArtifactZone.ensure(spark, dir2.getPath, source)(build(1L))
      }
      assert(boom.getMessage.contains("swap"))
      assert(tmpSiblings(dir2).isEmpty)
    } finally ArtifactZone.renameHook = prodRename
  }

  test("the fresher-winner race: a builder whose source changed mid-build " +
      "must NOT delete-and-replace a concurrent FRESHER commit (r14)") {
    // The r13 lose path only covered the same-fingerprint winner; the
    // delete-then-rename window could still drop a fresher commit when the
    // SOURCE changed mid-race: stale loser deletes the fresh winner's dir,
    // renames its own stale tmp in, and the zone serves wrong data with a
    // wrong fingerprint. Commit-time re-validation closes it: the loser
    // re-reads the source fingerprint before the delete, notices its build
    // is stale, discards it, and the retry finds the winner's fresh commit.
    val dir = new java.io.File("target/artifactzone-spec/fresher")
    org.apache.commons.io.FileUtils.deleteQuietly(dir.getParentFile)
    dir.getParentFile.mkdirs()
    // a mutable COPY of a fixture file stands in for a source that changes
    // mid-build (the real testdata is read-only)
    val source = new java.io.File(dir.getParentFile, "source.parquet")
    java.nio.file.Files.copy(
      new java.io.File(sf0001, "documents.parquet").toPath, source.toPath)
    import spark.implicits._
    var builds = 0
    val got = ArtifactZone.ensure(spark, dir.getPath, source) { tmp =>
      builds += 1
      Seq(7L).toDF("v") // the soon-to-be-stale loser artifact
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmp)
      if (builds == 1) {
        // mid-build: the source advances AND a racing builder of the fresh
        // source commits first (cross-JVM, so it bypasses this JVM's lock)
        assert(source.setLastModified(source.lastModified() + 5000))
        val winnerTmp = dir.getPath + ".winner"
        Seq(42L).toDF("v")
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(winnerTmp)
        java.nio.file.Files.write(
          new java.io.File(winnerTmp, "_GRAFT_SRC").toPath,
          RawZone.sourceFingerprint(source).getBytes("UTF-8"))
        assert(new java.io.File(winnerTmp).renameTo(dir))
      }
    }
    assert(got.collect().map(_.getLong(0)).toSeq === Seq(42L),
      "the fresher winner's commit must be served, never deleted by the stale loser")
    assert(builds === 1, "the retry must find the fresh commit, not rebuild")
    assert(tmpSiblings(dir).isEmpty, "the stale tmp must be discarded")
    assert(new String(java.nio.file.Files.readAllBytes(
        new java.io.File(dir, "_GRAFT_SRC").toPath), "UTF-8") ===
      RawZone.sourceFingerprint(source),
      "the committed fingerprint must match the CURRENT source")
  }

  test("a source that keeps changing across consecutive builds fails loudly " +
      "instead of committing a never-fresh artifact (r14)") {
    val dir = new java.io.File("target/artifactzone-spec/churning")
    org.apache.commons.io.FileUtils.deleteQuietly(dir.getParentFile)
    dir.getParentFile.mkdirs()
    val source = new java.io.File(dir.getParentFile, "churn.parquet")
    java.nio.file.Files.copy(
      new java.io.File(sf0001, "documents.parquet").toPath, source.toPath)
    import spark.implicits._
    var builds = 0
    val boom = intercept[IllegalStateException] {
      ArtifactZone.ensure(spark, dir.getPath, source) { tmp =>
        builds += 1
        Seq(builds.toLong).toDF("v")
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmp)
        // the source advances EVERY build — a broken deployment, not a race
        assert(source.setLastModified(source.lastModified() + 5000))
      }
    }
    assert(boom.getMessage.contains("changed fingerprint"))
    assert(builds === 3, "bounded retries: initial build + two re-attempts")
    assert(tmpSiblings(dir).isEmpty, "every discarded build must clean its tmp")
  }

  test("a failed build does not clobber the previously committed artifact") {
    val dir = new java.io.File("target/artifactzone-spec/stable")
    org.apache.commons.io.FileUtils.deleteQuietly(dir.getParentFile)
    val source = new java.io.File(sf0001, "documents.parquet")
    import spark.implicits._
    ArtifactZone.ensure(spark, dir.getPath, source) { tmp =>
      Seq(1L, 2L, 3L).toDF("v")
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmp)
    }
    // stale the fingerprint so the next ensure attempts a rebuild
    val fp = new java.io.File(dir, "_GRAFT_SRC")
    assert(fp.exists(), "the commit must have written a fingerprint")
    java.nio.file.Files.write(fp.toPath, "stale".getBytes("UTF-8"))
    intercept[RuntimeException] {
      ArtifactZone.ensure(spark, dir.getPath, source) { _ =>
        throw new RuntimeException("rebuild dies")
      }
    }
    assert(dir.exists() && new java.io.File(dir, "_SUCCESS").exists(),
      "the old committed artifact must survive a failed rebuild")
    assert(tmpSiblings(dir).isEmpty, "and no tmp debris may remain")
    // a subsequent successful rebuild then commits normally
    val again = ArtifactZone.ensure(spark, dir.getPath, source) { tmp =>
      Seq(9L).toDF("v")
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmp)
    }
    assert(again.count() === 1L)
  }
}
