package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** The bench record-path trap (three clobbers across two rounds): a
  * git-committed-clean BENCH_FULL.json at the default path must survive
  * any run that didn't explicitly ask to replace it.
  */
class BenchRecordGuardSpec extends AnyFunSuite {

  test("shouldWriteRecord: committed-clean default path needs an explicit opt-in") {
    // the driver's per-round run: default path, no flags, clean record → refuse
    assert(!Bench.shouldWriteRecord(explicitPath = false, overwriteFlag = false,
      recordCommittedClean = true))
    // deliberate refresh
    assert(Bench.shouldWriteRecord(explicitPath = false, overwriteFlag = true,
      recordCommittedClean = true))
    // caller redirected the record — their file, their rules
    assert(Bench.shouldWriteRecord(explicitPath = true, overwriteFlag = false,
      recordCommittedClean = true))
    // dirty/untracked record is not a committed measurement → writable
    assert(Bench.shouldWriteRecord(explicitPath = false, overwriteFlag = false,
      recordCommittedClean = false))
  }

  test("gitCommittedClean: tracked+unmodified true; modified, untracked, or no-git false") {
    def sh(dir: String, cmd: String*): Unit = {
      val p = new ProcessBuilder(cmd: _*).directory(new java.io.File(dir))
        .redirectErrorStream(true).start()
      val out = scala.io.Source.fromInputStream(p.getInputStream).mkString
      assert(p.waitFor() == 0, s"${cmd.mkString(" ")} failed: $out")
    }
    val repo = Files.createTempDirectory("benchguard").toString
    sh(repo, "git", "init", "-q")
    Files.write(Paths.get(repo, "record.json"), "{}".getBytes)
    assert(!Bench.gitCommittedClean(repo, "record.json"), "untracked file is not clean")
    sh(repo, "git", "add", "record.json")
    sh(repo, "git", "-c", "user.email=t@t", "-c", "user.name=t",
      "commit", "-q", "-m", "record")
    assert(Bench.gitCommittedClean(repo, "record.json"))
    Files.write(Paths.get(repo, "record.json"), """{"v":1}""".getBytes)
    assert(!Bench.gitCommittedClean(repo, "record.json"), "modified record is fair game")
    // no git repo at all → never blocks the write
    val bare = Files.createTempDirectory("benchguard_nogit").toString
    Files.write(Paths.get(bare, "record.json"), "{}".getBytes)
    assert(!Bench.gitCommittedClean(bare, "record.json"))
  }

  test("codeRev: short rev (optionally +dirty) from a repo, unknown otherwise") {
    assert(Bench.codeRev("/root/repo").matches("[0-9a-f]{7,}(\\+dirty)?|unknown"))
    assert(Bench.codeRev(Files.createTempDirectory("benchguard_rev").toString) == "unknown")
  }
}
