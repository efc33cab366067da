package graft.sources

import java.io.IOException
import java.net.URI
import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpec
import graft.core.RetryPolicy
import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}

/** Local filesystem whose directory listings fail with IOException while
  * [[FlakyFs.failuresRemaining]] is positive — the injected-transient-fault
  * twin of a blob store's throttling/reset errors. Registered under the
  * `flaky://` scheme; paths resolve to the local filesystem.
  */
class FlakyFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("flaky:///")
  override def listStatus(f: Path): Array[FileStatus] = {
    if (FlakyFs.failuresRemaining.getAndDecrement() > 0)
      throw new IOException("injected transient listing failure")
    // plain FileStatus copies: RawLocalFileSystem's deprecated statuses
    // lazy-load permissions via `new File(uri)`, which rejects our scheme
    super.listStatus(f).map(s => new FileStatus(s.getLen, s.isDirectory, 1,
      s.getBlockSize, s.getModificationTime, s.getPath))
  }
}

object FlakyFs {
  val failuresRemaining = new AtomicInteger(0)
}

/** Listing retry (reference AzureBlobStorageReader.scala:70): transient
  * listing failures are retried by the default policy, observed first-try
  * by a disabled policy, and exhausted retries rethrow the failure.
  */
class ListingRetrySpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.flaky.impl", classOf[FlakyFs].getName)
    val d = java.nio.file.Files.createTempDirectory("flakysrc").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(s"$d/data")
    d
  }

  private def noSleep = RetryPolicy(sleeper = _ => ())

  test("blob listing survives injected transient failures under the retry policy") {
    FlakyFs.failuresRemaining.set(2)
    val (files, maxMod, _) =
      BlobListingSource.listNewFiles(spark, s"flaky://$dir/data", Long.MinValue,
        retry = noSleep)
    assert(files.nonEmpty && maxMod > Long.MinValue)
    assert(FlakyFs.failuresRemaining.get() <= 0, "the flaky listings were consumed")
  }

  test("a disabled policy observes the first listing failure") {
    FlakyFs.failuresRemaining.set(1)
    intercept[IOException] {
      BlobListingSource.listNewFiles(spark, s"flaky://$dir/data", Long.MinValue,
        retry = RetryPolicy.disabled)
    }
    FlakyFs.failuresRemaining.set(0)
  }

  test("exhausted attempts rethrow the terminal listing failure") {
    FlakyFs.failuresRemaining.set(100)
    intercept[IOException] {
      BlobListingSource.listNewFiles(spark, s"flaky://$dir/data", Long.MinValue,
        retry = noSleep.copy(maxAttempts = 2))
    }
    FlakyFs.failuresRemaining.set(0)
  }

  test("CDM batch-folder listing retries like the blob listing") {
    val root = java.nio.file.Files.createTempDirectory("flakycdm").toString
    new java.io.File(s"$root/2024-01-01T00.00.00Z").mkdirs()
    new java.io.File(s"$root/2024-01-02T00.00.00Z").mkdirs()
    FlakyFs.failuresRemaining.set(2)
    val folders = CdmSource.listBatchFolders(spark, s"flaky://$root",
      afterFolder = None, inProgress = None, retry = noSleep)
    assert(folders == Seq("2024-01-01T00.00.00Z", "2024-01-02T00.00.00Z"))
    assert(FlakyFs.failuresRemaining.get() <= 0)
  }
}
