package graft.queries

import java.net.URI
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** A local filesystem that counts directory listings — the probe for
  * StagedIndex's listing discipline. Registered under the `counting`
  * scheme; all FileSystem.listFiles/listLocatedStatus traffic funnels
  * through listStatus in RawLocalFileSystem, so the counter sees
  * every recursive enumeration step. Statuses are returned fully
  * materialized (explicit permission) because the raw-local lazy
  * permission loader rejects non-`file` URI schemes.
  */
class CountingLocalFs extends RawLocalFileSystem {
  override def getScheme: String = "counting"
  override def getUri: URI = URI.create("counting:///")
  override def listStatus(p: Path): Array[FileStatus] = {
    CountingLocalFs.listings.incrementAndGet()
    super.listStatus(p).map { st =>
      new FileStatus(st.getLen, st.isDirectory, st.getReplication,
        st.getBlockSize, st.getModificationTime, st.getAccessTime,
        FsPermission.getDefault, "", "", st.getPath)
    }
  }
}

object CountingLocalFs {
  val listings = new AtomicLong(0L)
}

/** Pins the one-listing-per-input-per-session contract: content
  * tokens are memoized, so the Nth stage access against the same
  * input performs ZERO further driver-side FS listings. Un-memoized,
  * every one of the suite's thousands of stage accesses re-listed its
  * input recursively — O(files) and billed per call on an object
  * store at 100 TB.
  */
class ListingCountSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  test("content tokens are listed once per input per session") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.counting.impl", classOf[CountingLocalFs].getName)
    val stage = Files.createTempDirectory("lc_stage").toString
    spark.conf.set("graft.stage.dir", stage)
    try {
      val in = Files.createTempDirectory("lc_in").toString
      spark.range(5).toDF("x").write.parquet(s"$in/t.parquet")
      val cIn = s"counting://$in/t.parquet"

      def access(name: String): Long =
        StagedIndex.orStage(spark, name, in, Seq(cIn)) {
          spark.range(5).toDF("x")
        }.count()

      StagedIndex.refreshTokens()
      val before = CountingLocalFs.listings.get()
      assert(access("lc_a_v1") === 5L)
      val afterFirst = CountingLocalFs.listings.get()
      assert(afterFirst > before, "the first access must list the input")

      // further accesses — same stage again, and a DIFFERENT stage
      // over the same input — must not touch the input filesystem
      assert(access("lc_a_v1") === 5L)
      assert(access("lc_b_v1") === 5L)
      assert(CountingLocalFs.listings.get() === afterFirst,
        "memoized token: no further listings within the session")

      // explicit refresh drops the memo: the next access re-lists
      StagedIndex.refreshTokens()
      assert(access("lc_b_v1") === 5L)
      assert(CountingLocalFs.listings.get() > afterFirst)
    } finally spark.conf.unset("graft.stage.dir")
  }
}
