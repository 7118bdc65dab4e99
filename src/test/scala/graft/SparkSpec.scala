package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local session for specs (sf0.001 keeps them fast). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  val sfDir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = SparkSpec.session

  private val tmpDirs = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]

  /** spec-scoped tmp dir, deleted in afterAll — specs must not leave
    * fixture state behind in java.io.tmpdir across runs. */
  def tempDir(prefix: String): String = synchronized {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    tmpDirs += p
    p.toString
  }

  override def afterAll(): Unit = synchronized {
    tmpDirs.foreach { p =>
      try graft.util.Fixtures.deleteRecursively(p)
      catch { case _: Exception => () } // cleanup never fails a green suite
    }
    tmpDirs.clear()
  }
}

object SparkSpec {
  lazy val session: SparkSession = GraftSession.local("graft-test", cores = "4", shufflePartitions = 4)
}
