package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local session for specs (sf0.001 keeps them fast). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  val sfDir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = SparkSpec.session

  override def afterAll(): Unit = ()
}

object SparkSpec {
  lazy val session: SparkSession = GraftSession.local("graft-test", cores = "4", shufflePartitions = 4)
}
