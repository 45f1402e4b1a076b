package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for specs. Fixed shuffle partitions (not
  * core-count-dependent) so results are parallelism-invariant.
  */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_TEST_MASTER", "local[4]"))
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkTestSession.spark
  def sfDir: String = "/root/testdata/sf0.001"

  /** Deterministic ScalaCheck sampling: run `f` on `n` draws from
    * `gen`, seeded per suite so failures replay exactly.
    */
  protected def sample[A](gen: org.scalacheck.Gen[A], n: Int,
                          seedValue: Long = 42L)(f: A => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(seedValue)
    (0 until n).foreach { _ =>
      gen.apply(org.scalacheck.Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
    }
  }
}
