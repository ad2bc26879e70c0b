package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession fixture for all specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  val sfDir = "/root/testdata/sf0.001"
}

object SparkSpec {
  // local[16] (capped by the box) instead of the historical local[4]:
  // the suite is Spark-bound and sequential, so idle cores are pure
  // wall-clock; 16 (not all 32) keeps 456 tests' allocation pressure
  // inside the shared 8g heap (the r16 full-sweep lesson: 32 threads
  // in a tight heap GC-thrash). shuffle.partitions stays 4 — test
  // frames are tiny and more reduce tasks is pure scheduler overhead.
  lazy val session: SparkSession = SparkSession.builder()
    .master(s"local[${math.min(16, Runtime.getRuntime.availableProcessors())}]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
