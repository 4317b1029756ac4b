package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the master-resolution contract for the entry-point mains: a
  * spark-submit-provided `spark.master` (sys-prop) must WIN over the
  * local default, otherwise `--master spark://...` submissions silently
  * run local-mode inside the client container (the r6 compose bug). */
class ConfMasterSpec extends AnyFunSuite {

  test("a pre-set spark.master sys-prop wins over the local default") {
    val prev = sys.props.get("spark.master")
    try {
      sys.props("spark.master") = "spark://example-master:7077"
      assert(Conf.master("8") == "spark://example-master:7077")
    } finally prev match {
      case Some(v) => sys.props("spark.master") = v
      case None => sys.props -= "spark.master"
    }
  }

  test("with no master configured anywhere, falls back to local[cpus]") {
    val prev = sys.props.get("spark.master")
    try {
      sys.props -= "spark.master"
      // SPARK_MASTER_URL is absent in the test env; if a CI ever sets
      // it, that IS the configured master and the fallback is moot.
      if (!sys.env.contains("SPARK_MASTER_URL"))
        assert(Conf.master("6") == "local[6]")
    } finally prev.foreach(v => sys.props("spark.master") = v)
  }
}
