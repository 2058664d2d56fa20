package graft

class RegistrySpec extends SparkSpec {

  test("registered query names are unique and snake_case") {
    val names = (SparkEntry.allDefs ++ SparkEntry.benchOnlyDefs).map(_.name)
    assert(names.distinct.size === names.size, "duplicate query names")
  }

  test("every scoreboard query carries an oracle") {
    // The zero-err scoreboard contract: approximate operators register an
    // engine-independent verdict (recall/error-bound floor) as their
    // primary entry; raw estimate dumps live in benchOnlyDefs instead.
    val unoracled = SparkEntry.allDefs.filter(_.oracle.isEmpty).map(_.name)
    assert(unoracled.isEmpty, s"unoracled scoreboard rows: $unoracled")
  }

  test("every registered query executes at sf0.001") {
    // The Verify/Bench harness is the only other thing that runs every
    // query; this catches a registered-but-broken query at `sbt test` time.
    val failures = (SparkEntry.allDefs ++ SparkEntry.benchOnlyDefs).flatMap { d =>
      try { d.run(spark, sf).count(); None }
      catch { case e: Throwable => Some(s"${d.name}: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
