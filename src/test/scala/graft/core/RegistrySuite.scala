package graft.core

import org.scalatest.funsuite.AnyFunSuite

class RegistrySuite extends AnyFunSuite {

  private object NoopJob extends MrJob {
    def map(line: String, out: Emitter): Unit = ()
    def reduce(key: String, values: Iterator[String], out: Emitter): Unit = ()
  }

  test("C9: register + lookup; duplicate user_id rejected; unknown id absent") {
    Registry.clear()
    assert(Registry.register("job-a", NoopJob))
    // duplicate rejected, first registration stays (reference
    // src/mr_task_factory.cc:77-78)
    assert(!Registry.register("job-a", NoopJob))
    assert(Registry.get("job-a").contains(NoopJob))
    assert(Registry.get("nope").isEmpty)
    assert(Registry.registered == Set("job-a"))
    Registry.clear()
  }
}
