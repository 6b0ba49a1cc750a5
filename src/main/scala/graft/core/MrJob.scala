package graft.core

import scala.collection.mutable.ArrayBuffer

/** Push-style emit hook, preserving the reference's user-facing API shape
  * (`BaseMapperInternal::emit` / `BaseReducerInternal::emit`, reference
  * `src/mr_tasks.h:55-62,112-115`): user code calls `emit(key, value)` any
  * number of times per input.
  */
trait Emitter extends Serializable {
  def emit(key: String, value: String): Unit
}

/** A user MapReduce job — the Spark-native equivalent of the reference's
  * `BaseMapper`/`BaseReducer` pair (reference
  * `external/include/mr_task_factory.h:14-48`).
  *
  * `map` is invoked once per input line (F5); `reduce` once per distinct key
  * with the iterator of all values for that key (F10). Both communicate
  * results through the push-style [[Emitter]]. Implementations must be
  * serializable (they ship to executors inside task closures — the Spark
  * analog of the reference's fresh-instance-per-task factory,
  * `src/mr_task_factory.cc:81-88`, which is what makes speculative duplicate
  * execution safe).
  *
  * NOTE: as in Hadoop, the `values` iterator passed to `reduce` is only valid
  * during that call — consume it before returning.
  */
trait MrJob extends Serializable {
  def map(line: String, out: Emitter): Unit
  def reduce(key: String, values: Iterator[String], out: Emitter): Unit
}

/** Buffering emitter used by the engine to adapt push-style user code to
  * Spark's pull-style (iterator-returning) flatMap/mapPartitions operators.
  */
final class BufferingEmitter extends Emitter {
  private val buf = new ArrayBuffer[(String, String)]()
  override def emit(key: String, value: String): Unit = buf += ((key, value))
  def drain(): Seq[(String, String)] = {
    val out = buf.toVector
    buf.clear()
    out
  }
}
