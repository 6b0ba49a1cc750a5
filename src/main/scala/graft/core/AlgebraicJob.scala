package graft.core

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** An algebraic MapReduce job: same map-side surface as [[MrJob]], but the
  * reduce is declared as a commutative/associative fold (zero/add/merge/
  * finish) instead of an opaque `(key, Iterator) => emits` function.
  *
  * Why it exists (SURVEY.md §7.3.1): an opaque reduce forces Spark to
  * shuffle EVERY emitted (key, value) pair to the reducer. An algebraic
  * reduce becomes a typed [[Aggregator]], which Spark executes with
  * map-side partial aggregation — each input partition shuffles one
  * accumulator per distinct key instead of one row per emit. For word
  * count at 100 TB that is the difference between shuffling ~10^13 "1"s
  * and shuffling |vocabulary| × |partitions| partial sums. The reference
  * only approximates this with its mapper-side buffer
  * (`src/mr_tasks.h:44,55-62`) — values are pre-grouped per mapper but
  * still all shipped.
  */
trait AlgebraicJob[B] extends Serializable {
  def map(line: String, out: Emitter): Unit
  def zero: B
  def add(acc: B, value: String): B
  def merge(a: B, b: B): B

  /** Renders the final accumulator as the output value for `key`. */
  def finish(key: String, acc: B): String

  /** Encoder for the accumulator type (shuffled as partial state). */
  def bufferEncoder: Encoder[B]
}

object AlgebraicJob {

  /** Bridges an [[AlgebraicJob]] reduce into a Spark typed [[Aggregator]]
    * over the mapped (key, value) pairs. `finish` needs the key, which an
    * Aggregator's reduction doesn't see — so the buffer carries it along:
    * every row in one group has the same key by construction.
    */
  def aggregator[B](job: AlgebraicJob[B]): Aggregator[(String, String), (String, B), String] =
    new Aggregator[(String, String), (String, B), String] {
      override def zero: (String, B) = (null, job.zero)
      override def reduce(acc: (String, B), row: (String, String)): (String, B) =
        (row._1, job.add(acc._2, row._2))
      override def merge(a: (String, B), b: (String, B)): (String, B) =
        (if (a._1 != null) a._1 else b._1, job.merge(a._2, b._2))
      override def finish(acc: (String, B)): String = job.finish(acc._1, acc._2)
      override def bufferEncoder: Encoder[(String, B)] =
        Encoders.tuple(Encoders.STRING, job.bufferEncoder)
      override def outputEncoder: Encoder[String] = Encoders.STRING
    }
}
