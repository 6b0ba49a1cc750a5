package graft.jobs

import graft.core.{Emitter, MrJob}

/** U1+U2 — the bundled word-count workload (reference
  * `test/user_tasks.cc:12-33`): tokenize each line on the delimiter set
  * `" ,.\"'"` and emit `(word, "1")`; reduce sums the numeric values.
  *
  * Implements the *intended* semantics — all values are summed — not the
  * reference's shuffle-write value-corruption bug (SURVEY.md §2.5.1,
  * reference `src/mr_tasks.h:75-77` writes loop indices instead of values).
  */
object WordCount extends MrJob {
  // strtok(" ,.\"'") equivalence: any run of delimiters separates tokens,
  // leading/trailing runs yield no empty token.
  private val delims = "[ ,.\"']+"

  override def map(line: String, out: Emitter): Unit =
    line.split(delims).foreach(w => if (w.nonEmpty) out.emit(w, "1"))

  override def reduce(key: String, values: Iterator[String], out: Emitter): Unit = {
    var sum = 0L
    values.foreach(v => sum += v.toLong)
    out.emit(key, sum.toString)
  }
}
