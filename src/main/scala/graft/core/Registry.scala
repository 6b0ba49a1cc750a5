package graft.core

/** User-task registry — C9 in SURVEY.md §2.2.
  *
  * Equivalent of the reference's `TaskFactory` singleton
  * (reference `src/mr_task_factory.cc:30-88`): jobs register under a
  * `user_id`; duplicate registration is rejected (reference
  * `src/mr_task_factory.cc:77-78` returns false on duplicate insert);
  * lookup of an unknown id is an error the caller can handle (the reference
  * returns null, `src/mr_task_factory.cc:59-60`).
  */
object Registry {
  private val jobs = scala.collection.concurrent.TrieMap.empty[String, MrJob]

  /** Registers `job` under `userId`. Returns false (and leaves the existing
    * registration untouched) if the id is already taken.
    */
  def register(userId: String, job: MrJob): Boolean =
    jobs.putIfAbsent(userId, job).isEmpty

  def get(userId: String): Option[MrJob] = jobs.get(userId)

  def registered: Set[String] = jobs.keySet.toSet

  /** Test hook. */
  private[graft] def clear(): Unit = jobs.clear()
}
