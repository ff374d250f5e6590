package graft.doc

/** Per-row view of all observations of a rollout (reference
  * row/AgentContext.scala:62-157): filters, selector ops over all docs, and
  * DFS save.
  */
final case class Trajectory(observations: Seq[Observation]) extends Serializable {

  def docs: Seq[Doc] = observations.collect { case d: Doc => d }

  def doc: Option[Doc] = docs.headOption

  def succeeded: Seq[Observation] = observations.filter(_.isSuccess)

  def failed: Seq[Observation] = observations.filterNot(_.isSuccess)

  def byName(name: String): Seq[Observation] =
    observations.filter(_ match {
      case d: Doc      => d.uid.name.contains(name)
      case n: NoDoc    => n.uid.name.contains(name)
      case e: DocError => e.uid.name.contains(name)
    })

  def isSuccess: Boolean = observations.nonEmpty && failed.isEmpty

  // -- ManyNodes-style selector ops over every doc's tree
  //    (reference: Trajectory *is* a ManyNodes)

  def findAll(selector: String): Seq[Node] = docs.flatMap(_.root.findAll(selector))

  def findFirst(selector: String): Option[Node] = findAll(selector).headOption

  def texts(selector: String): Seq[String] = findAll(selector).map(_.text)

  def text: String = docs.map(_.root.text).mkString("\n")

  /** Save every doc body under `dir` (reference AgentContext.scala:134-148);
    * returns written paths.
    */
  def save(dir: String, prefix: String = ""): Seq[String] =
    docs.map(d => graft.agent.DocIO.save(d, dir, prefix))
}

object Trajectory {
  val empty: Trajectory = Trajectory(Nil)
}
