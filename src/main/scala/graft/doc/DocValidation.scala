package graft.doc

/** Post-fetch document predicates (reference actions/Export.scala:32-130
  * `DocValidation`: Bypass / StatusCode2XX / HasTitle / HasHead). A failing
  * doc takes the error path (DocError + error dump) instead of flowing on.
  */
sealed trait DocValidation extends Serializable {
  def accept(obs: Observation): Boolean
}

object DocValidation {

  case object Bypass extends DocValidation {
    override def accept(obs: Observation): Boolean = true
  }

  case object StatusCode2XX extends DocValidation {
    override def accept(obs: Observation): Boolean = obs.isSuccess
  }

  case object HasTitle extends DocValidation {
    override def accept(obs: Observation): Boolean = obs match {
      case d: Doc => d.isSuccess && d.root.findAll("title").exists(_.text.nonEmpty)
      case _      => false
    }
  }

  case object HasHead extends DocValidation {
    override def accept(obs: Observation): Boolean = obs match {
      case d: Doc => d.isSuccess && d.root.findAll("head").nonEmpty
      case _      => false
    }
  }
}
