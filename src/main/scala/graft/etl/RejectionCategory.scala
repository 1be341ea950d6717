package graft.etl

/** Rejection taxonomy of the engine.
  *
  * Mirrors the reference semantics (gratum
  * `src/main/groovy/gratum/etl/RejectionCategory.groovy:9-17`): every row
  * that leaves the main flow is attributed to exactly one category and the
  * step that rejected it.
  */
sealed abstract class RejectionCategory(val name: String) {
  override def toString: String = name
}

object RejectionCategory {
  case object INVALID_FORMAT extends RejectionCategory("INVALID_FORMAT")
  case object MISSING_DATA extends RejectionCategory("MISSING_DATA")
  case object DUPLICATE extends RejectionCategory("DUPLICATE")
  case object REJECTION extends RejectionCategory("REJECTION")
  case object SCRIPT_ERROR extends RejectionCategory("SCRIPT_ERROR")
  case object RUNTIME_ERROR extends RejectionCategory("RUNTIME_ERROR")
  case object IGNORE_ROW extends RejectionCategory("IGNORE_ROW")

  val all: Seq[RejectionCategory] = Seq(
    INVALID_FORMAT, MISSING_DATA, DUPLICATE, REJECTION,
    SCRIPT_ERROR, RUNTIME_ERROR, IGNORE_ROW)

  def of(name: String): RejectionCategory =
    all.find(_.name == name).getOrElse(REJECTION)
}
