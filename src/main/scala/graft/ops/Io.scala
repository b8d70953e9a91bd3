package graft.ops

/** Shared local-filesystem helpers for operators that stage scratch
  * data under java.io.tmpdir (q117/q189/q193 round trips, multimodal
  * landing). One definition so deletion behavior (error handling,
  * symlink policy) has one place to change.
  */
private[graft] object Io {
  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
      .foreach(deleteRecursively)
    f.delete(): Unit
  }
}
