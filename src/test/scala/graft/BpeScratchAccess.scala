package graft.text

/** Throwaway test-scope bridge to the package-private merge primitive. */
object BpeScratchAccess {
  def applyMerge(syms: Array[String], l: String, r: String): Array[String] =
    BpeTrainer.applyMerge(syms, l, r)
}
