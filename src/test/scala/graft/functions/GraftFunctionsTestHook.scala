package graft.functions

/** Test-only visibility bridge for the package-private md5 helpers,
  * so KernelProps can property-check them against the naive
  * hex-parse derivation.
  */
object GraftFunctionsTestHook {
  def high60(bytes: Array[Byte]): Long = GraftFunctions.md5High60(bytes)
  def high32(bytes: Array[Byte]): Long = GraftFunctions.md5High32(bytes)
}
