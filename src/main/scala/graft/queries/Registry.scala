package graft.queries

/** All registered engine capabilities. SparkEntry derives `queries` /
  * `oracleSql` from this single list so a spec can never be half-wired.
  */
object Registry {
  def all: Seq[QuerySpec] =
    Relational.specs ++ LakeOps.specs ++ TextOps.specs ++ VectorOps.specs ++
      ExtendedOps.specs ++ CurationOps.specs ++ TimeSeriesOps.specs

  def byName(name: String): QuerySpec =
    all.find(_.name == name).getOrElse(sys.error(s"unknown query: $name"))
}
