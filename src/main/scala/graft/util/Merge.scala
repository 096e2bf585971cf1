package graft.util

/** T8 — recursive dict deep-merge (reference `merge_dicts`,
  * `/root/reference/src/glue/jobs/s3_to_json.py:711-744`): right side wins on
  * conflict unless both values are maps, which merge recursively. Used for
  * structured-logging context in the reference; provided as a generic
  * utility.
  */
object Merge {
  def deepMerge(x: Map[String, Any], y: Map[String, Any]): Map[String, Any] =
    (x.keySet ++ y.keySet).map { k =>
      k -> ((x.get(k), y.get(k)) match {
        case (Some(a: Map[_, _]), Some(b: Map[_, _])) =>
          deepMerge(a.asInstanceOf[Map[String, Any]], b.asInstanceOf[Map[String, Any]])
        case (_, Some(b)) => b
        case (Some(a), None) => a
        case _ => throw new IllegalStateException("unreachable")
      })
    }.toMap
}
