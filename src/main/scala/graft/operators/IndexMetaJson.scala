package graft.operators

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode

/** The (maxNorm, centroids, radius, counts) meta.json block shared by
  * every persisted vector index — ONE encoder/decoder so IvfIndex's
  * and PqIndex's meta dialects cannot drift on the fields they share
  * (each adds its own scalars beside it: k/last_batch vs the PQ
  * codebook block). */
private[operators] object IndexMetaJson {

  def putCommon(root: ObjectNode, maxNorm: Double,
      centroids: Seq[Array[Double]], radius: Array[Double],
      counts: Array[Long]): Unit = {
    root.put("maxNorm", maxNorm)
    val cn = root.putArray("centroids")
    centroids.foreach { cc => val a = cn.addArray(); cc.foreach(a.add) }
    val rn = root.putArray("radius"); radius.foreach(rn.add)
    val mn = root.putArray("counts"); counts.foreach(mn.add)
    ()
  }

  def doubles(n: JsonNode): Array[Double] =
    (0 until n.size()).map(n.get(_).asDouble()).toArray

  def longs(n: JsonNode): Array[Long] =
    (0 until n.size()).map(n.get(_).asLong()).toArray

  def centroids(root: JsonNode): Seq[Array[Double]] = {
    val cn = root.get("centroids")
    (0 until cn.size()).map(i => doubles(cn.get(i)))
  }
}
