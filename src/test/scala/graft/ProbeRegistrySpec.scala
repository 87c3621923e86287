package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guard over PROBES.json, the machine-readable scale-probe registry
  * (VERDICT r16 item 7). The registry is maintained by
  * `tools/probes_merge.py` folding ScaleProbe's PROBES_LOG.jsonl; this
  * spec makes it impossible to (a) keep records for queries that no
  * longer exist, (b) declare a NEW query after the registry's last
  * probe wave without either probing it or exempting it with a reason,
  * or (c) carry a super-linear exponent silently (the ≥ 1.3 alarm
  * line every probe wave has stayed far under).
  */
class ProbeRegistrySpec extends AnyFunSuite {
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  private lazy val registry: Map[String, List[(Int, Double)]] = {
    val txt = java.nio.file.Files.readString(
      java.nio.file.Paths.get("/root/repo/PROBES.json"))
    JsonMethods.parse(txt) match {
      case JObject(fields) => fields.map { case (q, JArray(recs)) =>
        q -> recs.map { r =>
          val m = r.asInstanceOf[JObject].obj.toMap
          val f = m("factor") match {
            case JInt(i) => i.toInt
            case JDouble(d) => d.toInt
            case other => fail(s"$q factor: $other")
          }
          val e = m("exponent") match {
            case JDouble(d) => d
            case JInt(i) => i.toDouble
            case other => fail(s"$q exponent: $other")
          }
          (f, e)
        }
      }.toMap
      case other => fail(s"PROBES.json root: $other")
    }
  }

  private def qNum(name: String): Int =
    name.drop(1).takeWhile(_.isDigit).toInt

  /** New queries that legitimately ship without their own probe
    * record, each with the reason (the rowsOnlyWhy convention — a
    * stale entry here fails the spec below). Empty today.
    */
  private val probeExempt: Map[String, String] = Map.empty

  test("every registry key is a declared query") {
    val unknown = registry.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty,
      s"PROBES.json names undeclared queries: ${unknown.toSeq.sorted}")
  }

  test("every record has a sane factor and a sub-alarm exponent") {
    registry.foreach { case (q, recs) =>
      assert(recs.nonEmpty, s"$q: empty record list")
      recs.foreach { case (f, e) =>
        assert(f >= 10, s"$q: factor $f below the 10x convention")
        assert(e < 1.3,
          s"$q: exponent $e at factor $f crosses the 1.3 scale-alarm " +
            "line — fix the plan or document a superseding probe")
      }
    }
  }

  test("queries declared after the last probe wave are probed or exempted") {
    val lastWave = registry.keySet.map(qNum).max
    val stale = SparkEntry.queries.keySet
      .filter(q => qNum(q) > lastWave)
      .filterNot(registry.contains)
      .filterNot(probeExempt.contains)
    assert(stale.isEmpty,
      s"declared after the registry's last probe wave (q$lastWave) with " +
        s"no probe record and no exemption: ${stale.toSeq.sorted} — run " +
        "ScaleProbe + tools/probes_merge.py, or exempt with a reason")
  }

  test("exemptions never go stale") {
    val gone = probeExempt.keySet -- SparkEntry.queries.keySet
    assert(gone.isEmpty, s"probeExempt names undeclared queries: $gone")
    val probed = probeExempt.keySet.filter(registry.contains)
    assert(probed.isEmpty,
      s"now probed — drop the exemption: ${probed.toSeq.sorted}")
  }
}
