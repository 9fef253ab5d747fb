package graft

import graft.kv.KvOp

/** Discrete-event clerk/server simulation cloning the reference's
  * concurrency shape (srv/client.go:67-91): N clerks race Gets and CAS
  * Puts on 2 keys; a Put's reply is lost with p=0.35, driving the
  * clerk's resend loop — the duplicate lands in the op-log, and a
  * resend answered ErrVersion surfaces to the application as ErrMaybe.
  * Server slots are the linearization witness; client intervals span
  * first send to final reply, so retried ops overlap everything
  * processed in between.
  *
  * Shared by KvGossipSpec (porcupine check + batch replay) and
  * StreamingSpec (the same op-logs through the mapGroupsWithState
  * twin), so every replay surface faces identical histories.
  */
object KvSim {

  /** One simulated concurrent run: the client-observed history, the
    * server-side op-log (with duplicate sends from lost replies), and
    * the server's final cells + verdict counts as ground truth.
    */
  case class SimRun(
      history: List[graft.kv.Linearize.Op],
      oplog: List[KvOp],
      cells: Map[String, graft.kv.KvCell])

  def simulate(seed: Int): SimRun = {
    import graft.kv.Linearize.Op
    val rnd = new scala.util.Random(seed)
    val keys = Vector("a", "b")
    val nClients = 2 + rnd.nextInt(3)
    val value = scala.collection.mutable.Map.empty[String, String].withDefaultValue("")
    val version = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val nOk = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val nEv = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val nEnk = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val view = scala.collection.mutable.Map.empty[(Int, String), Long].withDefaultValue(0L)
    val oplog = scala.collection.mutable.ListBuffer.empty[KvOp]
    val history = scala.collection.mutable.ListBuffer.empty[Op]
    case class Pending(cli: Int, key: String, pv: String, attempt: Long, callT: Long, sends: Int)
    var pending = List.empty[Pending]
    val busy = scala.collection.mutable.Set.empty[Int]
    var t = 0L
    var issued = 0
    val target = 25 + rnd.nextInt(15)

    def serverPut(key: String, v: String, attempt: Long): String = {
      oplog += KvOp(key, v, attempt, t)
      if (attempt == version(key)) {
        value(key) = v; version(key) += 1; nOk(key) += 1; "OK"
      } else if (version(key) == 0L) { nEnk(key) += 1; "ErrNoKey" }
      else { nEv(key) += 1; "ErrVersion" }
    }

    while (issued < target || pending.nonEmpty) {
      t += 1
      assert(t < 10000, "simulation failed to terminate")
      val mustRetry = pending.nonEmpty &&
        (busy.size == nClients || issued >= target || rnd.nextDouble() < 0.45)
      if (mustRetry) {
        val idx = rnd.nextInt(pending.size)
        val p = pending(idx)
        pending = pending.patch(idx, Nil, 1)
        val verdict = serverPut(p.key, p.pv, p.attempt)
        // after 3 sends the reply always arrives (bounds the loop)
        if (verdict != "OK" && p.sends < 3 && rnd.nextDouble() < 0.25) {
          pending :+= p.copy(sends = p.sends + 1)
        } else {
          val obs = verdict match {
            case "OK" => "OK" // resend landed a version match
            case "ErrVersion" => "ErrMaybe" // the reference's ambiguity
            case other => other // ErrNoKey returns directly
          }
          history += Op(isGet = false, p.key, p.pv, p.attempt, "", obs,
            2 * p.callT - 1, 2 * t + 1)
          busy -= p.cli
          if (obs == "OK") view((p.cli, p.key)) = p.attempt + 1
        }
      } else {
        val free = (0 until nClients).filterNot(busy)
        val cli = free(rnd.nextInt(free.size))
        val key = keys(rnd.nextInt(keys.size))
        if (rnd.nextDouble() < 0.35) {
          history += Op(isGet = true, key, "", 0L, value(key), "OK",
            2 * t - 1, 2 * t + 1)
          view((cli, key)) = version(key)
        } else {
          issued += 1
          val attempt =
            if (rnd.nextDouble() < 0.7) view((cli, key)) else rnd.nextInt(4).toLong
          val pv = s"c$cli-t$t"
          val verdict = serverPut(key, pv, attempt)
          if (rnd.nextDouble() < 0.35) { // reply lost: clerk will resend
            pending :+= Pending(cli, key, pv, attempt, t, 1)
            busy += cli
          } else {
            history += Op(isGet = false, key, pv, attempt, "", verdict,
              2 * t - 1, 2 * t + 1)
            if (verdict == "OK") view((cli, key)) = attempt + 1
          }
        }
      }
    }
    val cells = keys.map { k =>
      k -> graft.kv.KvCell(k, value(k), version(k), nOk(k), nEv(k), nEnk(k))
    }.toMap
    SimRun(history.toList, oplog.toList, cells)
  }
}
