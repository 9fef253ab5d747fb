package graft.kv

import scala.collection.mutable

/** Linearizability checking for concurrent KV clerk histories — the
  * reference's deepest test asset (the porcupine checker wired through
  * srv/kvtest/porcupine.go:85-139 against the model in
  * models/kv.go:28-82), re-implemented rather than translated: the
  * model's step function is cloned verbatim from models/kv.go, and the
  * search is the standard Wing & Gong / Lowe algorithm (the same one
  * the porcupine library implements) — linearize any minimal operation
  * whose output is legal in the current state, backtrack on dead ends,
  * memoize (linearized-set, state) pairs.
  *
  * Histories partition by key exactly as the reference model does
  * (models/kv.go:29-46): per-key sub-histories are checked
  * independently, which is sound because the store has no cross-key
  * operations.
  *
  * This is deliberately driver-side verification machinery, not a
  * dataflow operator: histories that need checking are test artifacts
  * (thousands of ops), while the DATA path — replaying an op-log at
  * scale — is [[KVStore.replay]]. KvGossipSpec closes the loop by
  * generating random concurrent histories with lost replies, replaying
  * their server-side logs through the distributed fold, and checking
  * the client-observed history linearizes.
  */
object Linearize {

  /** One client-observed operation. `isGet`=true models Get (value is
    * the value READ); false models Put(value, version). `call`/`ret`
    * bound the real-time interval; ops may overlap arbitrarily.
    * Err semantics follow rpc: "OK", "ErrVersion", "ErrNoKey", or
    * "ErrMaybe" (a retried put whose resend saw ErrVersion — the clerk
    * cannot know whether the original landed, srv/client.go:67-91).
    */
  final case class Op(
      isGet: Boolean,
      key: String,
      value: String,
      version: Long,
      outValue: String,
      err: String,
      call: Long,
      ret: Long)

  /** Single-key register state, as models/kv.go:48-52. */
  final case class State(value: String, version: Long)

  val Init: State = State("", 0L)

  /** The model step (models/kv.go:53-68): given a candidate
    * linearization state, which successor states are consistent with
    * the op's observed output? Deterministic per branch; ErrMaybe is
    * legal in BOTH the applied branch (the lost reply was an OK) and
    * the no-op branch (the put never matched), which is exactly the
    * ambiguity porcupine resolves by search. ErrNoKey is the server's
    * missing-key answer (srv/server.go:74-76): legal only against
    * version 0 with a nonzero attempted version.
    */
  def step(st: State, op: Op): List[State] =
    if (op.isGet) {
      // reference checks the read value; version rides along for debug
      if (op.outValue == st.value) List(st) else Nil
    } else {
      val applied =
        if (st.version == op.version && (op.err == "OK" || op.err == "ErrMaybe"))
          List(State(op.value, st.version + 1))
        else Nil
      val noop =
        if (st.version != op.version &&
          (op.err == "ErrVersion" || op.err == "ErrMaybe" ||
            (op.err == "ErrNoKey" && st.version == 0L && op.version != 0L)))
          List(st)
        else Nil
      applied ++ noop
    }

  /** Wing & Gong search over ONE key's operations. An op may linearize
    * first only if its invocation precedes every other pending op's
    * return (no completed op can be reordered after one that started
    * later). Memoizes visited (done-set, state) pairs — the standard
    * exponential-to-practical cut for low-concurrency histories.
    */
  private def checkKey(ops: IndexedSeq[Op]): Boolean = {
    val n = ops.length
    if (n == 0) return true
    val seen = mutable.HashSet.empty[(java.util.BitSet, State)]

    def search(done: java.util.BitSet, st: State): Boolean = {
      if (done.cardinality() == n) return true
      if (!seen.add((done.clone().asInstanceOf[java.util.BitSet], st)))
        return false
      var minRet = Long.MaxValue
      var i = 0
      while (i < n) {
        if (!done.get(i) && ops(i).ret < minRet) minRet = ops(i).ret
        i += 1
      }
      i = 0
      while (i < n) {
        if (!done.get(i) && ops(i).call < minRet) {
          val nexts = step(st, ops(i))
          if (nexts.nonEmpty) {
            done.set(i)
            val ok = nexts.exists(s2 => search(done, s2))
            done.clear(i)
            if (ok) return true
          }
        }
        i += 1
      }
      false
    }

    search(new java.util.BitSet(n), Init)
  }

  /** True iff the whole history is linearizable: every per-key
    * sub-history admits a legal total order consistent with real time
    * and the model's step function.
    */
  def linearizable(history: Seq[Op]): Boolean =
    history.groupBy(_.key).forall { case (_, ops) =>
      checkKey(ops.toIndexedSeq)
    }
}
