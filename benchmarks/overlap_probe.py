"""Decompose the pipelined host-index step: which halves actually overlap?

Four measurements over the SAME jitted DLRM train step (B=4096):
  A. dispatch-only        — everything prepared ahead (the headline bench
                            methodology): pure device throughput.
  B. +transfer in-loop    — resolves prepared ahead; the 3 H2D transfers
                            run in-loop on a background thread, one step
                            ahead. A==B  => transfers overlap execution.
  C. +resolve in-loop     — the full HostStepPipeline (resolve thread +
                            transfer thread). B==C => resolve overlaps.
  D. serial in-loop       — resolve+transfer+dispatch on one thread (the
                            old --inline-resolve shape), as the floor.

Prints one JSON line with ms/step for each. Run on the real chip.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    import deeprec_tpu as dr
    from deeprec_tpu import feature_column as fc
    from deeprec_tpu.data.criteo import CAT_NAMES, DENSE_NAMES, SyntheticCriteo
    from deeprec_tpu.host_index import HostIndexEmbeddingCollection
    from deeprec_tpu.models import ctr
    from deeprec_tpu.optim import sparse as sopt
    from deeprec_tpu.train.pipeline import HostStepPipeline
    from deeprec_tpu.train.trainer import Trainer

    numeric = [fc.NumericColumn(n, log_normalize=True) for n in DENSE_NAMES]
    emb_cols = [fc.EmbeddingColumn(fc.CategoricalColumn(n), 16)
                for n in CAT_NAMES]

    def build():
        coll = HostIndexEmbeddingCollection(
            emb_cols, name="emb", capacity=1 << 21,
            initializer=dr.Initializer(kind="normal", scale=0.05),
            max_unique=len(CAT_NAMES) * args.batch // 6,
            fused_slot_columns=16, fused_slot_init=0.1)
        model = ctr.DLRM(emb_names=[c.name for c in emb_cols], emb_dim=16,
                         bottom_units=(512, 256),
                         top_units=(1024, 1024, 512, 256))
        tr = Trainer(model=model, numeric_columns=numeric,
                     collections={"emb": coll},
                     sparse_optimizers={"emb": sopt.sparse_adagrad_fused(0.05)},
                     dense_optimizer=optax.adagrad(0.05))
        return coll, tr

    gen = SyntheticCriteo(batch_size=args.batch, seed=7)
    warm = 5
    n_total = args.steps + warm
    batches = list(gen.take(n_total))
    out = {}

    def timed(tag, fn, tr, state):
        for _ in range(1):
            pass
        t0 = time.perf_counter()
        state = fn(state)
        assert float(state.metrics.count) == n_total * args.batch
        dt = (time.perf_counter() - t0) / args.steps
        out[tag] = round(dt * 1e3, 2)
        return state

    # fresh table per mode (keeps resolve/insert behavior identical)
    def pre_np(coll):
        return [(fc.pack_dense(numeric, b), coll.pack_ids_np(b),
                 np.asarray(b["label"], np.float32)) for b in batches]

    # --- A: dispatch-only ----------------------------------------------
    coll, tr = build()
    state = tr.init(jax.random.key(0), batches[0])
    pre = pre_np(coll)
    packedA = [jax.device_put((d, {"emb": coll.pack_ids_host(i)}, l))
               for d, i, l in pre]
    for p in packedA[:warm]:
        state = tr._jit_train(state, *p)
    float(state.metrics.count)

    def runA(state):
        for p in packedA[warm:]:
            state = tr._jit_train(state, *p)
        return state
    state = timed("A_dispatch_only", runA, tr, state)

    # --- B: transfers in-loop (background thread, 1 ahead) --------------
    coll, tr = build()
    state = tr.init(jax.random.key(0), batches[0])
    pre = pre_np(coll)
    resolved = [(d, {"emb": coll.pack_ids_host(i)}, l) for d, i, l in pre]
    pipe = HostStepPipeline(lambda x: x, depth=3)  # transfer stage only

    def runB(state, items):
        it = iter(items)
        exhausted = False
        while True:
            while not exhausted and len(pipe) < pipe.depth:
                try:
                    pipe.feed(next(it))
                except StopIteration:
                    exhausted = True
            if not len(pipe):
                return state
            state = tr._jit_train(state, *pipe.take())

    state = runB(state, resolved[:warm])
    float(state.metrics.count)
    state = timed("B_transfer_inloop", lambda s: runB(s, resolved[warm:]),
                  tr, state)
    pipe.close()

    # --- C: full pipeline (resolve + transfer in-loop) ------------------
    coll, tr = build()
    state = tr.init(jax.random.key(0), batches[0])
    pre = pre_np(coll)
    pipe = HostStepPipeline(
        lambda item: (item[0], {"emb": coll.pack_ids_host(item[1])}, item[2]),
        depth=3)

    def runC(state, items):
        it = iter(items)
        exhausted = False
        while True:
            while not exhausted and len(pipe) < pipe.depth:
                try:
                    pipe.feed(next(it))
                except StopIteration:
                    exhausted = True
            if not len(pipe):
                return state
            state = tr._jit_train(state, *pipe.take())

    state = runC(state, pre[:warm])
    float(state.metrics.count)
    state = timed("C_full_pipeline", lambda s: runC(s, pre[warm:]), tr, state)
    pipe.close()

    # --- D: fully serial in-loop ----------------------------------------
    coll, tr = build()
    state = tr.init(jax.random.key(0), batches[0])
    pre = pre_np(coll)

    def runD(state, items):
        for d, i, l in items:
            cats = {"emb": coll.pack_ids(i)}
            state = tr._jit_train(state, jnp.asarray(d), cats,
                                  jnp.asarray(l))
        return state

    state = runD(state, pre[:warm])
    float(state.metrics.count)
    state = timed("D_serial_inloop", lambda s: runD(s, pre[warm:]), tr, state)

    print(json.dumps({"metric": "overlap_probe_ms_per_step", **out,
                      "batch": args.batch, "steps": args.steps}))


if __name__ == "__main__":
    main()
