"""Isolate the tunnel's transfer-vs-execution interaction.

Runs the SAME prepared-ahead dispatch loop (probe A) while interleaving
one dummy `jax.device_put` per step, varying the dummy's size and the
thread it runs on. If the added cost is size-independent, the tunnel is
paying a SYNC/flush per transfer-while-busy, not bandwidth.
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
    import optax

    import deeprec_tpu as dr
    from deeprec_tpu import feature_column as fc
    from deeprec_tpu.data.criteo import CAT_NAMES, DENSE_NAMES, SyntheticCriteo
    from deeprec_tpu.host_index import HostIndexEmbeddingCollection
    from deeprec_tpu.models import ctr
    from deeprec_tpu.optim import sparse as sopt
    from deeprec_tpu.train.trainer import Trainer

    numeric = [fc.NumericColumn(n, log_normalize=True) for n in DENSE_NAMES]
    emb_cols = [fc.EmbeddingColumn(fc.CategoricalColumn(n), 16)
                for n in CAT_NAMES]
    coll = HostIndexEmbeddingCollection(
        emb_cols, name="emb", capacity=1 << 21,
        initializer=dr.Initializer(kind="normal", scale=0.05),
        max_unique=len(CAT_NAMES) * args.batch // 6,
        fused_slot_columns=16, fused_slot_init=0.1)
    model = ctr.DLRM(emb_names=[c.name for c in emb_cols], emb_dim=16,
                     bottom_units=(512, 256), top_units=(1024, 1024, 512, 256))
    tr = Trainer(model=model, numeric_columns=numeric,
                 collections={"emb": coll},
                 sparse_optimizers={"emb": sopt.sparse_adagrad_fused(0.05)},
                 dense_optimizer=optax.adagrad(0.05))

    gen = SyntheticCriteo(batch_size=args.batch, seed=7)
    warm = 5
    n_total = args.steps + warm
    batches = list(gen.take(n_total))
    state = tr.init(jax.random.key(0), batches[0])
    pre = [(fc.pack_dense(numeric, b), coll.pack_ids_np(b),
            np.asarray(b["label"], np.float32)) for b in batches]
    hostargs = [(d, {"emb": coll.pack_ids_host(i)}, l) for d, i, l in pre]
    packed = [jax.device_put(h) for h in hostargs]
    for p in packed[:warm]:
        state = tr._jit_train(state, *p)
    float(state.metrics.count)

    out = {}

    def run(tag, per_step=None):
        nonlocal state
        t0 = time.perf_counter()
        for k, p in enumerate(packed[warm:]):
            if per_step is not None:
                per_step(k)
            state = tr._jit_train(state, *p)
        cnt = float(state.metrics.count)
        dt = (time.perf_counter() - t0) / args.steps
        out[tag] = round(dt * 1e3, 2)

    from concurrent.futures import ThreadPoolExecutor
    ex = ThreadPoolExecutor(1)
    sizes = {"1KB": 1 << 10, "64KB": 1 << 16, "720KB": 720_000}
    bufs = {k: np.zeros(v, np.uint8) for k, v in sizes.items()}
    keep = []

    run("baseline_dispatch_only")
    for tag, buf in bufs.items():
        def put(k, b=buf):
            keep.append(jax.device_put(b))
        run(f"mainthread_put_{tag}", put)
    for tag, buf in bufs.items():
        futs = []

        def put_bg(k, b=buf):
            futs.append(ex.submit(jax.device_put, b))
        run(f"bgthread_put_{tag}", put_bg)
        [f.result() for f in futs]
    run("baseline_again")

    # bg put of a PYTREE (3 arrays, one call), unconsumed
    tup = (np.zeros((4096, 13), np.float32), np.zeros(450_000, np.uint8),
           np.zeros(4096, np.float32))
    futs = []

    def put_tup(k):
        futs.append(ex.submit(jax.device_put, tup))
    run("bgthread_put_pytree", put_tup)
    [f.result() for f in futs]

    # bg put of the REAL next-step args (host copies), CONSUMED by the
    # next dispatch (this is exactly what HostStepPipeline does)
    futs2 = [ex.submit(jax.device_put, hostargs[warm])]

    def run_consume(tag):
        nonlocal state
        t0 = time.perf_counter()
        for k in range(warm, n_total):
            dev = futs2.pop(0).result()
            if k + 1 < n_total:
                futs2.append(ex.submit(jax.device_put, hostargs[k + 1]))
            state = tr._jit_train(state, *dev)
        float(state.metrics.count)
        dt = (time.perf_counter() - t0) / args.steps
        out[tag] = round(dt * 1e3, 2)

    run_consume("bgthread_put_consumed")

    # same, but the bg thread CONFIRMS the transfer (block_until_ready)
    # before handing the arrays to the dispatcher
    def put_ready(h):
        return jax.block_until_ready(jax.device_put(h))

    futs2.clear()
    futs2.append(ex.submit(put_ready, hostargs[warm]))

    def run_consume_ready(tag):
        nonlocal state
        t0 = time.perf_counter()
        for k in range(warm, n_total):
            dev = futs2.pop(0).result()
            if k + 1 < n_total:
                futs2.append(ex.submit(put_ready, hostargs[k + 1]))
            state = tr._jit_train(state, *dev)
        float(state.metrics.count)
        dt = (time.perf_counter() - t0) / args.steps
        out[tag] = round(dt * 1e3, 2)

    run_consume_ready("bgthread_put_ready_consumed")

    # depth-3 variant: more transfer slack ahead of the consumer
    futs3 = [ex.submit(put_ready, hostargs[warm + j]) for j in range(3)]

    def run_consume_d3(tag):
        nonlocal state
        t0 = time.perf_counter()
        for k in range(warm, n_total):
            dev = futs3.pop(0).result()
            if k + 3 < n_total:
                futs3.append(ex.submit(put_ready, hostargs[k + 3]))
            state = tr._jit_train(state, *dev)
        float(state.metrics.count)
        dt = (time.perf_counter() - t0) / args.steps
        out[tag] = round(dt * 1e3, 2)

    run_consume_d3("bgthread_put_ready_depth3")
    print(json.dumps({"metric": "tunnel_probe_ms_per_step", **out}))


if __name__ == "__main__":
    main()
