"""On-TPU CI smoke: the coverage pytest cannot give (VERDICT r4 weak #5).

The test suite runs on a virtual CPU mesh (tests/conftest.py), so Pallas
kernels are exercised only in interpret mode there and the serving daemon
only over CPU rows. This script compiles and RUNS the real-hardware legs
on the actual chip and exits non-zero on any failure — wire it into the
evidence sweep (run_r5_evidence.sh) so a compile-level regression on real
TPU is caught without waiting for a manual bench.

Legs:
  1. Pallas fused gather->pool kernel, REAL mode (not interpret):
     compile + run + numerics vs the XLA reference path.
  2. Pallas row-gather kernel, real mode, numerics vs jnp take.
  3. Host-index pipelined train smoke: 8 steps end-to-end on the chip
     through HostStepPipeline (the production loop shape).
  4. Serving daemon: start the HTTP server on the chip, one /predict
     round-trip, one dynamic-batching pair, clean shutdown.

Run: PYTHONPATH=/root/.axon_site:$PWD python benchmarks/tpu_ci_smoke.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def leg_pallas_fused():
    import jax
    import jax.numpy as jnp
    from deeprec_tpu.ops import pallas_fused_lookup as PF

    assert jax.devices()[0].platform != "cpu", "smoke must run on the chip"
    rng = np.random.default_rng(0)
    n_rows, dim, B, w = 4096, 128, 256, 8
    table = jnp.asarray(rng.normal(size=(n_rows, dim)).astype(np.float32))
    slots = jnp.asarray(rng.integers(0, n_rows, (B, w)).astype(np.int32))
    valid = jnp.asarray(rng.random((B, w)) < 0.8)
    out = PF.fused_pooled_lookup(table, slots, valid, combiner="sum")
    ref = jnp.sum(jnp.where(valid[..., None], table[slots], 0.0), axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    return {"rows": n_rows, "dim": dim}


def leg_pallas_gather():
    import jax.numpy as jnp
    from deeprec_tpu.ops import pallas_gather as PG

    rng = np.random.default_rng(1)
    n_rows, dim, n = 8192, 128, 1024
    table = jnp.asarray(rng.normal(size=(n_rows, dim)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n_rows, n).astype(np.int32))
    out = PG.gather_rows(table, idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(table[idx]),
                               rtol=0, atol=0)
    return {"rows": n_rows, "dim": dim}


def leg_pipelined_train():
    import jax
    import optax

    import deeprec_tpu as dr
    from deeprec_tpu import feature_column as fc
    from deeprec_tpu.data.criteo import CAT_NAMES, DENSE_NAMES, SyntheticCriteo
    from deeprec_tpu.host_index import HostIndexEmbeddingCollection
    from deeprec_tpu.models import ctr
    from deeprec_tpu.optim import sparse as sopt
    from deeprec_tpu.train.pipeline import HostStepPipeline
    from deeprec_tpu.train.trainer import Trainer

    B = 512
    numeric = [fc.NumericColumn(n, log_normalize=True) for n in DENSE_NAMES]
    cols = [fc.EmbeddingColumn(fc.CategoricalColumn(n), 8)
            for n in CAT_NAMES[:6]]
    coll = HostIndexEmbeddingCollection(
        cols, name="emb", capacity=1 << 14,
        initializer=dr.Initializer("normal", 0.05), max_unique=6 * B // 4)
    model = ctr.DLRM(emb_names=[c.name for c in cols], emb_dim=8,
                     bottom_units=(32,), top_units=(64, 32))
    tr = Trainer(model=model, numeric_columns=numeric,
                 collections={"emb": coll},
                 sparse_optimizers={"emb": sopt.sparse_adagrad(0.05)},
                 dense_optimizer=optax.adagrad(0.05))
    gen = SyntheticCriteo(batch_size=B, seed=5)
    batches = list(gen.take(8))
    state = tr.init(jax.random.key(0), batches[0])

    def resolve(b):
        return (fc.pack_dense(numeric, b),
                {"emb": coll.pack_ids_host(coll.pack_ids_np(b))},
                np.asarray(b["label"], np.float32))

    with HostStepPipeline(resolve, depth=2) as pipe:
        it = iter(batches)
        done, exhausted = 0, False
        while not exhausted or len(pipe):
            while not exhausted and len(pipe) < pipe.depth:
                try:
                    pipe.feed(next(it))
                except StopIteration:
                    exhausted = True
            if not len(pipe):
                break
            state = tr._jit_train(state, *pipe.take())
            done += 1
    from deeprec_tpu.train import metrics as M
    m = M.summarize(state.metrics)
    assert m["examples"] == 8 * B
    assert np.isfinite(m["loss"])
    return {"steps": done, "loss": round(m["loss"], 4)}


def leg_serving_daemon():
    import threading
    import urllib.request

    import jax
    import optax

    import deeprec_tpu as dr
    from deeprec_tpu import feature_column as fc
    from deeprec_tpu.checkpoint.saver import CheckpointManager
    from deeprec_tpu.data.criteo import SyntheticCriteo
    from deeprec_tpu.models import ctr
    from deeprec_tpu.optim import sparse as sopt
    from deeprec_tpu.serving.predictor import Predictor
    from deeprec_tpu.serving.server import make_server
    from deeprec_tpu.train.trainer import Trainer

    import tempfile
    ckpt = tempfile.mkdtemp(prefix="deeprec_smoke_ckpt_")
    numeric = [fc.NumericColumn("I1", log_normalize=True)]
    cols = [fc.EmbeddingColumn(fc.CategoricalColumn("C1"), 8)]
    coll = fc.EmbeddingCollection(cols, name="emb", capacity=1 << 12,
                                  initializer=dr.Initializer("normal", 0.05))
    model = ctr.DCN(emb_names=["C1"], cross_layers=1, deep_units=(16,))
    tr = Trainer(model=model, numeric_columns=numeric,
                 collections={"emb": coll},
                 sparse_optimizers={"emb": sopt.sparse_adagrad(0.05)},
                 dense_optimizer=optax.adagrad(0.05))
    gen = SyntheticCriteo(batch_size=128, seed=2, active_features=[0])
    b0 = next(iter(gen))
    batch = {"label": b0["label"], "I1": b0["I1"], "C1": b0["C1"]}
    state = tr.init(jax.random.key(0), batch)
    state = tr.train_step(state, batch)
    CheckpointManager(ckpt).save(tr, state)

    pred = Predictor(model, numeric, {"emb": coll}, ckpt)
    srv = make_server(pred, port=0, dynamic_batch_ms=2.0)
    import threading as _t
    _t.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]
    try:
        payload = json.dumps({"inputs": {
            "I1": [1.0, 2.0], "C1": [123, 456]}}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/predict", data=payload,
            headers={"Content-Type": "application/json"})
        t0 = time.perf_counter()
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        lat = (time.perf_counter() - t0) * 1e3
        assert len(out["predictions"]) == 2
        assert all(np.isfinite(p) for p in out["predictions"])

        # two concurrent requests through the dynamic batcher
        res = []

        def hit():
            with urllib.request.urlopen(req, timeout=120) as r:
                res.append(json.loads(r.read()))
        ts = [threading.Thread(target=hit) for _ in range(2)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        assert len(res) == 2
        return {"latency_ms": round(lat, 1)}
    finally:
        srv.shutdown()


def main():
    legs = [("pallas_fused_real", leg_pallas_fused),
            ("pallas_gather_real", leg_pallas_gather),
            ("pipelined_train", leg_pipelined_train),
            ("serving_daemon", leg_serving_daemon)]
    out = {}
    failed = []
    for name, fn in legs:
        t0 = time.perf_counter()
        try:
            info = fn() or {}
            info["secs"] = round(time.perf_counter() - t0, 1)
            out[name] = info
        except Exception as e:  # noqa: BLE001 — CI smoke reports ALL legs
            out[name] = {"error": f"{type(e).__name__}: {e}"}
            failed.append(name)
    print(json.dumps({"metric": "tpu_ci_smoke", "legs": out,
                      "failed": failed}))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
