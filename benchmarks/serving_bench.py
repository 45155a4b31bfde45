"""Serving latency/throughput microbenchmark: Predictor.predict on one
chip (the Triton-shim role). Prints one JSON line per batch size."""
import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="256,1024,4096")
    ap.add_argument("--capacity", type=int, default=1 << 18)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--tiered", type=int, default=0, metavar="BUDGET",
                    help="also bench TieredPredictor with this device row "
                         "budget (host-DRAM cold tail, per-request staging)")
    args = ap.parse_args()

    import numpy as np
    import jax
    import optax

    import deeprec_tpu as dr
    from deeprec_tpu import feature_column as fc
    from deeprec_tpu.checkpoint import CheckpointManager
    from deeprec_tpu.data.criteo import CAT_NAMES, DENSE_NAMES, SyntheticCriteo
    from deeprec_tpu.models import ctr
    from deeprec_tpu.optim import sparse as sopt
    from deeprec_tpu.serving import Predictor
    from deeprec_tpu.train.trainer import Trainer

    def parts():
        numeric = [fc.NumericColumn(n, log_normalize=True) for n in DENSE_NAMES]
        cols = [fc.EmbeddingColumn(fc.CategoricalColumn(n), 16)
                for n in CAT_NAMES]
        coll = fc.EmbeddingCollection(
            cols, name="emb", capacity=args.capacity,
            initializer=dr.Initializer("normal", scale=0.05))
        model = ctr.DLRM(emb_names=[c.name for c in cols], emb_dim=16,
                         bottom_units=(512, 256), top_units=(1024, 512))
        return numeric, coll, model

    ckdir = "/tmp/serving_bench_ckpt"
    shutil.rmtree(ckdir, ignore_errors=True)
    numeric, coll, model = parts()
    tr = Trainer(model, numeric, {"emb": coll},
                 {"emb": sopt.sparse_adagrad(0.05)}, optax.adagrad(0.05))
    gen = SyntheticCriteo(batch_size=2048, seed=7)
    state = tr.init(jax.random.key(0), next(gen))
    for b in gen.take(5):
        state = tr.train_step(state, b)
    CheckpointManager(ckdir).save(tr, state)

    n2, c2, m2 = parts()
    pred = Predictor(m2, n2, {"emb": c2}, ckdir)
    predictors = [("serving_latency_ms", pred)]
    if args.tiered:
        from deeprec_tpu.serving import TieredPredictor
        n3, c3, m3 = parts()
        predictors.append(("serving_tiered_latency_ms", TieredPredictor(
            m3, n3, {"emb": c3}, ckdir, device_row_budget=args.tiered)))
    for name, p_ in predictors:
        for bs in (int(x) for x in args.batches.split(",")):
            # cycle fresh batches so the tiered host-probe path does real
            # per-request work (datagen cost stays outside the timed loop)
            g = SyntheticCriteo(batch_size=bs, seed=9)
            pool = [next(g) for _ in range(8)]
            p = p_.predict(pool[0])  # compile
            t0 = time.perf_counter()
            for i in range(args.reps):
                p = p_.predict(pool[i % len(pool)])
            dt = (time.perf_counter() - t0) / args.reps
            print(json.dumps({
                "metric": name, "batch": bs,
                "value": round(dt * 1e3, 2), "unit": "ms",
                "throughput_per_sec": round(bs / dt)}))


if __name__ == "__main__":
    main()
