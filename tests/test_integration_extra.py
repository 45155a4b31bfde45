"""Cross-subsystem integration: CLI over real files + WorkQueue; sharded
incremental checkpoints."""
import importlib
import os
import sys

import numpy as np

import jax

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

from deeprec_tpu.train import cli


def write_criteo_file(path, rows=96, seed=0):
    rng = np.random.default_rng(seed)
    lines = []
    for r in range(rows):
        label = str(int(rng.random() < 0.3))
        dense = [str(int(x)) for x in rng.integers(0, 50, 13)]
        cats = [f"v{rng.integers(0, 30)}x{j}" for j in range(26)]
        lines.append("\t".join([label] + dense + cats))
    path.write_text("\n".join(lines) + "\n")


def test_cli_trains_from_files_via_workqueue(tmp_path):
    f1, f2 = tmp_path / "p0.tsv", tmp_path / "p1.tsv"
    write_criteo_file(f1, seed=1)
    write_criteo_file(f2, seed=2)
    mod = importlib.import_module("modelzoo.DLRM.train")
    args = cli.base_parser("t").parse_args([
        "--steps", "4", "--batch_size", "32", "--eval_steps", "1",
        "--capacity", "1024", "--emb_dim", "4", "--log_steps", "100",
        "--data_location", f"{f1},{f2}",
        "--workqueue", str(tmp_path / "wq"),
        "--summary_dir", str(tmp_path / "sum"),
        "--prefetch_depth", "1", "--prefetch_workers", "1",
    ])
    out = cli.run(mod.build(args), args)
    assert out["steps"] == 4
    # claims recorded; summary written
    assert os.listdir(tmp_path / "wq" / "claims")
    from deeprec_tpu.train.summary import read_events
    ev = read_events(str(tmp_path / "sum"))
    assert ev and ev[-1].get("phase") == "eval"


def test_sharded_incremental_checkpoint(tmp_path):
    """Incremental save/replay with a 4-device mesh, restored onto 2."""
    import optax
    import deeprec_tpu as dr
    from deeprec_tpu import feature_column as fc
    from deeprec_tpu.checkpoint import CheckpointManager
    from deeprec_tpu.data.criteo import CAT_NAMES, DENSE_NAMES, SyntheticCriteo
    from deeprec_tpu.models import ctr
    from deeprec_tpu.optim import sparse as sopt
    from deeprec_tpu.parallel.trainer import ShardedTrainer, make_mesh
    from deeprec_tpu.checkpoint.saver import table_snapshot_host

    def make(n):
        numeric = [fc.NumericColumn(x, log_normalize=True)
                   for x in DENSE_NAMES[:2]]
        cols = [fc.EmbeddingColumn(fc.CategoricalColumn(x), 8)
                for x in CAT_NAMES[:3]]
        coll = fc.EmbeddingCollection(
            cols, name="emb", capacity=512,
            initializer=dr.Initializer("normal", scale=0.05))
        model = ctr.DCN(emb_names=[c.name for c in cols], cross_layers=1,
                        deep_units=(16,))
        return ShardedTrainer(
            model=model, numeric_columns=numeric, collections={"emb": coll},
            sparse_optimizers={"emb": sopt.sparse_adagrad(0.05)},
            dense_optimizer=optax.adagrad(0.05), mesh=make_mesh(n))

    gen = SyntheticCriteo(batch_size=64, seed=3,
                          vocab_sizes=[40, 80, 160] + [9] * 23)
    bs = list(gen.take(8))
    tr = make(4)
    state = tr.init(jax.random.key(0), bs[0])
    mgr = CheckpointManager(str(tmp_path))
    for b in bs[:3]:
        state = tr.train_step(state, b)
    mgr.save(tr, state)
    for b in bs[3:6]:
        state = tr.train_step(state, b)
    p = mgr.save_incremental(tr, state)
    assert "incr-" in p

    tr2 = make(2)
    st2 = tr2.init(jax.random.key(1), bs[0])
    st2, ok = CheckpointManager(str(tmp_path)).restore(tr2, st2)
    assert ok and int(st2.step) == int(state.step)

    def snap(t, s):
        out = table_snapshot_host(t.collections["emb"].config,
                                  s.tables["emb"].ev, s.tables["emb"].slot,
                                  num_shards=t.S, evict=False)
        o = np.argsort(out["keys"])
        return out["keys"][o], out["values"][o]

    k1, v1 = snap(tr, state)
    k2, v2 = snap(tr2, st2)
    np.testing.assert_array_equal(k1, k2)
    np.testing.assert_allclose(v1, v2, atol=1e-6)
    st2 = tr2.train_step(st2, bs[6])  # restored mesh continues training
