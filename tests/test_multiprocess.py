"""Multi-process distributed validation: the grpc_testlib local-cluster
analog (reference core/distributed_runtime/rpc/grpc_testlib.h:43
MakeTestCluster spawns subprocess workers; master_test/grpc_session_test
drive them).

Here: 2 subprocess workers x 4 virtual CPU devices each join one
jax.distributed cluster (gloo collectives over DCN-equivalent TCP), run
the REAL ShardedTrainer over the 8-device global mesh on per-process batch
shards, save a multi-part checkpoint, and the test asserts step / metric /
table equality against an in-process single-controller run of the same
global stream — then restores the 2-process checkpoint into a
single-process trainer with a DIFFERENT shard count (reshard-on-restore)
and trains on.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from tests.mp_model import GLOBAL_BATCH, STEPS, global_batch, make_common

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn_cluster(tmp_path, nproc=2, dev_per=4, tiered=False, timeout=600):
    port = _free_port()
    ckpt = str(tmp_path / "ckpt")
    outs = [str(tmp_path / f"out{p}.json") for p in range(nproc)]
    procs = []
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = REPO
    for p in range(nproc):
        args = [sys.executable, WORKER, str(p), str(nproc), str(port),
                str(dev_per), ckpt, outs[p]] + (["--tiered"] if tiered else [])
        procs.append(subprocess.Popen(
            args, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=REPO))
    logs = []
    for p, proc in enumerate(procs):
        try:
            out, _ = proc.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out)
        assert proc.returncode == 0, f"worker {p} failed:\n{out[-4000:]}"
    return ckpt, [json.load(open(o)) for o in outs], logs


def _baseline():
    """Single-controller 8-device run of the same global stream."""
    from deeprec_tpu.parallel.trainer import ShardedTrainer, make_mesh
    from deeprec_tpu.train import metrics as M

    tr = ShardedTrainer(mesh=make_mesh(8), **make_common())
    state = tr.init(jax.random.key(0), global_batch(0))
    for i in range(STEPS):
        state = tr.train_step(state, global_batch(i))
    return tr, state, M.summarize(state.metrics)


def _snap(tr, state):
    from deeprec_tpu.checkpoint.saver import table_snapshot_host
    s = table_snapshot_host(tr.collections["emb"].config,
                            state.tables["emb"].ev, state.tables["emb"].slot,
                            num_shards=tr.S, evict=False)
    o = np.argsort(s["keys"])
    return {k: v[o] for k, v in s.items() if k not in ("cbf", "cbf_shards")}


@pytest.mark.slow
def test_two_process_cluster_matches_single_controller(tmp_path):
    ckpt, outs, logs = _spawn_cluster(tmp_path, nproc=2, dev_per=4)
    tr_b, st_b, m_b = _baseline()

    # step/metric equality: the 2-process run IS the same 8-device program
    for o in outs:
        assert o["step"] == STEPS
        assert o["count"] == STEPS * GLOBAL_BATCH
        assert abs(o["loss"] - m_b["loss"]) < 1e-5, (o, m_b)
        assert abs(o["auc"] - m_b["auc"]) < 1e-4
        assert o["health"]["dropped"] == 0

    # table equality: restore the multi-part checkpoint into a
    # single-process trainer with a DIFFERENT shard count (8 -> 4)
    from deeprec_tpu.checkpoint import CheckpointManager
    from deeprec_tpu.parallel.trainer import ShardedTrainer, make_mesh

    tr_r = ShardedTrainer(mesh=make_mesh(4), **make_common())
    st_r = tr_r.init(jax.random.key(0), global_batch(0))
    st_r, ok = CheckpointManager(ckpt).restore(tr_r, st_r)
    assert ok
    assert int(st_r.step) == STEPS

    sb, sr = _snap(tr_b, st_b), _snap(tr_r, st_r)
    np.testing.assert_array_equal(sb["keys"], sr["keys"])
    np.testing.assert_allclose(sb["values"], sr["values"], atol=1e-6)
    np.testing.assert_array_equal(sb["freqs"], sr["freqs"])
    np.testing.assert_array_equal(sb["versions"], sr["versions"])
    for k in sb:
        if k.startswith("slot__"):
            np.testing.assert_allclose(sb[k], sr[k], atol=1e-6)

    # ...and training continues from the restored state
    st_r = tr_r.train_step(st_r, global_batch(STEPS))
    assert np.isfinite(float(st_r.metrics.loss_sum))


@pytest.mark.slow
def test_two_process_tiered_cluster(tmp_path):
    """TieredShardedTrainer under 2 processes: per-process host tiers
    demote/promote against process-local shards; checkpoint still saves the
    HBM-resident rows per part."""
    ckpt, outs, logs = _spawn_cluster(tmp_path, nproc=2, dev_per=4,
                                      tiered=True)
    for o in outs:
        assert o["step"] == STEPS
        assert np.isfinite(o["loss"])
