"""Modelzoo smoke: every trainer builds, runs steps, and evaluates via the
shared CLI (the cibuild/model-test.sh analog)."""
import importlib
import os
import sys

import pytest

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

from deeprec_tpu.train import cli

MODELS = ["WDL", "DLRM", "DCN", "DeepFM", "DSSM", "DIN", "DIEN"]


@pytest.mark.parametrize("name", MODELS)
def test_model_trains_two_steps(name):
    mod = importlib.import_module(f"modelzoo.{name}.train")
    args = cli.base_parser("t").parse_args([
        "--steps", "2", "--batch_size", "32", "--eval_steps", "1",
        "--capacity", "1024", "--emb_dim", "4", "--log_steps", "100",
        "--synthetic", "--synthetic_items", "500", "--synthetic_users", "50",
        "--prefetch_depth", "1", "--prefetch_workers", "1",
    ])
    # shrink towers for CPU-test speed
    spec = mod.build(args)
    out = cli.run(spec, args)
    assert out["steps"] == 2
    assert 0.0 < out["train_loss"] < 10.0
    assert out["model"] == name


@pytest.mark.parametrize("name", ["WDL", "DLRM", "DIN"])
def test_model_trains_host_index(name):
    """--host_index through the CLI: WDL (TWO collections -> two
    resolvers), DLRM (the bench shape), DIN (sequence + shared
    embeddings). Exercises the worker-pack/main-thread-resolve split and
    multi-step prefetch ordering."""
    mod = importlib.import_module(f"modelzoo.{name}.train")
    args = cli.base_parser("t").parse_args([
        "--steps", "4", "--batch_size", "32", "--eval_steps", "1",
        "--capacity", "1024", "--emb_dim", "4", "--log_steps", "100",
        "--host_index",
        "--synthetic", "--synthetic_items", "500", "--synthetic_users", "50",
        "--prefetch_depth", "2", "--prefetch_workers", "2",
    ])
    out = cli.run(mod.build(args), args)
    assert out["steps"] == 4
    assert 0.0 < out["train_loss"] < 10.0


@pytest.mark.parametrize("name", ["WDL", "DLRM"])
def test_model_trains_host_sharded(name):
    """--host_index --mesh: the host-sharded engine through the CLI
    (WDL = two host-sharded collections on one mesh)."""
    mod = importlib.import_module(f"modelzoo.{name}.train")
    args = cli.base_parser("t").parse_args([
        "--steps", "4", "--batch_size", "32", "--eval_steps", "1",
        "--capacity", "1024", "--emb_dim", "4", "--log_steps", "100",
        "--host_index", "--mesh", "4",
        "--synthetic", "--synthetic_items", "500", "--synthetic_users", "50",
        "--prefetch_depth", "2", "--prefetch_workers", "2",
    ])
    out = cli.run(mod.build(args), args)
    assert out["steps"] == 4
    assert 0.0 < out["train_loss"] < 10.0


@pytest.mark.parametrize("name", ["DLRM", "DIN", "DIEN"])
def test_model_trains_on_mesh(name):
    """--mesh runs every collection type through the sharded exchange:
    DLRM (width-1 columns -> column dedup), DIN/DIEN (sequence + shared
    embeddings -> flat-dedup fallback)."""
    mod = importlib.import_module(f"modelzoo.{name}.train")
    args = cli.base_parser("t").parse_args([
        "--steps", "2", "--batch_size", "32", "--eval_steps", "1",
        "--capacity", "1024", "--emb_dim", "4", "--log_steps", "100",
        "--mesh", "4",
        "--synthetic", "--synthetic_items", "500", "--synthetic_users", "50",
        "--prefetch_depth", "1", "--prefetch_workers", "1",
    ])
    out = cli.run(mod.build(args), args)
    assert out["steps"] == 2
    assert 0.0 < out["train_loss"] < 10.0


def test_micro_batch_flag():
    mod = importlib.import_module("modelzoo.DLRM.train")
    args = cli.base_parser("t").parse_args([
        "--steps", "2", "--batch_size", "32", "--eval_steps", "1",
        "--capacity", "1024", "--emb_dim", "4", "--micro_batch", "2",
        "--synthetic", "--prefetch_depth", "1", "--prefetch_workers", "1",
        "--log_steps", "100",
    ])
    out = cli.run(mod.build(args), args)
    assert out["steps"] == 2


def test_checkpoint_flag_roundtrip(tmp_path):
    mod = importlib.import_module("modelzoo.DCN.train")
    base = ["--steps", "2", "--batch_size", "32", "--eval_steps", "1",
            "--capacity", "1024", "--emb_dim", "4", "--synthetic",
            "--prefetch_depth", "1", "--prefetch_workers", "1",
            "--log_steps", "100", "--checkpoint", str(tmp_path)]
    args = cli.base_parser("t").parse_args(base)
    out1 = cli.run(mod.build(args), args)
    # second run restores and continues
    args2 = cli.base_parser("t").parse_args(base)
    out2 = cli.run(mod.build(args2), args2)
    assert out2["steps"] == out1["steps"] + 2


def test_tiered_storage_flags():
    """--ev_storage hbm_dram + --ev_hbm_capacity runs the TieredTrainer
    through the shared CLI: budget-pressure demotion sweeps move LRU rows
    to the host tier mid-run and the loop keeps training (the reference's
    modelzoo/features/pmem StorageOption workflow)."""
    from deeprec_tpu.utils.native import get_lib
    if get_lib() is None:
        pytest.skip("native toolchain unavailable")
    mod = importlib.import_module("modelzoo.DLRM.train")
    args = cli.base_parser("t").parse_args([
        "--steps", "30", "--batch_size", "64", "--eval_steps", "1",
        "--capacity", "2048", "--emb_dim", "4", "--log_steps", "10",
        "--ev_storage", "hbm_dram", "--ev_hbm_capacity", "64",
        "--demote_steps", "10",
        "--synthetic", "--prefetch_depth", "1", "--prefetch_workers", "1",
    ])
    out = cli.run(mod.build(args), args)
    assert out["steps"] == 30
    assert 0.0 < out["train_loss"] < 10.0


def test_tiered_storage_flags_on_mesh():
    """Same through TieredShardedTrainer (--mesh): per-shard budget
    demotion + owner-routed promotion under the staged pipeline."""
    from deeprec_tpu.utils.native import get_lib
    if get_lib() is None:
        pytest.skip("native toolchain unavailable")
    mod = importlib.import_module("modelzoo.DLRM.train")
    args = cli.base_parser("t").parse_args([
        "--steps", "30", "--batch_size", "64", "--eval_steps", "1",
        "--capacity", "2048", "--emb_dim", "4", "--log_steps", "10",
        "--mesh", "4",
        "--ev_storage", "hbm_dram", "--ev_hbm_capacity", "64",
        "--demote_steps", "10",
        "--synthetic", "--prefetch_depth", "1", "--prefetch_workers", "1",
    ])
    out = cli.run(mod.build(args), args)
    assert out["steps"] == 30
    assert 0.0 < out["train_loss"] < 10.0


def test_ssd_storage_flags(tmp_path):
    """--ev_storage hbm_dram_ssd with a tiny --ev_dram_budget: demoted
    rows overflow host DRAM and spill to the file-backed SSD arena, and
    the loop keeps training."""
    from deeprec_tpu.utils.native import get_lib
    if get_lib() is None:
        pytest.skip("native toolchain unavailable")
    mod = importlib.import_module("modelzoo.DLRM.train")
    ssd = str(tmp_path / "ev.arena")
    args = cli.base_parser("t").parse_args([
        "--steps", "30", "--batch_size", "64", "--eval_steps", "1",
        "--capacity", "2048", "--emb_dim", "4", "--log_steps", "10",
        "--ev_storage", "hbm_dram_ssd", "--ev_hbm_capacity", "64",
        "--ev_dram_budget", "128", "--ev_ssd_path", ssd,
        "--demote_steps", "10",
        "--synthetic", "--prefetch_depth", "1", "--prefetch_workers", "1",
    ])
    out = cli.run(mod.build(args), args)
    assert out["steps"] == 30
    assert 0.0 < out["train_loss"] < 10.0
    import os
    assert os.path.exists(ssd) and os.path.getsize(ssd) > 0
