"""Model-fidelity: Dice running statistics (eval independent of batch
composition) and DIEN's shared auxiliary net."""
import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

import deeprec_tpu as dr
from deeprec_tpu import feature_column as fc
from deeprec_tpu.models.layers import Dice


def test_dice_eval_uses_running_stats():
    d = Dice()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(32, 4)), jnp.float32)
    variables = d.init(jax.random.key(0), x, train=True)
    assert "batch_stats" in variables
    # train for a few passes to move the running stats
    for i in range(10):
        xi = jnp.asarray(
            np.random.default_rng(i).normal(2.0, 3.0, size=(32, 4)), jnp.float32)
        _, upd = d.apply(variables, xi, train=True, mutable=["batch_stats"])
        variables = {**variables, **upd}
    m = np.asarray(variables["batch_stats"]["mean"])
    assert np.all(m > 0.1), m  # stats moved toward the stream mean (2.0)

    # EVAL: output for one row must not depend on what else is in the batch
    row = jnp.asarray(np.random.default_rng(99).normal(size=(1, 4)), jnp.float32)
    alone = d.apply(variables, row, train=False)
    crowd = jnp.concatenate([row, jnp.full((31, 4), 50.0)], axis=0)
    together = d.apply(variables, crowd, train=False)[:1]
    np.testing.assert_allclose(np.asarray(alone), np.asarray(together),
                               rtol=1e-6)


def test_dice_running_stats_update_through_trainer():
    """The Trainer threads the batch_stats collection: running stats move
    during training and the eval step reads them (no mutation)."""
    from deeprec_tpu.models import ctr
    from deeprec_tpu.optim import sparse as sopt
    from deeprec_tpu.train.trainer import Trainer

    class DiceModel(ctr.DCN):
        pass

    # DIN uses Dice; build the real DIN path via the sequence model instead
    from deeprec_tpu.models.sequence import DIN

    cols = [fc.EmbeddingColumn(fc.CategoricalColumn("item"), 8),
            fc.SequenceEmbeddingColumn(
                fc.CategoricalColumn("hist", max_length=8), 8)]
    coll = fc.EmbeddingCollection(cols, name="emb", capacity=512,
                                  initializer=dr.Initializer("normal", scale=0.1))
    model = DIN(candidate_name="item", seq_name="hist")
    tr = Trainer(model, [], {"emb": coll}, {"emb": sopt.sparse_adagrad(0.1)},
                 optax.adagrad(0.05))
    rng = np.random.default_rng(0)

    def batch(bs=16):
        return {"item": rng.integers(0, 50, bs).astype(np.int64),
                "hist": rng.integers(0, 50, (bs, 8)).astype(np.int64),
                "label": rng.integers(0, 2, bs).astype(np.float32)}

    state = tr.init(jax.random.key(0), batch())
    assert "batch_stats" in state.params
    before = np.asarray(
        jax.tree_util.tree_leaves(state.params["batch_stats"])[0]).copy()
    for _ in range(5):
        state = tr.train_step(state, batch())
    after = np.asarray(
        jax.tree_util.tree_leaves(state.params["batch_stats"])[0])
    assert not np.allclose(before, after)  # EMA moved
    # eval runs with frozen stats
    m = tr.eval_step(state, tr.reset_metrics(state).metrics, batch())
    assert np.isfinite(float(m.loss_sum))


def test_dien_aux_net_is_shared():
    """One projection scores positive and negative aux pairs (the
    reference's single auxiliary_net, modelzoo/DIEN/script/model.py)."""
    from deeprec_tpu.models.sequence import DIEN

    model = DIEN(candidate_name="item", seq_name="hist")
    B, L, d = 4, 6, 8
    emb = {"item": jnp.zeros((B, d))}
    seq = {"hist": (jnp.zeros((B, L, d)), jnp.ones((B, L)))}
    variables = model.init(jax.random.key(0), None, emb, seq=seq,
                           train=True, return_aux=True)
    flat = variables["params"]
    assert "aux_proj" in flat
    assert "aux_proj_n" not in flat


def test_din_attends_over_item_cate_concat():
    """Reference DIN scores concat(item, cate) against per-position
    concat(hist_item, hist_cate) (model.py:36-43 item_eb/item_his_eb);
    with seq_context_names the history categories must change the logits
    (they were previously mean-pooled context only, and DIEN dropped
    them entirely)."""
    from deeprec_tpu.models.sequence import DIN

    m = DIN(candidate_name="item", seq_name="hist_item",
            candidate_context_names=["cate"],
            seq_context_names=["hist_cate"], context_names=["uid"],
            hidden_units=(16,), att_units=(8,))
    B, L, d = 4, 6, 8
    rng = np.random.default_rng(0)
    emb = {"item": jnp.asarray(rng.normal(size=(B, d)), jnp.float32),
           "cate": jnp.asarray(rng.normal(size=(B, d)), jnp.float32),
           "uid": jnp.asarray(rng.normal(size=(B, d)), jnp.float32)}
    mask = jnp.asarray(np.arange(L)[None, :] < np.array([3, 6, 4, 5])[:, None])
    hi = jnp.asarray(rng.normal(size=(B, L, d)), jnp.float32)
    hc = jnp.asarray(rng.normal(size=(B, L, d)), jnp.float32)
    seq = {"hist_item": (hi, mask), "hist_cate": (hc, mask)}
    params = m.init(jax.random.key(0), None, emb, seq, train=False)
    out = m.apply(params, None, emb, seq, train=False)
    assert out.shape == (B,)
    # history categories are consumed per-position: permuting them inside
    # the valid region changes the logits
    hc2 = jnp.concatenate([hc[:, 1:2], hc[:, 0:1], hc[:, 2:]], axis=1)
    out2 = m.apply(params, None, emb,
                   {"hist_item": (hi, mask), "hist_cate": (hc2, mask)},
                   train=False)
    assert not np.allclose(np.asarray(out), np.asarray(out2))
    # ...but permuting PADDED positions does not
    hc3 = hc.at[:, L - 1].set(rng.normal(size=(B, d)))
    m0 = jnp.asarray(np.arange(L)[None, :] < np.full((B,), L - 1)[:, None])
    a = m.apply(params, None, emb, {"hist_item": (hi, m0), "hist_cate": (hc, m0)}, train=False)
    b = m.apply(params, None, emb, {"hist_item": (hi, m0), "hist_cate": (hc3, m0)}, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_modelzoo_din_dien_share_cate_space():
    """Candidate cate and hist_cate join ONE embedding group in both
    sequence modelzoo trainers (reference shared_embedding_columns)."""
    import importlib.util as iu

    for name in ("DIN", "DIEN"):
        spec = iu.spec_from_file_location(
            f"mz_{name}", f"modelzoo/{name}/train.py")
        mod = iu.module_from_spec(spec)
        spec.loader.exec_module(mod)
        p = mod.cli.base_parser("t")
        p.set_defaults(optimizer="adam")
        args = p.parse_args([])
        ms = mod.build(args)
        coll = ms.collections["emb"]
        groups = {c.categorical.name:
                  (c.categorical.shared_embedding or c.categorical.name)
                  for c in coll.columns}
        assert groups["cate"] == groups["hist_cate"], (name, groups)
        assert groups["item"] == groups["hist_item"], (name, groups)
