"""CTR model zoo: WDL, DLRM, DCN-v2, DeepFM, DSSM.

Rebuilds of the reference modelzoo trainers' model classes
(modelzoo/WDL/train.py:182 class WDL, modelzoo/DLRM/train.py,
modelzoo/DeepFM/train.py, modelzoo/DSSM/train.py) as flax modules over the
feature-column outputs. The sparse side (EmbeddingCollections) lives
outside the module — models consume:

  * ``dense``: [B, Dd] float features
  * ``emb``:   dict name -> [B, d] pooled embeddings
  * ``wide``:  optional dict name -> [B, 1] wide (dim-1) embeddings

and emit logits [B] (pre-sigmoid).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import CrossNetV2, DotInteraction, FMInteraction, MLPTower


def stack_emb(emb: Dict[str, jax.Array], names: Sequence[str]) -> jax.Array:
    """[B, F, d] in a fixed feature order."""
    return jnp.stack([emb[n] for n in names], axis=1)


def concat_emb(emb: Dict[str, jax.Array], names: Sequence[str]) -> jax.Array:
    return jnp.concatenate([emb[n] for n in names], axis=-1)


class WDL(nn.Module):
    """Wide & Deep (modelzoo/WDL/train.py:182): deep MLP over
    [dense, embeddings]; wide = sum of dim-1 per-feature weights (trained
    with FTRL on the sparse side)."""

    emb_names: Sequence[str]
    wide_names: Sequence[str]
    deep_units: Sequence[int] = (1024, 512, 256)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, dense, emb, wide=None, train=True):
        deep_in = jnp.concatenate([dense, concat_emb(emb, self.emb_names)], axis=-1)
        deep = MLPTower(self.deep_units, final_units=1,
                        compute_dtype=self.compute_dtype)(deep_in)[:, 0]
        wide_logit = 0.0
        if wide is not None and self.wide_names:
            wide_logit = sum(wide[n][:, 0] for n in self.wide_names)
            wide_logit = wide_logit + self.param("wide_bias", nn.initializers.zeros, ())
        return deep + wide_logit


class DLRM(nn.Module):
    """DLRM (modelzoo/DLRM/train.py): bottom MLP on dense -> d, pairwise dot
    interaction over [dense_vec] + embeddings, top MLP."""

    emb_names: Sequence[str]
    emb_dim: int
    bottom_units: Sequence[int] = (512, 256)
    top_units: Sequence[int] = (1024, 1024, 512, 256)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, dense, emb, wide=None, train=True):
        bottom = MLPTower(self.bottom_units, final_units=self.emb_dim,
                          compute_dtype=self.compute_dtype)(dense)
        feats = jnp.concatenate(
            [bottom[:, None, :], stack_emb(emb, self.emb_names)], axis=1)
        inter = DotInteraction()(feats)
        top_in = jnp.concatenate([bottom, inter], axis=-1)
        return MLPTower(self.top_units, final_units=1,
                        compute_dtype=self.compute_dtype)(top_in)[:, 0]


class DCN(nn.Module):
    """DCN-v2: cross network + deep tower in parallel over
    x0 = [dense, embeddings] (the BASELINE.json flagship config)."""

    emb_names: Sequence[str]
    cross_layers: int = 3
    low_rank: Optional[int] = None
    deep_units: Sequence[int] = (1024, 512, 256)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, dense, emb, wide=None, train=True):
        x0 = jnp.concatenate([dense, concat_emb(emb, self.emb_names)], axis=-1)
        cross = CrossNetV2(self.cross_layers, self.low_rank,
                           compute_dtype=self.compute_dtype)(x0)
        deep = MLPTower(self.deep_units, compute_dtype=self.compute_dtype)(x0)
        both = jnp.concatenate([cross, deep], axis=-1)
        return nn.Dense(1, name="head")(both)[:, 0]


class DeepFM(nn.Module):
    """DeepFM (modelzoo/DeepFM/train.py): first-order wide + second-order FM
    over the embedding stack + deep MLP, summed into one logit."""

    emb_names: Sequence[str]
    wide_names: Sequence[str]
    deep_units: Sequence[int] = (400, 400, 400)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, dense, emb, wide=None, train=True):
        feats = stack_emb(emb, self.emb_names)
        fm = FMInteraction()(feats)[:, 0]
        deep_in = jnp.concatenate(
            [dense, feats.reshape(feats.shape[0], -1)], axis=-1)
        deep = MLPTower(self.deep_units, final_units=1,
                        compute_dtype=self.compute_dtype)(deep_in)[:, 0]
        first = 0.0
        if wide is not None and self.wide_names:
            first = sum(wide[n][:, 0] for n in self.wide_names)
        bias = self.param("bias", nn.initializers.zeros, ())
        return fm + deep + first + bias


class DSSM(nn.Module):
    """Two-tower DSSM (modelzoo/DSSM/train.py): user tower and item tower
    MLPs; logit = scaled cosine similarity."""

    user_emb_names: Sequence[str]
    item_emb_names: Sequence[str]
    user_dense_dim: int = 0
    tower_units: Sequence[int] = (256, 128)
    out_dim: int = 64
    temperature: float = 0.05
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, dense, emb, wide=None, train=True):
        u_in = concat_emb(emb, self.user_emb_names)
        if self.user_dense_dim:
            u_in = jnp.concatenate([dense[:, : self.user_dense_dim], u_in], axis=-1)
        i_in = concat_emb(emb, self.item_emb_names)
        u = MLPTower(self.tower_units, final_units=self.out_dim,
                     compute_dtype=self.compute_dtype, name="user_tower")(u_in)
        v = MLPTower(self.tower_units, final_units=self.out_dim,
                     compute_dtype=self.compute_dtype, name="item_tower")(i_in)
        # smooth normalization: linalg.norm has a NaN gradient at exactly 0
        # (an all-zero tower input is reachable via padding/overflow rows)
        u = u * jax.lax.rsqrt(jnp.sum(u * u, -1, keepdims=True) + 1e-12)
        v = v * jax.lax.rsqrt(jnp.sum(v * v, -1, keepdims=True) + 1e-12)
        return jnp.sum(u * v, axis=-1) / self.temperature
