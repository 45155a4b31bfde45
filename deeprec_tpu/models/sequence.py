"""Sequence (user-behaviour) models: DIN and DIEN.

Rebuilds of modelzoo/DIN/script/model.py (attention pooling + Dice) and
modelzoo/DIEN (GRU interest extraction + AUGRU interest evolution,
modelzoo/DIEN/script/rnn.py) — the "sequence" axis here is a user-behaviour
history of a few hundred items, a model feature, not a parallelism axis
(SURVEY.md §5). Inputs:

  * ``dense``: [B, Dd]
  * ``emb``: pooled context embeddings (candidate item, user profile)
  * ``seq``: dict name -> ([B, L, d], mask [B, L]) behaviour sequences
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import AUGRU, Dice, DINAttention, GRU
from .ctr import concat_emb


def _concat_item_eb(emb, seq, candidate_name, seq_name,
                    candidate_context_names, seq_context_names):
    """The reference's item_eb / item_his_eb construction
    (modelzoo/DIN/script/model.py:36-43): candidate = concat(item, cate,
    ...), each history position = concat(hist_item, hist_cate, ...). The
    main sequence's mask governs (context sequences share its padding)."""
    cand = emb[candidate_name]
    if candidate_context_names:
        cand = jnp.concatenate(
            [cand] + [emb[n] for n in candidate_context_names], axis=-1)
    hist, mask = seq[seq_name]
    if seq_context_names:
        hist = jnp.concatenate(
            [hist] + [seq[n][0] for n in seq_context_names], axis=-1)
    return cand, (hist, mask)


class DIN(nn.Module):
    """Deep Interest Network: DIN attention pools the behaviour sequence
    against the candidate item; MLP with Dice activations scores the CTR."""

    candidate_name: str      # key in emb: the candidate item embedding
    seq_name: str            # key in seq: behaviour history
    context_names: Sequence[str] = ()
    # Reference DIN scores concat(item, cate) against per-position
    # concat(hist_item, hist_cate) (model.py: item_eb = concat(mid, cat),
    # item_his_eb = concat(mid_his, cat_his)) — these name the extra
    # embeddings concatenated onto the candidate / each sequence position.
    candidate_context_names: Sequence[str] = ()
    seq_context_names: Sequence[str] = ()
    hidden_units: Sequence[int] = (200, 80)
    att_units: Sequence[int] = (80, 40)
    activation: str = "dice"  # dice | relu | sigmoid (reference uses dice)

    @nn.compact
    def __call__(self, dense, emb, seq, train=True):
        cand, (hist, mask) = _concat_item_eb(
            emb, seq, self.candidate_name, self.seq_name,
            self.candidate_context_names, self.seq_context_names)
        pooled = DINAttention(self.att_units)(cand, hist, mask)
        sum_pool = jnp.sum(hist * mask[..., None], axis=1)
        parts = [cand, pooled, sum_pool, cand * pooled]
        if self.context_names:
            parts.append(concat_emb(emb, self.context_names))
        if dense is not None and dense.shape[-1]:
            parts.append(dense)
        x = jnp.concatenate(parts, axis=-1)
        for i, u in enumerate(self.hidden_units):
            x = nn.Dense(u, name=f"fc_{i}")(x)
            if self.activation == "dice":
                x = Dice(name=f"dice_{i}")(x, train=train)
            elif self.activation == "relu":
                x = nn.relu(x)
            else:
                x = nn.sigmoid(x)
        return nn.Dense(1, name="out")(x)[:, 0]


class DIEN(nn.Module):
    """Deep Interest Evolution Network: GRU extracts interest states from
    the behaviour sequence; attention vs. the candidate produces weights;
    AUGRU evolves the final interest. Auxiliary loss (next-behaviour
    prediction on GRU states) is returned separately when requested."""

    candidate_name: str
    seq_name: str
    context_names: Sequence[str] = ()
    # per-position concat, like DIN (reference DIEN runs its GRU/AUGRU and
    # auxiliary net over concat(item, cate) embeddings, model.py item_his_eb)
    candidate_context_names: Sequence[str] = ()
    seq_context_names: Sequence[str] = ()
    gru_units: int = 36
    hidden_units: Sequence[int] = (200, 80)
    att_units: Sequence[int] = (80, 40)
    use_aux_loss: bool = True

    @nn.compact
    def __call__(self, dense, emb, seq, train=True, return_aux=False):
        cand, (hist, mask) = _concat_item_eb(
            emb, seq, self.candidate_name, self.seq_name,
            self.candidate_context_names, self.seq_context_names)
        B, L, d = hist.shape
        states = GRU(self.gru_units, name="interest_extractor")(hist, mask)

        # attention of candidate over GRU states
        cand_p = nn.Dense(self.gru_units, name="cand_proj")(cand)
        att = DINAttentionScores(self.att_units, name="att")(cand_p, states, mask)
        final = AUGRU(self.gru_units, name="interest_evolution")(states, att, mask)

        parts = [cand, final, jnp.sum(hist * mask[..., None], axis=1)]
        if self.context_names:
            parts.append(concat_emb(emb, self.context_names))
        if dense is not None and dense.shape[-1]:
            parts.append(dense)
        x = jnp.concatenate(parts, axis=-1)
        for i, u in enumerate(self.hidden_units):
            x = nn.Dense(u, name=f"fc_{i}")(x)
            x = Dice(name=f"dice_{i}")(x, train=train)
        logits = nn.Dense(1, name="out")(x)[:, 0]

        if return_aux and self.use_aux_loss:
            # auxiliary loss: GRU state at t should predict behaviour t+1
            # (binary: true next item vs. a shuffled negative). ONE shared
            # projection scores both — the reference's auxiliary_net is a
            # single MLP applied to positive and negative pairs
            # (modelzoo/DIEN/script/model.py auxiliary_loss)
            aux_net = nn.Dense(self.gru_units, name="aux_proj")
            pos = jnp.sum(states[:, :-1, :] * aux_net(hist[:, 1:, :]), axis=-1)
            neg_items = jnp.roll(hist[:, 1:, :], 1, axis=0)
            neg = jnp.sum(states[:, :-1, :] * aux_net(neg_items), axis=-1)
            m = mask[:, 1:].astype(jnp.float32)
            aux = -(jnp.log(jax.nn.sigmoid(pos) + 1e-8) +
                    jnp.log(1 - jax.nn.sigmoid(neg) + 1e-8)) * m
            aux_loss = jnp.sum(aux) / jnp.maximum(jnp.sum(m), 1.0)
            return logits, aux_loss
        return logits


class DINAttentionScores(nn.Module):
    """DIN attention that returns normalized weights [B, L] (for AUGRU)."""

    hidden_units: Sequence[int] = (80, 40)

    @nn.compact
    def __call__(self, query, keys, mask):
        B, L, d = keys.shape
        q = jnp.broadcast_to(query[:, None, :], (B, L, d))
        x = jnp.concatenate([q, keys, q - keys, q * keys], axis=-1)
        for i, u in enumerate(self.hidden_units):
            x = nn.Dense(u, name=f"att_{i}")(x)
            x = nn.sigmoid(x)
        logits = nn.Dense(1, name="att_out")(x)[..., 0]
        logits = jnp.where(mask, logits, -1e9)
        w = jax.nn.softmax(logits, axis=-1)
        return jnp.where(mask, w, 0.0)
