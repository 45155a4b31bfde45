"""DSSM two-tower trainer on behaviour data.

Rebuild of reference modelzoo/DSSM/train.py (Taobao user/item two-tower):
user tower over [uid, pooled click history], item tower over [candidate
item, category]; logit = scaled cosine similarity. The history shares the
item embedding space with the candidate (shared_embedding group).
"""
import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

from deeprec_tpu import Initializer, feature_column as fc
from deeprec_tpu.models import ctr
from deeprec_tpu.train import cli

MAX_LEN = 32


def build(args) -> cli.ModelSpec:
    import jax.numpy as jnp
    cols = [
        fc.EmbeddingColumn(fc.CategoricalColumn("uid"), args.emb_dim),
        fc.EmbeddingColumn(
            fc.CategoricalColumn("item", shared_embedding="item_space"),
            args.emb_dim),
        fc.EmbeddingColumn(fc.CategoricalColumn("cate"), args.emb_dim),
        fc.EmbeddingColumn(
            fc.CategoricalColumn("hist_item", max_length=MAX_LEN,
                                 shared_embedding="item_space"),
            args.emb_dim, combiner="mean"),
    ]
    coll = cli.collection_cls(args)(
        cols, name="emb", capacity=args.capacity,
        initializer=Initializer("normal", scale=0.05), **cli.ev_kwargs(args))
    model = ctr.DSSM(
        user_emb_names=["uid", "hist_item"],
        item_emb_names=["item", "cate"],
        tower_units=(256, 128), out_dim=64,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    return cli.ModelSpec(
        name="DSSM", model=model, numeric_columns=[],
        collections={"emb": coll},
        sparse_optimizers={"emb": cli.make_sparse_opt(args)},
        train_data=cli.behavior_train_stream,
        eval_data=cli.behavior_eval_stream)


if __name__ == "__main__":
    p = cli.base_parser("DSSM two-tower on behaviour data")
    p.set_defaults(optimizer="adam", learning_rate=0.002,
                   # behaviour sequences dedup poorly: most
                   # history ids are unique within a batch
                   max_unique_ratio=0.75)
    args = p.parse_args()
    cli.run(build(args), args)
