"""Criteo-reader fidelity: the native C parser and the python reader must
produce IDENTICAL batches from identical bytes (labels, dense ints,
categorical ids — shared FNV-1a+splitmix hash), including field edge
cases; and a real Criteo-format FILE must train to an AUC lift through
read_criteo_native (the reference runs full modelzoo training from files
in CI, cibuild/model-test.sh:36-43)."""
import numpy as np
import pytest

import jax

from deeprec_tpu.data.criteo import (CAT_NAMES, DENSE_NAMES, _hash_token,
                                     read_criteo, read_criteo_native)
from deeprec_tpu.utils.native import criteo_parse_chunk, get_lib


def _random_line(rng, edge: str = "") -> str:
    label = str(rng.integers(0, 2))
    dense = []
    for i in range(13):
        r = rng.random()
        if r < 0.2:
            dense.append("")  # missing
        elif r < 0.3:
            dense.append(str(-int(rng.integers(0, 1000))))  # negative
        else:
            dense.append(str(int(rng.integers(0, 100000))))
    cats = []
    for i in range(26):
        r = rng.random()
        if r < 0.15:
            cats.append("")
        else:
            cats.append(f"{rng.integers(0, 1 << 32):08x}")
    fields = [label] + dense + cats
    if edge == "short":  # truncated row: fewer than 40 fields
        fields = fields[: int(rng.integers(1, 39))]
    return "\t".join(fields)


def _tsv(rng, n, final_newline=True) -> bytes:
    edges = ["", "", "", "short"]
    lines = [_random_line(rng, edges[int(rng.integers(0, len(edges)))])
             for _ in range(n)]
    body = "\n".join(lines)
    return (body + ("\n" if final_newline else "")).encode()


def test_hash_token_matches_native():
    if get_lib() is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(0)
    toks = [f"{rng.integers(0, 1 << 32):08x}" for _ in range(200)]
    toks += ["", "0", "deadbeef", "a" * 100]
    # one-token-per-cat lines through the native parser
    line = "1\t" + "\t".join([""] * 13) + "\t" + "\t".join(
        (toks * 2)[:26]) + "\n"
    labels, dense, cats, _ = criteo_parse_chunk(line.encode(), 1)
    for i in range(26):
        assert cats[0, i] == _hash_token((toks * 2)[:26][i]), i


@pytest.mark.parametrize("final_newline", [True, False])
def test_native_parser_matches_python_reader(tmp_path, final_newline):
    """Fuzz: identical bytes -> identical batches (both readers), covering
    empty fields, negatives, short rows, and a truncated final line."""
    rng = np.random.default_rng(42)
    data = _tsv(rng, 503, final_newline=final_newline)  # odd row count
    p = tmp_path / "fuzz.tsv"
    p.write_bytes(data)

    bs = 64
    py = list(read_criteo(str(p), bs))
    nat = list(read_criteo_native(str(p), bs))
    if get_lib() is None:
        pytest.skip("native toolchain unavailable")
    assert len(py) == len(nat) == 503 // bs
    for b_py, b_nat in zip(py, nat):
        np.testing.assert_array_equal(b_py["label"], b_nat["label"])
        for nm in DENSE_NAMES:
            np.testing.assert_array_equal(b_py[nm], b_nat[nm], err_msg=nm)
        for nm in CAT_NAMES:
            np.testing.assert_array_equal(b_py[nm], b_nat[nm], err_msg=nm)


def _write_learnable_criteo(path, rng, n_rows):
    """A Criteo-format file whose label is a function of C1's token —
    learnable by embedding memorization."""
    with open(path, "w") as f:
        for _ in range(n_rows):
            tok_id = int(rng.integers(0, 50))
            label = tok_id % 2
            dense = [str(int(rng.integers(0, 100))) for _ in range(13)]
            cats = [f"tok{tok_id:04d}"] + [
                f"{rng.integers(0, 1 << 16):04x}" for _ in range(25)]
            f.write("\t".join([str(label)] + dense + cats) + "\n")


def test_training_from_criteo_file_lifts_auc(tmp_path):
    """End-to-end: a Criteo-format FILE -> read_criteo_native ->
    Trainer -> AUC lift (file-driven training, not the synthetic path)."""
    import optax

    import deeprec_tpu as dr
    from deeprec_tpu import feature_column as fc
    from deeprec_tpu.models import ctr
    from deeprec_tpu.optim import sparse as sopt
    from deeprec_tpu.train import metrics as M
    from deeprec_tpu.train.trainer import Trainer

    p = tmp_path / "train.tsv"
    rng = np.random.default_rng(1)
    _write_learnable_criteo(p, rng, 4000)

    cols = [fc.EmbeddingColumn(fc.CategoricalColumn("C1"), 8)]
    coll = fc.EmbeddingCollection(
        cols, name="emb", capacity=256,
        initializer=dr.Initializer("normal", scale=0.1))
    model = ctr.DCN(emb_names=["C1"], cross_layers=1, deep_units=(16,))
    tr = Trainer(model, [fc.NumericColumn("I1", log_normalize=True)],
                 {"emb": coll}, {"emb": sopt.sparse_adagrad(0.5)},
                 optax.adagrad(0.05))

    it = read_criteo_native(str(p), batch_size=128, num_epochs=3)
    first = next(it)
    state = tr.init(jax.random.key(0), first)
    state = tr.train_step(state, first)
    for batch in it:
        state = tr.train_step(state, batch)
    state = tr.reset_metrics(state)
    for batch in read_criteo_native(str(p), batch_size=128):
        state = tr.train_step(state, batch)
    m = M.summarize(state.metrics)
    assert m["auc"] > 0.9, m  # label is a pure function of C1's token
