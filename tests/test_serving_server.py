"""HTTP serving front end: predict/health/refresh endpoints match the
in-process predictor (reference: the Triton shim serves DeepRec sessions
as a daemon; here serving/server.py plays that role)."""
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import optax

import jax

import deeprec_tpu as dr
from deeprec_tpu import feature_column as fc
from deeprec_tpu.checkpoint import CheckpointManager
from deeprec_tpu.data.criteo import CAT_NAMES, DENSE_NAMES, SyntheticCriteo
from deeprec_tpu.models import ctr
from deeprec_tpu.optim import sparse as sopt
from deeprec_tpu.serving import Predictor
from deeprec_tpu.serving.server import batch_from_json, make_server, pad_pow2
from deeprec_tpu.train.trainer import Trainer

N_CAT, N_DENSE = 4, 3


def _make_parts(capacity=1 << 10):
    numeric = [fc.NumericColumn(n, log_normalize=True)
               for n in DENSE_NAMES[:N_DENSE]]
    cols = [fc.EmbeddingColumn(fc.CategoricalColumn(n), 8)
            for n in CAT_NAMES[:N_CAT]]
    coll = fc.EmbeddingCollection(
        cols, name="emb", capacity=capacity,
        initializer=dr.Initializer("normal", scale=0.05))
    model = ctr.DCN(emb_names=[c.name for c in cols],
                    cross_layers=2, deep_units=(32, 16))
    return numeric, coll, model


def _batches(n, bs=32, seed=0):
    return list(SyntheticCriteo(batch_size=bs, seed=seed,
                                vocab_sizes=[60, 120, 240, 480] + [9] * 22
                                ).take(n))


def _post(url, obj):
    req = urllib.request.Request(url, json.dumps(obj).encode(),
                                 {"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def _get(url):
    with urllib.request.urlopen(url) as r:
        return json.loads(r.read())


def test_pad_pow2_and_decode():
    b = {"a": np.arange(5), "b": np.ones((5, 2), np.float32)}
    padded, n = pad_pow2(b)
    assert n == 5 and len(padded["a"]) == 8
    assert (padded["a"][5:] == b["a"][-1]).all()
    cols = batch_from_json({"instances": [
        {"C1": 3, "I1": 0.5}, {"C1": 7, "I1": 1.5}]})
    assert cols["C1"].dtype == np.int64 and cols["I1"].dtype == np.float32
    assert cols["C1"].tolist() == [3, 7]


def test_server_endpoints(tmp_path):
    numeric, coll, model = _make_parts()
    tr = Trainer(model, numeric, {"emb": coll},
                 {"emb": sopt.sparse_adagrad(0.05)}, optax.adagrad(0.05))
    bs = _batches(6)
    state = tr.init(jax.random.key(0), bs[0])
    for b in bs[:3]:
        state = tr.train_step(state, b)
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(tr, state)

    n2, c2, m2 = _make_parts()
    pred = Predictor(m2, n2, {"emb": c2}, str(tmp_path))
    srv = make_server(pred, host="127.0.0.1", port=0)  # ephemeral port
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        # health
        h = _get(base + "/healthz")
        assert h["status"] == "ok" and h["tables"]["emb"] > 0

        # columnar predict parity with the in-process predictor (use an
        # odd batch size so the pow2 padding path is exercised)
        req = bs[4]
        cols = {k: np.asarray(v)[:21].tolist() for k, v in req.items()
                if k != "label"}
        out = _post(base + "/v1/predict", {"inputs": cols})
        probs = np.asarray(out["predictions"])
        assert probs.shape == (21,)

        n3, c3, m3 = _make_parts()
        direct = Predictor(m3, n3, {"emb": c3}, str(tmp_path))
        want = direct.predict({k: np.asarray(v)[:21] for k, v in req.items()})
        np.testing.assert_allclose(probs, want[:21], rtol=2e-4, atol=2e-5)

        # instances (row-major) predict: same answer
        names = list(cols)
        rows = [{k: cols[k][i] for k in names} for i in range(4)]
        out2 = _post(base + "/v1/predict", {"instances": rows})
        np.testing.assert_allclose(out2["predictions"], probs[:4],
                                   rtol=2e-4, atol=2e-5)

        # error surface: mismatched column sizes -> 400, not a dead thread
        try:
            _post(base + "/v1/predict",
                  {"inputs": {**cols, "I1": cols["I1"][:3]}})
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # refresh picks up a newer incremental save through HTTP
        for b in bs[3:5]:
            state = tr.train_step(state, b)
        mgr.save_incremental(tr, state)
        r = _post(base + "/refresh", {})
        assert r["changed"] is True
        out3 = _post(base + "/v1/predict", {"inputs": cols})
        assert not np.allclose(out3["predictions"], probs, atol=1e-6)
    finally:
        srv.shutdown()


def test_predictor_adopts_fused_row_layout(tmp_path):
    """A checkpoint trained with fused slot columns (train.cli's default
    adagrad ValuePtr layout) serves through a Predictor whose config never
    heard of the training flags — the row layout is adopted from the
    stored width."""
    import dataclasses

    from deeprec_tpu.optim.sparse import sparse_adagrad_fused

    numeric, coll, model = _make_parts()
    coll.config = dataclasses.replace(coll.config, fused_slot_columns=8,
                                      fused_slot_init=0.1)
    tr = Trainer(model, numeric, {"emb": coll},
                 {"emb": sparse_adagrad_fused(0.05,
                                              initial_accumulator_value=0.1)},
                 optax.adagrad(0.05))
    bs = _batches(5)
    state = tr.init(jax.random.key(0), bs[0])
    for b in bs[:4]:
        state = tr.train_step(state, b)
    CheckpointManager(str(tmp_path)).save(tr, state)

    n2, c2, m2 = _make_parts()  # plain config: fused_slot_columns == 0
    pred = Predictor(m2, n2, {"emb": c2}, str(tmp_path))
    assert c2.config.fused_slot_columns == 8
    probs = pred.predict(bs[4])

    # parity with the trainer's own eval forward on the same state
    from deeprec_tpu.feature_column import normalize_dense
    from deeprec_tpu.train.trainer import _readonly_lookup
    dense, cats, _ = tr.prepare_batch(bs[4])
    d = normalize_dense(numeric, dense)
    aux, urows = _readonly_lookup(coll, state.tables["emb"].ev, cats["emb"])
    emb, _seq = coll.embeddings_readonly(urows, aux)
    logits = model.apply(state.params, d, emb, train=False)
    np.testing.assert_allclose(probs, np.asarray(jax.nn.sigmoid(logits)),
                               rtol=2e-4, atol=2e-5)


def test_dynamic_batching_coalesces_and_returns_own_rows(tmp_path):
    """Triton-dynamic_batching analog: concurrent predict requests share
    device calls (device_batches < requests) and every caller gets
    exactly its own rows — identical to serial, unbatched answers."""
    numeric, coll, model = _make_parts()
    tr = Trainer(model, numeric, {"emb": coll},
                 {"emb": sopt.sparse_adagrad(0.05)}, optax.adagrad(0.05))
    bs = _batches(4)
    state = tr.init(jax.random.key(0), bs[0])
    for b in bs[:3]:
        state = tr.train_step(state, b)
    CheckpointManager(str(tmp_path)).save(tr, state)

    n2, c2, m2 = _make_parts()
    pred = Predictor(m2, n2, {"emb": c2}, str(tmp_path))
    srv = make_server(pred, host="127.0.0.1", port=0,
                      dynamic_batch_ms=60.0, max_batch=512)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{port}"
        src = bs[3]
        # 8 concurrent requests, distinct row slices, odd sizes
        slices = [(0, 3), (3, 8), (8, 9), (9, 14), (14, 17), (17, 22),
                  (22, 27), (27, 31)]
        payloads = [{k: np.asarray(v)[a:b].tolist() for k, v in src.items()
                     if k != "label"} for a, b in slices]
        results = [None] * len(payloads)

        def fire(i):
            results[i] = _post(base + "/v1/predict",
                               {"inputs": payloads[i]})["predictions"]
        ts = [threading.Thread(target=fire, args=(i,))
              for i in range(len(payloads))]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=120)
        assert all(r is not None for r in results)

        # correctness: each caller got ITS rows (vs unbatched predictor)
        n3, c3, m3 = _make_parts()
        direct = Predictor(m3, n3, {"emb": c3}, str(tmp_path))
        want = direct.predict({k: np.asarray(v) for k, v in src.items()})
        for (a, b), got in zip(slices, results):
            assert len(got) == b - a
            np.testing.assert_allclose(got, want[a:b], rtol=2e-4, atol=2e-5)

        # coalescing actually happened: fewer device calls than requests
        h = _get(base + "/healthz")
        assert h["requests"] == len(payloads)
        assert 1 <= h["device_batches"] < len(payloads)
    finally:
        srv.service.batcher.stop()
        srv.shutdown()
