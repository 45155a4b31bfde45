"""Host-to-host bucket exchange: the StarServer pull/push role on TPU pods.

The multi-process host-sharded engine (parallel/host_sharded.py) needs
one host-side all-to-all per step: each process ships the id buckets its
requester devices routed to OTHER processes' table shards, and receives
the buckets destined for its own shards — so each process's
HostIndexResolvers can assign slots for the shards it owns, one step
ahead of the devices. This is exactly the reference's cross-host CPU
index resolution (contrib/star/star_worker_service.h:60-61 StarRunGraph
pull/push; the PS's dense_hash_map probe on ids RPC'd from workers),
minus the per-key RPC chatter: one length-prefixed frame per peer per
step.

Transport: a full TCP mesh bootstrapped through the jax.distributed
KV store (the same channel the cluster already stands on — no new
deployment surface). Process p accepts connections from every q > p and
dials every q < p; frames are ``[u64 seq][u64 len][payload]``.

Deadline semantics: the engine wants the exchange to finish while the
device executes the PREVIOUS step (one-step-ahead). ``deadline_ms`` is a
SOFT deadline — a late frame is still waited for (correctness first),
but ``late_steps`` increments and surfaces in the collection's
host_health, where the CLI watchdog alarms. A dead peer eventually
raises (hard timeout = 60s).
"""
from __future__ import annotations

import socket
import struct
import threading
import time
from typing import List, Optional

import jax

_HDR = struct.Struct("<QQ")
_HARD_TIMEOUT_S = 60.0


def _kv_client():
    from jax._src import distributed
    client = distributed.global_state.client
    if client is None:
        raise RuntimeError("jax.distributed not initialized "
                           "(multihost.initialize() first)")
    return client


def _local_ip() -> str:
    """This host's IP as seen by the coordinator (works on one-box test
    clusters and real pods alike)."""
    import os
    addr = os.environ.get("COORDINATOR_ADDRESS", "")
    host = addr.split(":")[0] if addr else ""
    if host in ("localhost", "127.0.0.1", ""):
        return "127.0.0.1"
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    try:
        s.connect((host, 1))
        return s.getsockname()[0]
    finally:
        s.close()


class HostBucketExchange:
    """Per-step all-to-all of byte blobs between the job's processes."""

    def __init__(self, tag: str, deadline_ms: float = 0.0):
        self.nproc = jax.process_count()
        self.pid = jax.process_index()
        self.deadline_ms = float(deadline_ms)
        self.late_steps = 0
        self._seq = 0
        self._socks: List[Optional[socket.socket]] = [None] * self.nproc
        if self.nproc == 1:
            return
        kv = _kv_client()
        srv = socket.create_server(("0.0.0.0", 0))
        srv.listen(self.nproc)
        port = srv.getsockname()[1]
        kv.key_value_set(f"deeprec/hx/{tag}/{self.pid}",
                         f"{_local_ip()}:{port}")
        # accept from higher pids, dial lower pids (deterministic pairing)
        n_accept = self.nproc - 1 - self.pid

        def _accept():
            for _ in range(n_accept):
                conn, _ = srv.accept()
                conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
                peer = struct.unpack("<Q", _recvn(conn, 8))[0]
                self._socks[peer] = conn

        acc = threading.Thread(target=_accept, daemon=True)
        acc.start()
        for q in range(self.pid):
            addr = kv.blocking_key_value_get(f"deeprec/hx/{tag}/{q}",
                                             int(_HARD_TIMEOUT_S * 1000))
            host, p = addr.rsplit(":", 1)
            sk = socket.create_connection((host, int(p)),
                                          timeout=_HARD_TIMEOUT_S)
            sk.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            sk.settimeout(None)
            sk.sendall(struct.pack("<Q", self.pid))
            self._socks[q] = sk
        acc.join(timeout=_HARD_TIMEOUT_S)
        if any(self._socks[q] is None
               for q in range(self.nproc) if q != self.pid):
            raise RuntimeError("host-exchange mesh failed to form")
        srv.close()

    def all_to_all(self, blobs: List[bytes]) -> List[Optional[bytes]]:
        """Send ``blobs[q]`` to process q, return what each q sent us
        (``None`` at our own index). Blobs for our own index are ignored.
        """
        if self.nproc == 1:
            return [None]
        seq = self._seq
        self._seq += 1
        t0 = time.perf_counter()

        def _send(q):
            sk = self._socks[q]
            sk.sendall(_HDR.pack(seq, len(blobs[q])) + blobs[q])

        senders = []
        for q in range(self.nproc):
            if q == self.pid:
                continue
            t = threading.Thread(target=_send, args=(q,), daemon=True)
            t.start()
            senders.append(t)
        out: List[Optional[bytes]] = [None] * self.nproc
        for q in range(self.nproc):
            if q == self.pid:
                continue
            sk = self._socks[q]
            sk.settimeout(_HARD_TIMEOUT_S)
            rseq, ln = _HDR.unpack(_recvn(sk, _HDR.size))
            if rseq != seq:
                raise RuntimeError(
                    f"host-exchange desync with process {q}: "
                    f"got seq {rseq}, expected {seq}")
            out[q] = _recvn(sk, ln)
        for t in senders:
            t.join(timeout=_HARD_TIMEOUT_S)
        if self.deadline_ms and \
                (time.perf_counter() - t0) * 1e3 > self.deadline_ms:
            self.late_steps += 1
        return out

    def close(self):
        for sk in self._socks:
            if sk is not None:
                try:
                    sk.close()
                except OSError:
                    pass
        self._socks = [None] * self.nproc


def _recvn(sk: socket.socket, n: int) -> bytes:
    buf = bytearray(n)
    view = memoryview(buf)
    got = 0
    while got < n:
        r = sk.recv_into(view[got:], n - got)
        if not r:
            raise ConnectionError("host-exchange peer closed")
        got += r
    return bytes(buf)
