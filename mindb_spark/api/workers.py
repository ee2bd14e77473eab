"""Multi-process resident serving: N snapshot processes, one assemble.

Round 8 measured the resident snapshot's thread-concurrency ceiling
honestly (tools/resident_concurrency_probe.py): ~2x aggregate qps, then
GIL thrash — the query kernel is numpy gathers and small GEMMs whose
Python-side bookkeeping serializes on the interpreter lock. The scale-out
that actually works on one host is PROCESSES (round 9, VERDICT r8 #7):

- ``ResidentSnapshot.save(dir)`` writes each numeric block as its own
  ``.npy``; every worker loads with ``mmap_mode="r"``, so the vectors /
  codes / ids blocks exist ONCE in the OS page cache no matter how many
  workers serve from them (metadata strings are per-process — ~4% of a
  768-d snapshot's bytes).
- ``ResidentWorkerPool`` launches N workers as plain subprocesses
  (``python -m mindb_spark.api.workers``) talking over a unix-socket
  ``multiprocessing.connection`` channel. Deliberately NOT
  ``multiprocessing.Process``: ``fork`` would duplicate the JVM-attached
  PySpark driver's socket/signal state, and every non-fork start method
  re-imports the caller's ``__main__`` (crashing plain user scripts with
  the "bootstrapping phase" RuntimeError — caught by the round-9 verify
  run). A fresh interpreter per worker has neither problem. Each worker
  owns its own BLAS pool and its own GIL, so aggregate qps scales with
  workers until memory bandwidth binds (measured table:
  tools/resident_multiproc_probe.py, PERF_NOTES round 9).

Result parity: workers run the SAME ``ResidentSnapshot.query`` kernel on
the SAME arrays, so results are bit-identical to the in-process snapshot
(pinned by tests/test_resident_workers.py). Staleness is the caller's
contract exactly as for the in-process snapshot: the pool records the
snapshot fingerprint at save time and exposes it; the REST layer serves
through the pool only while the live manifest still matches
(api/rest.py), falling back to the single-process / Spark paths the
moment a mutation lands.
"""

from __future__ import annotations

import itertools
import os
import shutil
import subprocess
import sys
import tempfile
import threading
from multiprocessing.connection import Client, Listener

import numpy as np

_KEY_ENV = "MINDB_WORKER_AUTHKEY"


def _worker_main(snapshot_dir: str, address: str, authkey: bytes) -> None:
    """Worker loop: load the mmap'd snapshot, connect back to the pool's
    unix socket, serve query batches until the parent sends None. Runs in
    a fresh interpreter — no Spark, no JVM, nothing inherited but argv."""
    from mindb_spark.core.resident import ResidentSnapshot

    conn = Client(address, family="AF_UNIX", authkey=authkey)
    try:
        snap = ResidentSnapshot.load(snapshot_dir, mmap=True)
        conn.send(("ready", int(snap.ids.size)))
    except Exception as exc:  # surface load failures to the parent
        conn.send(("err", repr(exc)))
        conn.close()
        return
    while True:
        msg = conn.recv()
        if msg is None:
            break
        qmat, prelim, fin, n_probe = msg
        try:
            conn.send(("ok", snap.query(
                qmat, preliminary_top_k=prelim, final_top_k=fin,
                n_probe=n_probe,
            )))
        except Exception as exc:
            conn.send(("err", repr(exc)))
    conn.close()


class ResidentWorkerPool:
    """N serving subprocesses over one saved snapshot directory."""

    def __init__(self, snapshot_dir: str, n_workers: int,
                 fingerprint: tuple | None = None,
                 _owns_dir: bool = False):
        if n_workers < 1:
            raise ValueError("n_workers must be >= 1")
        self.snapshot_dir = snapshot_dir
        self.fingerprint = fingerprint
        self._owns_dir = _owns_dir
        self._procs = []
        self._conns = []
        self._locks = []
        self._closed = False
        self._close_lock = threading.Lock()
        authkey = os.urandom(16)
        # unix socket inside a private temp dir; authkey via env (argv is
        # world-readable in /proc), repo root on PYTHONPATH so a worker
        # finds the package even when the parent imported it from a
        # non-installed checkout
        self._authkey = authkey
        self._sock_dir = tempfile.mkdtemp(prefix="mindb_pool_")
        self._sock_seq = itertools.count()
        env = dict(os.environ, **{_KEY_ENV: authkey.hex()})
        pkg_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        env["PYTHONPATH"] = (
            pkg_root + os.pathsep + env.get("PYTHONPATH", "")
        ).rstrip(os.pathsep)
        self._env = env
        self.rows = None
        self.respawn_count = 0
        # Any failure while spawning / handshaking (worker crash -> EOFError
        # on recv, accept timeout, bad snapshot) must not leak the already
        # spawned processes, the socket dir, or an owned multi-GB snapshot
        # dir (ADVICE r9): tear everything down before re-raising.
        try:
            for _ in range(n_workers):
                proc, conn, rows = self._spawn_one()
                self._procs.append(proc)
                self._conns.append(conn)
                self._locks.append(threading.Lock())
                self.rows = rows
        except BaseException:
            self.close()
            raise
        self._rr = itertools.cycle(range(n_workers))
        self._rr_lock = threading.Lock()

    def _spawn_one(self):
        """Spawn one worker and complete its ready-handshake. Each spawn
        uses a fresh one-shot unix socket inside the pool's private dir so
        respawns never race a half-closed listener."""
        address = os.path.join(
            self._sock_dir, f"pool-{next(self._sock_seq)}.sock"
        )
        with Listener(address, family="AF_UNIX",
                      authkey=self._authkey) as listener:
            try:  # a worker that dies before connecting must not hang us
                listener._listener._socket.settimeout(120)
            except AttributeError:
                pass
            proc = subprocess.Popen(
                [sys.executable, "-m", "mindb_spark.api.workers",
                 self.snapshot_dir, address],
                env=self._env,
                stdout=subprocess.DEVNULL,
            )
            try:
                conn = listener.accept()
            except BaseException:
                proc.terminate()
                raise
        try:
            status, payload = conn.recv()
        except BaseException:
            proc.terminate()
            conn.close()
            raise
        if status != "ready":
            proc.terminate()
            conn.close()
            raise RuntimeError(f"worker failed to load snapshot: {payload}")
        return proc, conn, payload

    # ------------------------------------------------------ construction
    @classmethod
    def from_snapshot(cls, snap, n_workers: int,
                      directory: str | None = None) -> "ResidentWorkerPool":
        """Save ``snap`` once and spawn ``n_workers`` over it. With no
        ``directory`` a temp dir is created and removed on ``close()``."""
        owns = directory is None
        directory = directory or tempfile.mkdtemp(prefix="mindb_resident_")
        snap.save(directory)
        return cls(directory, n_workers, fingerprint=snap.fingerprint,
                   _owns_dir=owns)

    # ----------------------------------------------------------- serving
    @property
    def n_workers(self) -> int:
        return len(self._procs)

    def query_on(self, worker: int, query_vectors: np.ndarray,
                 preliminary_top_k: int = 500, final_top_k: int = 100,
                 n_probe: int | None = None) -> list[dict]:
        """Serve on a specific worker (the probe's thread-per-worker
        drive); blocks while that worker is busy.

        A dead worker (killed by the OOM reaper, crashed) is respawned
        in place and the query retried once on the fresh process
        (VERDICT r9 #7) — a transient kill must not permanently drop the
        pool to single-process throughput. Only a respawn that itself
        fails propagates to the caller's fallback path."""
        # closed-pool check BEFORE indexing: close() reassigns the lock /
        # conn lists to [], so a post-close caller would otherwise see an
        # IndexError instead of the intended clean error (ADVICE r10).
        # The IndexError catch covers the close-raced window between the
        # flag check and the list read; a genuinely out-of-range worker on
        # a live pool still IndexErrors (caller bug, not lifecycle).
        if self._closed:
            raise RuntimeError("pool is closed")
        try:
            lock = self._locks[worker]
        except IndexError:
            if self._closed:
                raise RuntimeError("pool is closed") from None
            raise
        qmat = np.asarray(query_vectors, dtype=np.float64)
        if qmat.ndim == 1:
            qmat = qmat[None, :]
        req = (qmat, preliminary_top_k, final_top_k, n_probe)
        with lock:
            if self._closed:
                raise RuntimeError("pool is closed")
            try:
                self._conns[worker].send(req)
                status, payload = self._conns[worker].recv()
            except (OSError, EOFError, BrokenPipeError):
                self._respawn_locked(worker)
                self._conns[worker].send(req)
                status, payload = self._conns[worker].recv()
        if status != "ok":
            raise RuntimeError(f"resident worker error: {payload}")
        return payload

    def _respawn_locked(self, worker: int) -> None:
        """Replace a dead worker's process+connection. Caller holds
        self._locks[worker], so no query and no close() can interleave
        with the swap."""
        try:
            self._conns[worker].close()
        except OSError:
            pass
        old = self._procs[worker]
        if old.poll() is None:  # wedged, not dead — don't leak it
            old.terminate()
        proc, conn, _rows = self._spawn_one()
        self._procs[worker] = proc
        self._conns[worker] = conn
        self.respawn_count += 1

    def query(self, query_vectors: np.ndarray, preliminary_top_k: int = 500,
              final_top_k: int = 100, n_probe: int | None = None) -> list[dict]:
        """Round-robin serve: concurrent callers land on different
        workers and run genuinely in parallel (separate processes)."""
        with self._rr_lock:
            worker = next(self._rr)
        return self.query_on(
            worker, query_vectors, preliminary_top_k, final_top_k, n_probe
        )

    # ---------------------------------------------------------- lifecycle
    def close(self) -> None:
        # Serialize closers: two REST threads can race into close() via
        # the identity-aware _drop_pool (both serving from the same
        # unhealthy pool object); without this lock the slower thread
        # indexes self._locks after the faster one reassigned it to []
        # and the IndexError surfaces as the 500 the drop path exists to
        # prevent. Idempotent: the second closer sees empty lists.
        with self._close_lock:
            self._closed = True
            # The shutdown sentinel must not interleave with an in-flight
            # query's send/recv on the same Connection (ADVICE r9): take
            # each worker's lock before touching its socket, so close()
            # serializes behind any REST thread inside query_on.
            for i in range(len(self._conns)):
                with self._locks[i]:
                    # read the conn under the lock: a respawn that
                    # finished while we waited must get the sentinel on
                    # the NEW socket
                    conn = self._conns[i]
                    try:
                        conn.send(None)
                        conn.close()
                    except (OSError, BrokenPipeError):
                        pass
            for p in self._procs:
                try:
                    p.wait(timeout=10)
                except subprocess.TimeoutExpired:
                    p.terminate()
            self._procs, self._conns, self._locks = [], [], []
            shutil.rmtree(self._sock_dir, ignore_errors=True)
            if self._owns_dir and os.path.isdir(self.snapshot_dir):
                shutil.rmtree(self.snapshot_dir, ignore_errors=True)

    def __enter__(self) -> "ResidentWorkerPool":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


if __name__ == "__main__":  # worker entry: python -m mindb_spark.api.workers
    _snapshot_dir, _address = sys.argv[1], sys.argv[2]
    _key = bytes.fromhex(os.environ[_KEY_ENV])
    _worker_main(_snapshot_dir, _address, _key)
