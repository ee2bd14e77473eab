"""Engine facade: the reference's serving-layer semantics over Spark.

Mirrors the REST surface of ``mindb/api/fastapi.py:67-470`` route-for-route
as plain Python (a REST wrapper would be a thin layer over this; it is
deliberately out of the analytics-engine core):

| reference route                    | here                              |
|------------------------------------|-----------------------------------|
| POST /db/create                    | ``create_db``                     |
| GET  /db/{name}/info               | ``info``                          |
| POST /db/{name}/add                | ``add``                           |
| POST /db/{name}/remove             | ``remove``                        |
| POST /db/{name}/train + GET status | ``train`` / ``train_status``      |
| POST /db/{name}/query              | ``query``                         |
| POST /db/{name}/save               | no-op (writes are write-through)  |
| POST /db/{name}/reload             | ``reload``                        |
| POST /db/{name}/delete             | ``delete_db``                     |
| GET  /db/find_indexes_to_train     | ``find_indexes_to_train``         |
| GET  /db/get_initial_training_queue| ``initial_training_queue``        |
| GET  /db/view_cache                | ``open_databases``                |
| POST /db/{name}/remove_from_cache  | ``close``                         |
| POST /db/update_max_memory_usage   | ``update_max_memory_usage``       |

The reference's LRU cache with memory-estimate eviction
(``mindb/cache/cache.py``) exists because each open DB pins a Faiss index
in RAM. Here executors cache/evict data blocks on their own (Spark block
manager), but each open handle still pins driver state — the manifest
plus memoized dense index artifacts — so the registry is the same
memory-bounded LRU (``core/cache.py``) with the reference's estimate
formulas as eviction weights; eviction releases the artifact memo and
``close`` drops a handle explicitly.

Training lifecycle (reference ``fastapi.py:245-330``): ``train`` runs the
Spark build either synchronously (``block=True``, default) or on a
background thread (``block=False``, the reference's
``threading.Thread(target=train_db)``). The state machine mirrors the
reference's ``operations`` dict — "not started" → "in progress" →
"complete" | "failed" — and a train request while one is in progress is
rejected with :class:`TrainingInProgressError` (the reference's 400).
Data safety during a background build comes from snapshot semantics: the
build pins an explicit file list, and rows added after the pin are the
exactly-searched tail (``id > max_trained_id``) — no replay machinery.
"""

from __future__ import annotations

import os
import threading
from typing import Any

from pyspark.sql import SparkSession

from mindb_spark.core import validation as V
from mindb_spark.core.cache import LRUCache
from mindb_spark.core.database import DEFAULT_BASE, VectorDB, tombstone_and_remove
from mindb_spark.core.heuristics import needs_initial_training, needs_retraining


class TrainingInProgressError(RuntimeError):
    """A train request arrived while one is already running (ref 400,
    ``fastapi.py:321-326``)."""


class Engine:
    def __init__(
        self,
        spark: SparkSession,
        base_path: str = DEFAULT_BASE,
        max_memory_usage: int | None = None,
    ):
        self.spark = spark
        self.base_path = base_path
        # memory-bounded LRU of open handles (ref cache.py; O23). None =
        # unbounded (the embedded default — Spark owns data memory, so a
        # bound only matters when many DBs pin driver artifacts). For
        # reference-server parity construct the serving engine with
        # max_memory_usage=1 << 30 (fastapi.py:21 hard-codes 1 GiB).
        self._open = LRUCache(max_memory_usage)
        # training state machine (ref fastapi.py `operations` dict)
        self._train_ops: dict[str, str] = {}
        self._train_errors: dict[str, str] = {}
        self._train_threads: dict[str, threading.Thread] = {}
        # per-name run generation; delete_db bumps it to orphan in-flight runs
        self._train_gen: dict[str, int] = {}
        self._train_lock = threading.Lock()

    # ------------------------------------------------------------ registry
    def create_db(
        self,
        name: str,
        vector_dimension: int | None = None,
        max_memory_usage: int | None = None,
    ) -> VectorDB:
        if VectorDB.exists(name, self.base_path):
            raise V.ValidationError(f"database {name!r} already exists")
        db = VectorDB(
            self.spark,
            name,
            base_path=self.base_path,
            vector_dimension=vector_dimension,
            max_memory_usage=max_memory_usage,
        )
        return self._open.put(name, db, operations=self._ops_snapshot())

    def get_db(self, name: str) -> VectorDB:
        db = self._open.get(name)
        if db is None:
            db = VectorDB(self.spark, name, base_path=self.base_path)
            # put returns the cached handle — under a cold-get race both
            # callers must share one handle (duplicate-id hazard otherwise)
            db = self._open.put(name, db, operations=self._ops_snapshot())
        return db

    def _ops_snapshot(self) -> dict[str, str]:
        """Training states for eviction pinning (in-flight trains pin)."""
        with self._train_lock:
            return dict(self._train_ops)

    def list_dbs(self) -> list[str]:
        if not os.path.isdir(self.base_path):
            return []
        return sorted(
            d
            for d in os.listdir(self.base_path)
            if os.path.exists(os.path.join(self.base_path, d, "manifest.json"))
        )

    def open_databases(self) -> list[str]:
        """Parity with GET /db/view_cache."""
        return sorted(self._open.keys())

    def cache_info(self) -> dict[str, Any]:
        """view_cache payload parity (ref fastapi.py:448-459)."""
        return {
            "cache_keys": self.open_databases(),
            "current_memory_usage": self._open.current_memory_usage,
            "max_memory_usage": self._open.max_memory_usage,
        }

    def update_max_memory_usage(self, max_memory_usage: int | None) -> None:
        """POST /db/update_max_memory_usage (ref fastapi.py:467-469):
        shrink the handle budget and evict LRU-first, skipping databases
        with an in-flight training run."""
        self._open.update_max_memory_usage(
            max_memory_usage, operations=self._ops_snapshot()
        )

    def close(self, name: str) -> bool:
        """Parity with remove_from_cache: drop the driver-side handle."""
        return self._open.remove(name)

    def reload(self, name: str) -> VectorDB:
        self.close(name)
        return self.get_db(name)

    def delete_db(self, name: str) -> None:
        self.close(name)
        # drop training state with the database: a recreated same-name DB
        # must not inherit the doomed run's status — a lingering
        # "in progress" would reject its first train, and a lingering
        # "failed"/"complete" would misreport an untrained database
        with self._train_lock:
            self._train_ops.pop(name, None)
            self._train_errors.pop(name, None)
            self._train_threads.pop(name, None)
            # orphan any in-flight run: its completion must not write back
            self._train_gen[name] = self._train_gen.get(name, 0) + 1
        # tombstone + deferred removal: an in-flight background build
        # holds snapshot pins / the index mutex on this path — rmtree
        # under it would race the build's reads, and the build's
        # finalizer would resurrect the directory by saving its stale
        # manifest. The tombstone blocks the manifest write-back and
        # new mutations; the file tree goes now if idle, else when the
        # build's finalizer drains the deferred list.
        path = os.path.join(self.base_path, name)
        if os.path.exists(path):
            tombstone_and_remove(path)

    # ---------------------------------------------------------- operations
    def info(self, name: str) -> dict[str, Any]:
        return self.get_db(name).info()

    def add(self, name: str, data: list, add_to_index: bool = False) -> list[int]:
        ids = self.get_db(name).add(data, add_to_index=add_to_index)
        # re-weigh + evict on the non-latency-sensitive mutation paths
        # only (ref cache.py:36-41: check_memory_usage on add/remove)
        self._open.check_memory_usage(self._ops_snapshot())
        return ids

    def maybe_auto_train_async(self, name: str) -> bool:
        """Post-add auto-train trigger, reference-style: if the policy
        (training_utils.py:148-188, wired at fastapi.py:173-186) flags this
        database, kick off a BACKGROUND train and return True. Never raises
        on a concurrent train — the policy itself treats in-progress as
        "don't trigger"."""
        db = self.get_db(name)
        in_progress = self.train_status(name) == "in progress"
        # manifest-counter count: the per-add policy check must not cost a
        # Spark job (the reference's check is an in-memory dict lookup)
        n = db.num_vectors_fast
        should = needs_initial_training(n, db.is_trained, in_progress) or (
            db.is_trained
            and needs_retraining(n, db.coverage_ratio(), in_progress)
        )
        if not should:
            return False
        try:
            self.train(name, block=False)
        except TrainingInProgressError:
            return False
        return True

    def remove(self, name: str, ids) -> list[int]:
        out = self.get_db(name).remove(ids)
        self._open.check_memory_usage(self._ops_snapshot())
        return out

    def query(self, name: str, query_vector, preliminary_top_k: int | None = None, final_top_k: int = 100):
        return self.get_db(name).query(
            query_vector, preliminary_top_k=preliminary_top_k, final_top_k=final_top_k
        )

    def batch_query(
        self,
        name: str,
        query_vectors,
        preliminary_top_k: int | None = None,
        final_top_k: int = 100,
        metadata_filter: str | None = None,
    ) -> list[dict]:
        """Beyond-reference: many queries in ONE Spark job.

        The reference serves one vector per POST; a Spark engine's
        throughput comes from batching (amortized ms/query is the headline
        bench metric — job-scheduling overhead is paid once per batch, not
        per query). Returns one reference-shaped result dict per input
        vector, in input order.
        """
        import json as _json

        db = self.get_db(name)
        # resident snapshot first (bit-identical, no Spark job) — None
        # when no snapshot is pinned or a metadata_filter needs Spark
        local = db.query_batch_local(
            query_vectors,
            preliminary_top_k=preliminary_top_k,
            final_top_k=final_top_k,
            metadata_filter=metadata_filter,
        )
        if local is not None:
            return [
                {
                    "ids": r["ids"],
                    "metadata": [
                        _json.loads(m) if m else {} for m in r["metadata"]
                    ],
                    "cosine_similarity": r["cosine_similarity"],
                }
                for r in local
            ]
        rows = db.query_df(
            query_vectors,
            preliminary_top_k=preliminary_top_k,
            final_top_k=final_top_k,
            metadata_filter=metadata_filter,
        ).collect()
        n = len(query_vectors)
        out = [
            {"ids": [], "metadata": [], "cosine_similarity": []} for _ in range(n)
        ]
        by_q: dict[int, list] = {}
        for r in rows:
            by_q.setdefault(r.query_id, []).append(r)
        for qid, rs in by_q.items():
            rs.sort(key=lambda r: (-r.cosine_similarity, r.id))
            out[qid] = {
                "ids": [r.id for r in rs],
                "metadata": [_json.loads(r.metadata) if r.metadata else {} for r in rs],
                "cosine_similarity": [r.cosine_similarity for r in rs],
            }
        return out

    def train(self, name: str, block: bool = True, **kwargs) -> None:
        """(Re)train; ``block=False`` runs on a background thread (the
        reference's POST /train). Either way a concurrent request while a
        train is in progress raises :class:`TrainingInProgressError`."""
        db = self.get_db(name)  # 404-analog raises before state changes
        with self._train_lock:
            if self._train_ops.get(name) == "in progress":
                raise TrainingInProgressError(
                    "This database is in the process of training already"
                )
            self._train_ops[name] = "in progress"
            self._train_errors.pop(name, None)
            # generation token: a delete_db bumps it, so a doomed run's
            # completion cannot resurrect state onto a recreated name
            gen = self._train_gen.get(name, 0) + 1
            self._train_gen[name] = gen

        def _run(reraise: bool = True) -> None:
            try:
                db.train(**kwargs)
            except BaseException as e:  # noqa: BLE001 — state must reflect ANY failure
                with self._train_lock:
                    if self._train_gen.get(name) == gen:
                        self._train_ops[name] = "failed"
                        self._train_errors[name] = f"{type(e).__name__}: {e}"
                # blocking callers get the exception; the background path
                # records it in the state machine (train_error) instead of
                # dying as an unhandled thread exception — a delete-while-
                # training rmtree race is survivable by design (ref
                # test_delete_while_training.py)
                if reraise:
                    raise
            else:
                with self._train_lock:
                    if self._train_gen.get(name) == gen:
                        self._train_ops[name] = "complete"

        if block:
            _run()
            return
        t = threading.Thread(
            target=_run, args=(False,), name=f"mindb-train-{name}", daemon=True
        )
        self._train_threads[name] = t
        t.start()

    def wait_for_training(self, name: str, timeout: float | None = None) -> str:
        """Join the background training thread; returns the final status."""
        t = self._train_threads.get(name)
        if t is not None:
            t.join(timeout)
        return self.train_status(name)

    def train_status(self, name: str) -> str:
        """Reference state strings (fastapi.py operations dict): "not
        started"-analog is "untrained"; then "in progress" → "complete" |
        "failed"."""
        with self._train_lock:
            op = self._train_ops.get(name)
        if op is not None:
            return op
        db = self.get_db(name)
        return "complete" if db.is_trained else "untrained"

    def train_error(self, name: str) -> str | None:
        """The failure message when ``train_status`` is "failed"."""
        with self._train_lock:
            return self._train_errors.get(name)

    # -------------------------------------------------------- auto-train
    def initial_training_queue(self) -> list[str]:
        """Databases big enough for a first index (ref training_utils.py:148-167)."""
        out = []
        for name in self.list_dbs():
            db = self.get_db(name)
            if needs_initial_training(db.num_vectors_fast, db.is_trained, False):
                out.append(name)
        return out

    def find_indexes_to_train(self) -> list[str]:
        """Initial + stale (coverage < 0.5) databases (ref :169-188)."""
        out = []
        for name in self.list_dbs():
            db = self.get_db(name)
            if needs_initial_training(db.num_vectors_fast, db.is_trained, False) or (
                db.is_trained
                and needs_retraining(db.num_vectors_fast, db.coverage_ratio(), False)
            ):
                out.append(name)
        return out

    def auto_train_sweep(self, **train_kwargs) -> list[str]:
        """Train everything the policy flags; returns the trained names."""
        names = self.find_indexes_to_train()
        for name in names:
            self.get_db(name).train(**train_kwargs)
        return names
