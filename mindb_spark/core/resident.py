"""RAM-resident serving snapshot: reference-parity point-query latency.

The reference serves every query from an in-RAM index held in its DB LRU
cache (``mindb/mindb.py`` keeps Faiss + vectors resident; its CI pins
< 65 ms/query over REST, ``tests/integration/test_fastapi.py:194``). The
Spark engine's scan path is the 100 TB-scale design — but a *point*
query through it pays 4-6 Spark stages of job scheduling (~1.2 s floor
measured on a warm 30k index, PERF_NOTES "REST latency probe"),
corpus-size-independent and irreducible from SQL.

This module makes the same trade the reference makes — RAM for serving
latency — WITHOUT giving up the Spark path:

- ``ResidentSnapshot.build(db)`` collects the trained codes table
  (joined against the live vectors table, so deleted rows drop out
  exactly like stage 2's inner join) plus the unindexed tail into
  driver numpy arrays, CSR-sliced by cell. One Spark job, RAM-bounded
  by an explicit byte budget checked BEFORE the collect.
- ``snapshot.query(...)`` replays the scan kernel's exact math
  driver-side: same float32 decomposed-ADC accumulation order
  (d2 + bterm + per-subspace gathers, ``index/ivf.py adc_candidates``),
  same (adc_dist asc, id asc) preliminary cut, same float64 einsum
  exact rerank, same (cosine desc, id asc) final cut — bit-identical
  results to the Spark two-stage path by construction (pinned by
  ``tests/test_resident.py``).
- Staleness: the snapshot records the manifest counters it was built
  from. Post-pin ADDS only grow the tail → the snapshot refreshes just
  the tail block (one cheap pruned scan). DELETES of trained rows set a
  tombstone mask (``refresh_deletes``: one id-column scan — at 10M rows
  ~80 MB of ids vs the multi-GB vector reload a rebuild pays) until the
  dead fraction passes ``_REBUILD_DEAD_FRACTION``; only a retrain or a
  mask that dense forces a full rebuild. ``VectorDB.query`` checks
  validity under the handle lock before every resident serve and falls
  back to the Spark path whenever the snapshot cannot be (re)validated
  within budget.

The snapshot is the SERVING-TIER cache for RAM-sized indexes (the only
regime the reference supports at all); beyond-RAM corpora stay on the
Spark scan path, which is the point of this engine.
"""

from __future__ import annotations

import os

import numpy as np

from mindb_spark.index import pq as PQ


def _lex_top(primary: np.ndarray, ids: np.ndarray, k: int) -> np.ndarray:
    """Indices of the k smallest by (primary asc, id asc), matching
    Spark's row_number() window exactly.

    argpartition pre-cut + exact lexsort of only the boundary set: a
    full lexsort over the ~n_probe x rows/cell candidate pool dominated
    the 10M point query (~60 ms of the ~170 ms total); the pre-cut is
    tie-exact because every row with primary <= tau (the kth partition
    value) survives into the final sort."""
    n = primary.size
    if n <= k:
        return np.lexsort((ids, primary))
    part = np.argpartition(primary, k - 1)
    tau = primary[part[k - 1]]
    cand = np.flatnonzero(primary <= tau)
    order = np.lexsort((ids[cand], primary[cand]))[:k]
    return cand[order]


class ResidentSnapshot:
    """Immutable driver-side snapshot of one trained DB (see module doc)."""

    # dead fraction above which refresh_deletes refuses and the caller
    # rebuilds: past this point the snapshot wastes enough RAM (and every
    # query wastes enough masked gather work) that the one-off reload wins
    _REBUILD_DEAD_FRACTION = 0.10

    def __init__(
        self,
        artifacts,
        n_probe: int,
        ids: np.ndarray,
        codes: np.ndarray,
        bterm: np.ndarray,
        cell_ids: np.ndarray,
        cell_off: np.ndarray,
        vectors: np.ndarray,
        metadata: np.ndarray,
        tail_ids: np.ndarray,
        tail_vectors: np.ndarray,
        tail_metadata: np.ndarray,
        fingerprint: tuple,
        live_mask: np.ndarray | None = None,
    ):
        self.artifacts = artifacts
        self.n_probe = n_probe
        self.ids = ids                  # (n,) int64, grouped by cell
        self.codes = codes              # (n, m) uint8
        self.bterm = bterm              # (n,) float32
        self.cell_ids = cell_ids        # (ncells,) distinct cells, ascending
        self.cell_off = cell_off        # (ncells+1,) CSR row offsets
        self.vectors = vectors          # (n, d) float64 (unit-normalized)
        self.metadata = metadata        # (n,) object
        self.tail_ids = tail_ids        # rows with id > max_trained_id
        self.tail_vectors = tail_vectors
        self.tail_metadata = tail_metadata
        self.fingerprint = fingerprint  # manifest counters at build time
        # tombstone mask over the indexed rows (None = all live): rows
        # deleted SINCE the build are masked out of every query without
        # touching the big shared arrays — identical results to a fresh
        # rebuild because masking preserves the CSR's (cell, id) order
        self.live_mask = live_mask

    # ------------------------------------------------------------ sizing
    @staticmethod
    def estimate_bytes(n: int, d: int, m: int, avg_meta: int = 256) -> int:
        """Pre-collect RAM estimate: ids + codes + bterm + float64 vectors
        + metadata strings (``avg_meta`` bytes/row assumed)."""
        return int(n * (8 + m + 4 + 8 * d + avg_meta))

    @staticmethod
    def estimate_tail_bytes(n: int, d: int, avg_meta: int = 256) -> int:
        """Pre-collect RAM estimate of a tail block (no codes/bterm)."""
        return int(n * (8 + 8 * d + avg_meta))

    def nbytes(self) -> int:
        base = (
            self.ids.nbytes + self.codes.nbytes + self.bterm.nbytes
            + self.vectors.nbytes + self.tail_ids.nbytes
            + self.tail_vectors.nbytes
        )
        if self.live_mask is not None:
            base += self.live_mask.nbytes
        meta = sum(len(s) if s else 0 for s in self.metadata)
        meta += sum(len(s) if s else 0 for s in self.tail_metadata)
        return int(base + meta)

    # ----------------------------------------------------- save / load
    # Multi-process serving support (round 9, VERDICT r8 #7): one
    # assemble, N serving processes. ``save`` writes each array as its
    # own .npy so ``load(mmap=True)`` maps the big blocks (vectors,
    # codes, ids) read-only — N workers then share ONE physical copy
    # through the OS page cache instead of N heap copies. Metadata is
    # the exception: it is an object array of JSON strings, so it is
    # pickled and materialized per process (~256 B/row vs the 8·d ≈ 6 KB
    # vector row at 768-d — the shared blocks are what matter).
    _ARRAYS = (
        "ids", "codes", "bterm", "cell_ids", "cell_off", "vectors",
        "tail_ids", "tail_vectors",
    )

    def save(self, path: str) -> None:
        """Persist the snapshot to a directory (arrays + artifacts +
        manifest counters) for out-of-process loading."""
        import json as _json

        os.makedirs(path, exist_ok=True)
        for name in self._ARRAYS:
            np.save(os.path.join(path, f"{name}.npy"), getattr(self, name))
        np.save(
            os.path.join(path, "metadata.npy"), self.metadata,
            allow_pickle=True,
        )
        np.save(
            os.path.join(path, "tail_metadata.npy"), self.tail_metadata,
            allow_pickle=True,
        )
        mask_path = os.path.join(path, "live_mask.npy")
        if self.live_mask is not None:
            np.save(mask_path, self.live_mask)
        elif os.path.exists(mask_path):
            # saving a mask-free snapshot over a directory that previously
            # held a masked one must not let load() resurrect the stale
            # tombstones and drop live rows (ADVICE r9)
            os.remove(mask_path)
        self.artifacts.save(os.path.join(path, "artifacts.npz"))
        with open(os.path.join(path, "meta.json"), "w") as f:
            _json.dump(
                {"n_probe": int(self.n_probe),
                 "fingerprint": list(self.fingerprint)},
                f,
            )

    @classmethod
    def load(cls, path: str, mmap: bool = True) -> "ResidentSnapshot":
        """Load a saved snapshot; ``mmap=True`` maps the numeric arrays
        read-only (page-cache-shared across processes)."""
        import json as _json

        from mindb_spark.index.build import IndexArtifacts

        mode = "r" if mmap else None
        arrs = {
            name: np.load(os.path.join(path, f"{name}.npy"), mmap_mode=mode)
            for name in cls._ARRAYS
        }
        meta = np.load(os.path.join(path, "metadata.npy"), allow_pickle=True)
        tail_meta = np.load(
            os.path.join(path, "tail_metadata.npy"), allow_pickle=True
        )
        mask_path = os.path.join(path, "live_mask.npy")
        mask = np.load(mask_path, mmap_mode=mode) if os.path.exists(mask_path) else None
        with open(os.path.join(path, "meta.json")) as f:
            info = _json.load(f)
        return cls(
            IndexArtifacts.load(os.path.join(path, "artifacts.npz")),
            int(info["n_probe"]),
            arrs["ids"], arrs["codes"], arrs["bterm"],
            arrs["cell_ids"], arrs["cell_off"], arrs["vectors"],
            meta, arrs["tail_ids"], arrs["tail_vectors"], tail_meta,
            tuple(info["fingerprint"]),
            live_mask=mask,
        )

    # ------------------------------------------------------------- build
    @staticmethod
    def manifest_fingerprint(manifest: dict) -> tuple:
        """Counters that change whenever the served result could change."""
        return (
            manifest.get("index_version"),
            manifest.get("max_id"),
            manifest.get("max_trained_id"),
            manifest.get("num_new_vectors"),
            manifest.get("num_vectors_trained_on"),
            manifest.get("num_trained_vectors_removed"),
            # n_probe is baked into the snapshot at assemble time, so a
            # recall-gate boost recorded after this snapshot was pinned
            # must stale it (prelim is per-call and needs no fingerprint)
            manifest.get("n_probe_default"),
        )

    @classmethod
    def build(cls, db, max_bytes: int | None) -> "ResidentSnapshot | None":
        """Collect the snapshot from ``db`` (a trained VectorDB).

        Returns None when the pre-collect estimate exceeds ``max_bytes``
        — the caller stays on the Spark path. Cites the reference's
        resident-DB design: ``mindb/mindb.py`` (Faiss + vector store in
        RAM per open DB), budgeted by the same LRU cache this engine
        re-implements in ``core/cache.py``.
        """
        from pyspark.sql import functions as F

        manifest = dict(db._manifest)
        if manifest.get("index_version") is None:
            return None
        artifacts = db._load_artifacts()
        d = int(db.vector_dimension)
        m = int(artifacts.m)
        n_est = int(manifest.get("num_vectors_trained_on") or 0)
        # the tail is part of the snapshot: ids grow monotonically, so
        # (max_id - max_trained_id) bounds the tail row count — a corpus
        # trained small then grown by streaming adds must not blow the
        # budget through the tail collect
        tail_bound = max(
            0, int(manifest.get("max_id", -1)) - int(manifest.get("max_trained_id", -1))
        )
        est = cls.estimate_bytes(n_est, d, m) + cls.estimate_tail_bytes(tail_bound, d)
        if max_bytes is not None and est > max_bytes:
            return None

        live = db.vectors().select("id", "vector", "metadata")
        codes_dir = os.path.join(db._index_dir, "codes")
        codes_df = db.spark.read.parquet(codes_dir)
        cols = ["cluster_id", "id", "code"]
        has_bterm = "bterm" in codes_df.columns
        if has_bterm:
            cols.append("bterm")
        watermark = int(manifest["max_trained_id"])
        # watermark filter mirrors ivf.search: codes rows above it belong
        # to the tail block (a racing append); inner join drops deletes.
        # dropDuplicates is the same crash-dup insurance both Spark paths
        # carry: a codes append whose manifest save never landed can
        # duplicate an id, and an undeduped snapshot would emit that id
        # in two of the final_top_k slots
        # Arrow collect: the table lands as contiguous buffers (ids/bterm/
        # codes/vectors each one block) that the snapshot arrays VIEW
        # zero-copy — a Row collect materializes ~10x the data size in
        # Python objects (a 1M x 768-d snapshot would transiently need
        # tens of GB of Rows vs ~6 GB of Arrow buffers)
        table = (
            codes_df.select(*cols)
            .where(F.col("id") <= watermark)
            .dropDuplicates(["id"])
            .join(live, "id")
            .orderBy("cluster_id", "id")
            .toArrow()
        )
        t_ids, t_vecs, t_meta = cls._collect_tail(live, watermark, d)
        return cls.assemble_from_arrow(
            artifacts,
            # the recall gate's measured boost (when recorded) is the
            # query-time default, same resolution as VectorDB.query_df
            int(
                manifest.get("n_probe_default")
                or manifest["index_params"]["n_probe"]
            ),
            table, d, m, has_bterm,
            t_ids, t_vecs, t_meta,
            cls.manifest_fingerprint(manifest),
        )

    @classmethod
    def assemble(
        cls,
        artifacts,
        n_probe: int,
        rows,
        d: int,
        m: int,
        has_bterm: bool,
        t_ids=None,
        t_vecs=None,
        t_meta=None,
        fingerprint: tuple = (),
    ) -> "ResidentSnapshot":
        """Build the snapshot arrays from collected codes-join rows
        (``cluster_id, id, code[, bterm], vector, metadata`` — SORTED by
        (cluster_id, id)). Shared by :meth:`build` and out-of-DB callers
        (e.g. bench probes over a raw ``build_index`` output)."""
        n = len(rows)
        ids = np.fromiter((r.id for r in rows), dtype=np.int64, count=n)
        cells = np.fromiter((r.cluster_id for r in rows), dtype=np.int64, count=n)
        codes = (
            np.frombuffer(b"".join(bytes(r.code) for r in rows), dtype=np.uint8)
            .reshape(n, m)
            if n
            else np.empty((0, m), dtype=np.uint8)
        )
        vectors = np.array([r.vector for r in rows], dtype=np.float64).reshape(n, d)
        metadata = np.array(
            [getattr(r, "metadata", None) for r in rows], dtype=object
        )
        bterm = (
            np.fromiter((r.bterm for r in rows), dtype=np.float32, count=n)
            if has_bterm else None
        )
        return cls._from_arrays(
            artifacts, n_probe, ids, cells, codes, bterm, vectors, metadata,
            d, m, t_ids, t_vecs, t_meta, fingerprint,
        )

    @classmethod
    def assemble_from_arrow(
        cls,
        artifacts,
        n_probe: int,
        table,
        d: int,
        m: int,
        has_bterm: bool,
        t_ids=None,
        t_vecs=None,
        t_meta=None,
        fingerprint: tuple = (),
    ) -> "ResidentSnapshot":
        """Build the snapshot from an Arrow table of codes-join rows
        (``cluster_id, id, code[, bterm], vector, metadata``, SORTED by
        (cluster_id, id)). The numeric arrays are zero-copy VIEWS over
        the table's buffers (the views keep the buffers alive), so peak
        driver memory is ~the data size, not the Row-object blowup."""
        from mindb_spark import arrowkit as AK

        n = table.num_rows
        # primitive columns: ChunkedArray.to_numpy concatenates in numpy
        # (no Arrow offset arithmetic); list/binary matrix columns go
        # through the chunk-safe flattener — combine_chunks on a 3M x
        # 768 vector column overflows the 32-bit list offsets (2.3B
        # child doubles > 2^31, observed as "offset overflow while
        # concatenating arrays" on the first 3M assemble)
        ids = table.column("id").to_numpy(
            zero_copy_only=False).astype(np.int64, copy=False)
        cells = table.column("cluster_id").to_numpy(
            zero_copy_only=False).astype(np.int64, copy=False)
        codes = AK.fixed_width_matrix_chunked(table.column("code"), m)
        if codes is None:  # ragged/null codes: impossible post-build, but safe
            codes = np.frombuffer(
                b"".join(bytes(c) for c in table.column("code").to_pylist()),
                dtype=np.uint8,
            ).reshape(n, m) if n else np.empty((0, m), dtype=np.uint8)
        vectors = AK.fixed_width_matrix_chunked(table.column("vector"), d)
        if vectors is None:
            vectors = np.array(
                table.column("vector").to_pylist(), dtype=np.float64
            ).reshape(n, d)
        vectors = vectors.astype(np.float64, copy=False)
        metadata = (
            table.column("metadata").to_numpy(zero_copy_only=False)
            if "metadata" in table.column_names
            else np.array([None] * n, dtype=object)
        )
        bterm = (
            table.column("bterm").to_numpy(
                zero_copy_only=False).astype(np.float32, copy=False)
            if has_bterm else None
        )
        return cls._from_arrays(
            artifacts, n_probe, ids, cells, codes, bterm, vectors, metadata,
            d, m, t_ids, t_vecs, t_meta, fingerprint,
        )

    @classmethod
    def _from_arrays(
        cls, artifacts, n_probe, ids, cells, codes, bterm, vectors, metadata,
        d, m, t_ids, t_vecs, t_meta, fingerprint,
    ) -> "ResidentSnapshot":
        n = ids.size
        if bterm is None:
            # legacy codes tables: materialize the per-row cell term once
            # (query-independent; same math as the scan kernel's fallback)
            bterm = np.empty(n, dtype=np.float32)
            cb = artifacts.codebooks.astype(np.float64)
            dsub = cb.shape[2]
            for c in np.unique(cells):
                sel = cells == c
                cmat = artifacts.centroids[int(c)].reshape(m, dsub)
                B = (2.0 * np.einsum("jd,jkd->jk", cmat, cb)).astype(np.float32)
                bterm[sel] = PQ.adc_scan(codes[sel], B)

        # CSR over the cell-grouped rows
        seg = np.flatnonzero(np.r_[True, cells[1:] != cells[:-1]]) if n else np.array([], dtype=np.int64)
        cell_ids = cells[seg] if n else np.array([], dtype=np.int64)
        cell_off = np.r_[seg, n].astype(np.int64) if n else np.array([0], dtype=np.int64)

        empty_i = np.array([], dtype=np.int64)
        return cls(
            artifacts, n_probe,
            ids, codes, bterm, cell_ids, cell_off, vectors, metadata,
            t_ids if t_ids is not None else empty_i,
            t_vecs if t_vecs is not None else np.empty((0, d), dtype=np.float64),
            t_meta if t_meta is not None else np.array([], dtype=object),
            fingerprint,
        )

    @staticmethod
    def _collect_tail(live, watermark: int, d: int):
        from pyspark.sql import functions as F

        from mindb_spark import arrowkit as AK

        tail = live.where(F.col("id") > watermark).toArrow()
        n = tail.num_rows
        t_ids = AK.one_chunk(tail.column("id")).to_numpy(
            zero_copy_only=False).astype(np.int64, copy=False)
        t_vecs = AK.fixed_width_matrix(AK.one_chunk(tail.column("vector")), d)
        if t_vecs is None:
            t_vecs = np.array(
                tail.column("vector").to_pylist(), dtype=np.float64
            ).reshape(n, d)
        t_vecs = t_vecs.astype(np.float64, copy=False)
        t_meta = AK.one_chunk(tail.column("metadata")).to_numpy(
            zero_copy_only=False)
        return t_ids, t_vecs, t_meta

    def refresh_tail(self, db, max_bytes: int | None = None) -> "ResidentSnapshot | None":
        """Cheap revalidation when only the UNINDEXED part changed (adds,
        or removals of tail-only rows): reload just the tail block (ids
        above the indexed watermark) from the live table. Returns a NEW
        snapshot sharing the big indexed arrays (so a concurrently
        serving thread never observes torn tail state), or None when the
        indexed set itself changed (retrain / trained-row delete) OR the
        tail bound no longer fits ``max_bytes`` — caller falls back to a
        budgeted full rebuild (which re-checks the same bound)."""
        manifest = dict(db._manifest)
        new_fp = self.manifest_fingerprint(manifest)
        old = self.fingerprint
        # positions: 0 index_version, 2 max_trained_id,
        # 4 num_vectors_trained_on, 5 num_trained_vectors_removed —
        # unchanged means the indexed rows this snapshot holds are still
        # exactly the indexed rows; everything else lives in the tail
        if (new_fp[0], new_fp[2], new_fp[4], new_fp[5]) != (
            old[0], old[2], old[4], old[5]
        ):
            return None
        dim = self.vectors.shape[1] if self.vectors.size else int(db.vector_dimension)
        tail_bound = max(
            0, int(manifest.get("max_id", -1)) - int(manifest.get("max_trained_id", -1))
        )
        # same conservative estimate basis as build()'s pre-collect gate,
        # so enable/refresh/rebuild enforce ONE budget rule
        est = self.estimate_bytes(
            int(self.ids.size), dim, int(self.codes.shape[1])
        ) + self.estimate_tail_bytes(tail_bound, dim)
        if max_bytes is not None and est > max_bytes:
            return None
        watermark = int(manifest["max_trained_id"])
        t_ids, t_vecs, t_meta = self._collect_tail(
            db.vectors().select("id", "vector", "metadata"), watermark, dim
        )
        return ResidentSnapshot(
            self.artifacts, self.n_probe,
            self.ids, self.codes, self.bterm, self.cell_ids, self.cell_off,
            self.vectors, self.metadata, t_ids, t_vecs, t_meta, new_fp,
            live_mask=self.live_mask,
        )

    def refresh_deletes(
        self, db, max_bytes: int | None = None
    ) -> "ResidentSnapshot | None":
        """Tombstone-mask revalidation when trained rows were DELETED
        (and any mix of adds/tail deletes happened alongside): one
        id-column scan recomputes which snapshot rows are still live —
        at 10M rows that collects ~80 MB of ids instead of re-reading
        multi-GB of vectors+metadata (measured ≫10x cheaper than
        ``build``, PERF_NOTES). The big arrays are SHARED with the old
        snapshot; only the boolean mask and the tail block are new, so a
        concurrently serving thread never observes torn state.

        Returns None — caller falls back to a full rebuild — when the
        indexed set itself was re-trained (fingerprint positions 0/2/4),
        when the dead fraction passes ``_REBUILD_DEAD_FRACTION`` (the
        snapshot would waste RAM and per-query gather work), or when the
        budget no longer fits."""
        from pyspark.sql import functions as F

        manifest = dict(db._manifest)
        new_fp = self.manifest_fingerprint(manifest)
        old = self.fingerprint
        # 0 index_version, 2 max_trained_id, 4 num_vectors_trained_on:
        # unchanged means the snapshot's indexed ROWS are still the
        # index's rows — deletions only shrink the live subset, which the
        # mask expresses. (Position 5, num_trained_vectors_removed, is
        # exactly what this path absorbs; 1/3 are tail growth.)
        if (new_fp[0], new_fp[2], new_fp[4]) != (old[0], old[2], old[4]):
            return None
        dim = self.vectors.shape[1] if self.vectors.size else int(db.vector_dimension)
        tail_bound = max(
            0, int(manifest.get("max_id", -1)) - int(manifest.get("max_trained_id", -1))
        )
        est = self.estimate_bytes(
            int(self.ids.size), dim, int(self.codes.shape[1])
        ) + self.estimate_tail_bytes(tail_bound, dim)
        if max_bytes is not None and est > max_bytes:
            return None
        watermark = int(manifest["max_trained_id"])
        live = db.vectors().select("id", "vector", "metadata")
        # column-pruned scan: only the id column leaves parquet, and it
        # leaves as ONE Arrow/pandas int64 block (8 bytes/id — ~80 MB at
        # 10M rows) rather than a Row object per id (~10x that transient
        # footprint). No assume_unique: if the vectors table ever carries
        # a duplicate id (the crash-dup shape), isin must still be exact.
        live_ids = (
            live.select("id")
            .where(F.col("id") <= watermark)
            .toPandas()["id"]
            .to_numpy(dtype=np.int64)
        )
        mask = np.isin(self.ids, live_ids)
        dead = int(self.ids.size - mask.sum())
        if self.ids.size and dead / self.ids.size > self._REBUILD_DEAD_FRACTION:
            return None
        t_ids, t_vecs, t_meta = self._collect_tail(live, watermark, dim)
        return ResidentSnapshot(
            self.artifacts, self.n_probe,
            self.ids, self.codes, self.bterm, self.cell_ids, self.cell_off,
            self.vectors, self.metadata, t_ids, t_vecs, t_meta, new_fp,
            live_mask=None if dead == 0 else mask,
        )

    # ------------------------------------------------------------- query
    def query(
        self,
        query_vectors: np.ndarray,
        preliminary_top_k: int = 500,
        final_top_k: int = 100,
        n_probe: int | None = None,
    ) -> list[dict]:
        """Serve a (Q, d) float batch; one reference-shaped dict per query
        (``{ids, metadata, cosine_similarity}``), bit-identical to a fresh
        rebuild / the Spark two-stage path on the same live set (same
        kernels, same cut orders). Caveat when serving through a DELETE
        tombstone mask with a saturated ``preliminary_top_k``: the Spark
        path lets deleted ids occupy stage-1 prelim slots (dropped only
        at the stage-2 join) while the mask prelim-cuts over live rows
        only, so the masked snapshot can return MORE live results — it
        matches a fresh rebuild, not the slot-starved Spark answer
        (pinned by tests/test_resident.py::test_tight_prelim_semantics).

        Small batches pin BLAS to one thread for the call: every GEMM
        on the point-query path is tiny (project (Q,d)x(d,p), centroid
        ranking (Q,p)x(p,k), per-subspace ADC tables), and a
        multi-threaded BLAS pool pays fork/join PER CALL — measured
        3.8 ms vs 0.39 ms for the 57.6k-shape centroid ranking alone
        (round 7). Larger batches amortize the fork and can genuinely
        use the threads (centroid ranking grows with Q x k), so they
        keep the process default."""
        qmat = np.asarray(query_vectors, dtype=np.float64)
        if qmat.ndim == 1:
            qmat = qmat[None, :]
        if qmat.shape[0] <= self._BLAS_PIN_MAX_Q:
            from mindb_spark.index.pq import _single_threaded_blas

            with _single_threaded_blas():
                return self._query_impl(
                    qmat, preliminary_top_k, final_top_k, n_probe
                )
        return self._query_impl(qmat, preliminary_top_k, final_top_k, n_probe)

    # point/small-batch regime bound for the BLAS pin above
    _BLAS_PIN_MAX_Q = 32

    def _query_impl(
        self,
        qmat: np.ndarray,
        preliminary_top_k: int,
        final_top_k: int,
        n_probe: int | None,
    ) -> list[dict]:
        from mindb_spark.index.ivf import rank_centroids_chunked

        if qmat.ndim == 1:
            qmat = qmat[None, :]
        norms = np.linalg.norm(qmat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        qnorm = qmat / norms
        n_probe = n_probe or self.n_probe

        proj = self.artifacts.project(qnorm)
        probed, probed_d2 = rank_centroids_chunked(
            proj, self.artifacts.centroids, n_probe
        )
        A = PQ.adc_query_tables(proj, self.artifacts.codebooks)  # (Q, m, 256)
        m = A.shape[1]

        out = []
        for qi in range(qnorm.shape[0]):
            # candidate rows of the probed cells, via the CSR slices
            pos = np.searchsorted(self.cell_ids, probed[qi])
            hit = (pos < self.cell_ids.size) & (
                self.cell_ids[np.minimum(pos, max(self.cell_ids.size - 1, 0))]
                == probed[qi]
            ) if self.cell_ids.size else np.zeros(probed.shape[1], dtype=bool)
            starts = self.cell_off[pos[hit]]
            ends = self.cell_off[pos[hit] + 1]
            counts = ends - starts
            total = int(counts.sum())
            if total:
                rows_idx = np.repeat(starts - np.r_[0, np.cumsum(counts)[:-1]], counts) + np.arange(total)
                # same float32 accumulation order as the scan kernel:
                # d = coarse-d2 gather; += bterm; += per-subspace gathers
                d = np.repeat(probed_d2[qi][hit].astype(np.float32), counts)
                if self.live_mask is not None:
                    # tombstone cut BEFORE scoring: identical to a fresh
                    # rebuild (masking preserves the CSR's (cell, id)
                    # order) and skips the dead rows' gather work
                    alive = self.live_mask[rows_idx]
                    rows_idx = rows_idx[alive]
                    d = d[alive]
                    total = int(rows_idx.size)
            if total:
                d += self.bterm[rows_idx]
                codes_rows = self.codes[rows_idx]
                for j in range(m):
                    d += A[qi, j][codes_rows[:, j]]
                cand_ids = self.ids[rows_idx]
                # float32 d sorts in the same order as its float64 cast
                # (monotone embedding), so the Spark path's float64
                # window cut is reproduced without the 4 MB astype copy
                keep = _lex_top(d, cand_ids, preliminary_top_k)
                kept_rows = rows_idx[keep]
                kept_ids = cand_ids[keep]
                # identical einsum signature to the Spark kernels
                # (ivf.rerank_exact / the fused scan) so the float64
                # reduction order — and thus the result — is bit-equal
                V = self.vectors[kept_rows]
                scores = np.einsum(
                    "ij,ij->i", V, np.broadcast_to(qnorm[qi], V.shape)
                )
                kept_meta = self.metadata[kept_rows]
            else:
                kept_ids = np.array([], dtype=np.int64)
                scores = np.array([], dtype=np.float64)
                kept_meta = np.array([], dtype=object)

            if self.tail_ids.size:
                t_scores = np.einsum(
                    "ij,ij->i",
                    self.tail_vectors,
                    np.broadcast_to(qnorm[qi], self.tail_vectors.shape),
                )
                t_keep = _lex_top(-t_scores, self.tail_ids, preliminary_top_k)
                kept_ids = np.r_[kept_ids, self.tail_ids[t_keep]]
                scores = np.r_[scores, t_scores[t_keep]]
                kept_meta = np.r_[kept_meta, self.tail_metadata[t_keep]]

            fin = _lex_top(-scores, kept_ids, final_top_k)
            out.append(
                {
                    "ids": [int(i) for i in kept_ids[fin]],
                    "metadata": list(kept_meta[fin]),
                    "cosine_similarity": [float(s) for s in scores[fin]],
                }
            )
        return out
