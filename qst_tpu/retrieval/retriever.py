"""Text-level retrieval service: encoder + exact index + persistence.

The serving-facing surface of the retrieval engine (the reference exposes
retrieval only inside its evaluator; a production framework needs a direct
query API): build an index from texts, persist/reload it, and search by
query text. The index artifact is a directory with the embedding matrix
(``.npy``), doc ids, and metadata — reloadable without re-encoding the
corpus.
"""

from __future__ import annotations

import json
import os
from typing import Any, List, Optional, Sequence, Tuple

import numpy as np

from qst_tpu.retrieval.index import ExactIndex

INDEX_FILE = "embeddings.npy"
IDS_FILE = "ids.json"
META_FILE = "index_meta.json"
PQ_CODES_FILE = "pq_codes.npy"
PQ_CODEBOOKS_FILE = "pq_codebooks.npy"
PQ_ROWS_FILE = "pq_refine_rows.npy"
PQ_ROTATION_FILE = "pq_rotation.npy"
IVF_CENTROIDS_FILE = "ivf_centroids.npy"
IVF_CELLS_FILE = "ivf_cells.npy"
IVF_CELL_IDS_FILE = "ivf_cell_ids.npy"
IVF_FILL_FILE = "ivf_fill.npy"
IVFPQ_CENTROIDS_FILE = "ivfpq_centroids.npy"
IVFPQ_CODES_FILE = "ivfpq_cell_codes.npy"
IVFPQ_CELL_IDS_FILE = "ivfpq_cell_ids.npy"
IVFPQ_CODEBOOKS_FILE = "ivfpq_codebooks.npy"
IVFPQ_FILL_FILE = "ivfpq_fill.npy"
IVFPQ_ROWS_FILE = "ivfpq_refine_rows.npy"


def save_index(path: str, embeddings: np.ndarray, ids: Sequence,
               metadata: Optional[dict] = None) -> None:
    os.makedirs(path, exist_ok=True)
    np.save(os.path.join(path, INDEX_FILE), np.asarray(embeddings))
    with open(os.path.join(path, IDS_FILE), "w") as f:
        json.dump(list(ids), f)
    with open(os.path.join(path, META_FILE), "w") as f:
        json.dump({"n_docs": int(len(ids)),
                   "dim": int(np.asarray(embeddings).shape[1]),
                   **(metadata or {})}, f)


def load_index(path: str, mesh=None,
               dtype: Optional[str] = None) -> Tuple[Any, dict]:
    """``dtype`` overrides the storage dtype at load time (e.g. serve an
    f32-saved index as bfloat16 or int8). An index SAVED as int8 carries
    its quantization scale in the metadata and reloads bit-exactly; one
    saved as "pq" reloads its codes + codebooks (+ refine rows when they
    were persisted) into a :class:`PQIndex` without retraining."""
    with open(os.path.join(path, IDS_FILE)) as f:
        ids = json.load(f)
    with open(os.path.join(path, META_FILE)) as f:
        meta = json.load(f)
    if meta.get("dtype") == "pq":
        if dtype not in (None, "pq"):
            raise ValueError(
                f"index at {path} was saved product-quantized; it cannot "
                f"be reloaded as {dtype}")
        from qst_tpu.retrieval.pq import PQIndex

        codes = np.load(os.path.join(path, PQ_CODES_FILE))
        cb = np.load(os.path.join(path, PQ_CODEBOOKS_FILE))
        rows_path = os.path.join(path, PQ_ROWS_FILE)
        rows = np.load(rows_path) if os.path.isfile(rows_path) else None
        rot_path = os.path.join(path, PQ_ROTATION_FILE)
        rot = np.load(rot_path) if os.path.isfile(rot_path) else None
        return PQIndex.from_codes(codes, cb, ids=ids, mesh=mesh,
                                  refine_rows=rows, rotation=rot), meta
    if dtype == "pq":
        raise ValueError(
            f"index at {path} was not saved product-quantized — rebuild "
            "it with index_dtype='pq'")
    if meta.get("dtype") == "ivf":
        if dtype not in (None, "ivf"):
            raise ValueError(
                f"index at {path} was saved as an IVF index; it cannot "
                f"be reloaded as {dtype}")
        from qst_tpu.retrieval.ivf import IVFIndex

        cells = np.load(os.path.join(path, IVF_CELLS_FILE))
        if meta.get("cells_dtype") == "bfloat16":
            import jax.numpy as jnp

            cells = cells.astype(jnp.bfloat16)
        return IVFIndex.from_arrays(
            np.load(os.path.join(path, IVF_CENTROIDS_FILE)), cells,
            np.load(os.path.join(path, IVF_CELL_IDS_FILE)),
            np.load(os.path.join(path, IVF_FILL_FILE)), ids=ids, mesh=mesh,
            default_n_probe=int(meta.get("n_probe", 8))), meta
    if dtype == "ivf":
        raise ValueError(
            f"index at {path} was not saved as an IVF index — rebuild "
            "it with index_dtype='ivf'")
    if meta.get("dtype") == "ivfpq":
        if dtype not in (None, "ivfpq"):
            raise ValueError(
                f"index at {path} was saved as an IVF-PQ index; it cannot "
                f"be reloaded as {dtype}")
        from qst_tpu.retrieval.ivfpq import IVFPQIndex

        rows_path = os.path.join(path, IVFPQ_ROWS_FILE)
        rows = np.load(rows_path) if os.path.isfile(rows_path) else None
        return IVFPQIndex.from_arrays(
            np.load(os.path.join(path, IVFPQ_CENTROIDS_FILE)),
            np.load(os.path.join(path, IVFPQ_CODES_FILE)),
            np.load(os.path.join(path, IVFPQ_CELL_IDS_FILE)),
            np.load(os.path.join(path, IVFPQ_CODEBOOKS_FILE)),
            np.load(os.path.join(path, IVFPQ_FILL_FILE)),
            ids=ids, mesh=mesh,
            default_n_probe=int(meta.get("n_probe", 8)),
            residual=bool(meta.get("residual", True)),
            refine_rows=rows, bits=int(meta.get("bits", 8))), meta
    if dtype == "ivfpq":
        raise ValueError(
            f"index at {path} was not saved as an IVF-PQ index — rebuild "
            "it with index_dtype='ivfpq'")
    if dtype == "streaming":
        # serve a saved corpus LARGER than HBM: the embedding matrix is
        # memory-mapped from disk and streamed through double-buffered
        # host→HBM tiles (StreamingExactIndex) instead of loaded resident
        if meta.get("dtype") == "int8":
            raise ValueError(
                "an int8-saved index uses its own quantization scale and "
                "cannot stream verbatim — save float embeddings (or use "
                "StreamingExactIndex.quantize_host for a streamable int8 "
                "corpus)")
        from qst_tpu.retrieval.streaming import StreamingExactIndex

        return StreamingExactIndex.from_npy(
            os.path.join(path, INDEX_FILE), ids=ids, mesh=mesh), meta
    emb = np.load(os.path.join(path, INDEX_FILE))
    if meta.get("dtype") == "int8" and emb.dtype == np.int8:
        if dtype not in (None, "int8"):
            raise ValueError(
                f"index at {path} was saved quantized (int8); it cannot "
                f"be reloaded as {dtype}")
        return ExactIndex(emb, ids=ids, mesh=mesh, dtype="int8",
                          int8_scale=meta["int8_scale"]), meta
    return ExactIndex(emb, ids=ids, mesh=mesh,
                      dtype=dtype or meta.get("dtype", "float32")), meta


def encode_keep_device(encode: Any, texts: list):
    """Call an encode FUNCTION keeping embeddings on device when it
    supports it (SentenceEncoder's ``convert_to_numpy=False``); plain
    ``encode(texts)`` callables (the duck-typed contract) still work. An
    EXPLICIT ``convert_to_numpy`` parameter is trusted outright; a bare
    ``**kwargs`` gets one guarded attempt, retried WITHOUT the kwarg only
    when the TypeError reads like a keyword rejection (it names the
    parameter or mentions "keyword"/"option") — a genuine bad-input
    TypeError re-raises instead of silently re-running a possibly
    50k-doc encode."""
    import inspect

    explicit = var_kw = False
    try:
        params = inspect.signature(encode).parameters
        explicit = "convert_to_numpy" in params
        var_kw = any(p.kind == inspect.Parameter.VAR_KEYWORD
                     for p in params.values())
    except (TypeError, ValueError):  # builtins / C callables
        pass
    if explicit:
        return encode(texts, convert_to_numpy=False)
    if var_kw:
        try:
            return encode(texts, convert_to_numpy=False)
        except TypeError as e:
            msg = str(e).lower()
            if not any(t in msg for t in ("convert_to_numpy", "keyword",
                                          "option")):
                raise
            return encode(texts)
    return encode(texts)


def _encode_device(encoder: Any, texts: list):
    """Encode via an encoder OBJECT's ``.encode``, device-resident when
    supported (see :func:`encode_keep_device`)."""
    return encode_keep_device(encoder.encode, texts)


class Retriever:
    """encode-and-search by text.

    encoder: anything with ``encode(texts) -> (N, D) np.ndarray``
    (qst_tpu.models.SentenceEncoder). Corpus docs may carry external ids.
    """

    def __init__(self, encoder: Any, mesh=None, score: str = "cos_sim",
                 reranker: Any = None, index_dtype: str = "float32",
                 pq_m: int = 48, pq_rotate: bool = False,
                 ivf_clusters: int = 256, ivf_probe: int = 8,
                 ivfpq_bits: int = 8):
        """reranker: optional cross-encoder with
        ``predict(pairs) -> scores`` (qst_tpu.models.CrossEncoder) for
        two-stage retrieval: dense top-N candidates → pair re-scoring.

        index_dtype: storage dtype for built/loaded indexes — "bfloat16"
        for MXU-rate scoring, "int8" for half the HBM again (2× corpus
        per chip, quantized-exact ranking; see ExactIndex), "pq" for a
        product-quantized index (``pq_m`` bytes/doc in HBM — 16× smaller
        than bf16 at the default m=48 — with the normalized originals
        kept in HOST RAM for exact top-k re-ranking; see PQIndex), or
        "ivfpq" for the hybrid (``pq_m`` bytes/doc in k-means cells —
        only the ``ivf_probe`` probed cells decode per query; see
        IVFPQIndex; ``ivfpq_bits=4`` switches to packed-nibble fast-scan
        codes at the same bytes/doc)."""
        self.encoder = encoder
        self.mesh = mesh
        self.score = score
        self.reranker = reranker
        self.index_dtype = index_dtype
        self.pq_m = pq_m
        self.pq_rotate = pq_rotate
        self.ivf_clusters = ivf_clusters
        self.ivf_probe = ivf_probe
        self.ivfpq_bits = ivfpq_bits
        self._index: Optional[Any] = None
        self._doc_texts: List[str] = []
        self._texts_by_id: dict = {}
        self._next_auto_id = 0
        self._pos_of: Optional[dict] = None

    @property
    def index(self) -> Optional[Any]:
        return self._index

    @index.setter
    def index(self, value) -> None:
        # direct assignment (retr.index = ExactIndex(...)) is a documented
        # pattern — invalidate the cached id→position map so a later
        # return_texts/rerank search can't map the NEW index's ids through
        # the OLD index's positions
        self._index = value
        self._pos_of = None

    def _pos(self) -> dict:
        """id → corpus position, built once per index (constructing a
        1M-entry dict per search call costs ~150 ms of pure Python — it
        dominated the serving load test before being cached)."""
        if self._pos_of is None:
            self._pos_of = {i: p for p, i in enumerate(self.index.ids)}
        return self._pos_of

    def build_updatable(self, docs: Sequence[str] = (),
                        ids: Optional[Sequence] = None,
                        capacity: int = 65536) -> "Retriever":
        """Serve a MUTABLE corpus: back the retriever with an
        :class:`UpdatableIndex` (fixed-capacity buffer, one compiled search
        program), then grow/shrink it online via :meth:`add_docs` /
        :meth:`remove_docs` — the RetrievalServer exposes these as
        POST/DELETE /docs. The buffer stores L2-normalized rows (cosine
        semantics); dot_score is accepted only for unit-norm embeddings
        (checked at build and on every add)."""
        from qst_tpu.retrieval.updatable import UpdatableIndex

        probe = np.asarray(self.encoder.encode(["dimension probe"]))
        self._check_updatable_score(probe)
        self.index = UpdatableIndex(int(probe.shape[1]), capacity=capacity)
        self._texts_by_id = {}
        self._next_auto_id = 0
        if docs:
            self.add_docs(docs, ids)
        return self

    def to_updatable(self, capacity: int = 0) -> "Retriever":
        """Convert a built/loaded STATIC index into an updatable one in
        place (reuses the existing embeddings — no re-encode): the serving
        path for ``index_main serve --updatable``. ``capacity`` defaults
        to 2× the corpus (min 65536)."""
        from qst_tpu.retrieval.updatable import UpdatableIndex

        if self.index is None:
            raise RuntimeError("no index built or loaded")
        if self._is_updatable():
            return self
        from qst_tpu.retrieval.pq import PQIndex

        from qst_tpu.retrieval.ivf import IVFIndex

        from qst_tpu.retrieval.ivfpq import IVFPQIndex

        if isinstance(self.index, (PQIndex, IVFPQIndex)):
            if self.index._refine_rows is not None:
                emb = self.index.refine_rows_f32()
            elif isinstance(self.index, IVFPQIndex):
                emb = self.index.reconstruct_rows()
            else:
                raise RuntimeError(
                    "a PQ index without refine rows holds only codes — "
                    "rebuild with keep_rows=True (the Retriever build "
                    "default) to convert to an updatable index")
        elif isinstance(self.index, IVFIndex):
            emb = self.index.reconstruct_rows()
        else:
            emb = np.asarray(self.index.embeddings,
                             np.float32)[: self.index.n_docs]
        self._check_updatable_score(emb)   # full corpus: one host pass
        ids = list(self.index.ids)
        capacity = capacity or max(65536, 2 * len(ids))
        new = UpdatableIndex(emb.shape[1], capacity=capacity)
        new.add(emb, ids)
        self._texts_by_id = (dict(zip(ids, self._doc_texts))
                             if self._doc_texts else {})
        self._next_auto_id = 1 + max(
            [-1] + [i for i in ids if isinstance(i, int)])
        self.index = new   # setter invalidates the id->position cache
        return self

    def _check_updatable_score(self, sample: np.ndarray) -> None:
        """The updatable buffer stores L2-normalized rows (cosine
        semantics). cos_sim is always fine; dot_score is only exact when
        the vectors are already unit-norm — otherwise normalization would
        silently rescale every dot score, changing rankings."""
        if self.score == "cos_sim":
            return
        if self.score != "dot_score":
            raise ValueError(
                "updatable retrieval serves cos_sim/dot_score only "
                f"(normalized buffer), got {self.score!r}")
        norms = np.linalg.norm(np.asarray(sample, np.float32), axis=-1)
        if norms.size and float(np.abs(norms - 1.0).max()) > 1e-2:
            raise ValueError(
                "dot_score over an updatable index needs unit-norm "
                "embeddings (the buffer normalizes rows, which would "
                "change non-normalized dot rankings) — use score='cos_sim' "
                "or normalize the encoder output")

    def _is_updatable(self) -> bool:
        from qst_tpu.retrieval.updatable import UpdatableIndex

        return isinstance(self.index, UpdatableIndex)

    def add_docs(self, docs: Sequence[str],
                 ids: Optional[Sequence] = None) -> list:
        """Add documents to an updatable index (encode → buffer write).
        → the assigned ids (auto-assigned ints when ``ids`` is None)."""
        if not self._is_updatable():
            raise RuntimeError(
                "add_docs needs an updatable index (build_updatable())")
        docs = list(docs)
        if ids is None:
            ids = list(range(self._next_auto_id,
                             self._next_auto_id + len(docs)))
        emb = np.asarray(self.encoder.encode(docs))
        if self.score == "dot_score":
            # every add re-validates: a single build-time probe can't
            # vouch for later embeddings' norms
            self._check_updatable_score(emb)
        self.index.add(emb, list(ids))        # validates before publish
        self._next_auto_id = max(
            [self._next_auto_id] + [i + 1 for i in ids
                                    if isinstance(i, int)])
        # in-place insertion is snapshot-safe (keys only APPEAR; readers
        # .get by id) and O(batch), unlike a full copy-on-write rebuild —
        # only removals must preserve the old map (see remove_docs)
        for i, t in zip(ids, docs):
            self._texts_by_id[i] = t
        return list(ids)

    def remove_docs(self, ids: Sequence) -> None:
        if not self._is_updatable():
            raise RuntimeError(
                "remove_docs needs an updatable index (build_updatable())")
        self.index.remove(list(ids))
        # copy-on-write (O(corpus), removals are the rare operation): an
        # in-flight search holding the PRE-remove snapshot keeps resolving
        # the removed docs' texts from the old map
        gone = set(ids)
        self._texts_by_id = {i: t for i, t in self._texts_by_id.items()
                             if i not in gone}

    def build(self, docs: Sequence[str],
              ids: Optional[Sequence] = None) -> "Retriever":
        # device-resident handoff: embeddings go encoder → HBM index with
        # no host round trip (encode(convert_to_numpy=False) keeps every
        # batch on device; the indexes consume jax arrays directly)
        emb = _encode_device(self.encoder, list(docs))
        ids = list(ids) if ids is not None else list(range(len(docs)))
        if self.index_dtype == "pq":
            from qst_tpu.retrieval.pq import PQIndex

            self.index = PQIndex(emb, m=self.pq_m, ids=ids, mesh=self.mesh,
                                 keep_rows=True, rotate=self.pq_rotate)
        elif self.index_dtype == "ivf":
            from qst_tpu.retrieval.ivf import IVFIndex

            self.index = IVFIndex(emb, n_clusters=self.ivf_clusters,
                                  ids=ids, mesh=self.mesh,
                                  default_n_probe=self.ivf_probe)
        elif self.index_dtype == "ivfpq":
            from qst_tpu.retrieval.ivfpq import IVFPQIndex

            self.index = IVFPQIndex(emb, n_clusters=self.ivf_clusters,
                                    m=self.pq_m, ids=ids, mesh=self.mesh,
                                    default_n_probe=self.ivf_probe,
                                    keep_rows=True, bits=self.ivfpq_bits)
        else:
            self.index = ExactIndex(emb, ids=ids, mesh=self.mesh,
                                    dtype=self.index_dtype)
        self._doc_texts = list(docs)
        return self

    def build_to_disk(self, docs: Sequence[str], path: str,
                      ids: Optional[Sequence] = None,
                      encode_batch: int = 8192) -> "Retriever":
        """Build a disk-backed index artifact INCREMENTALLY: documents are
        encoded in ``encode_batch``-text chunks and written straight into a
        memory-mapped ``embeddings.npy``, so corpora whose embedding matrix
        exceeds RAM/HBM can be indexed end-to-end (then served with
        ``index_dtype="streaming"`` — the artifact layout matches
        :meth:`save`, texts included). The retriever is left holding the
        memmap-backed :class:`StreamingExactIndex`."""
        from qst_tpu.retrieval.streaming import StreamingExactIndex

        docs = list(docs)
        if not docs:
            raise ValueError("no documents to index")
        ids = list(ids) if ids is not None else list(range(len(docs)))
        if len(ids) != len(docs):
            raise ValueError("ids length mismatch")
        os.makedirs(path, exist_ok=True)
        emb_path = os.path.join(path, INDEX_FILE)
        mm = None
        for lo in range(0, len(docs), encode_batch):
            chunk = np.asarray(
                self.encoder.encode(docs[lo:lo + encode_batch]), np.float32)
            if mm is None:
                mm = np.lib.format.open_memmap(
                    emb_path, mode="w+", dtype=np.float32,
                    shape=(len(docs), chunk.shape[1]))
            mm[lo:lo + chunk.shape[0]] = chunk
        mm.flush()
        with open(os.path.join(path, IDS_FILE), "w") as f:
            json.dump(ids, f)
        with open(os.path.join(path, META_FILE), "w") as f:
            json.dump({"n_docs": len(ids), "dim": int(mm.shape[1]),
                       "score": self.score}, f)
        with open(os.path.join(path, "docs.json"), "w") as f:
            json.dump(docs, f)
        del mm
        self.index = StreamingExactIndex.from_npy(emb_path, ids=ids,
                                                  mesh=self.mesh)
        self._doc_texts = docs
        return self

    def save(self, path: str) -> None:
        if self.index is None:
            raise RuntimeError("no index built")
        if self._is_updatable():
            # persist a static snapshot (reloads as an ExactIndex)
            buffer, ids, _ = self.index._state
            save_index(path, np.asarray(buffer)[: len(ids)], list(ids),
                       {"score": self.score})
            texts = [self._texts_by_id.get(i) for i in ids]
            if all(t is not None for t in texts):
                with open(os.path.join(path, "docs.json"), "w") as f:
                    json.dump(texts, f)
            return
        from qst_tpu.retrieval.ivf import IVFIndex
        from qst_tpu.retrieval.pq import PQIndex

        if isinstance(self.index, IVFIndex):
            # cells persist f32 (bf16 has no portable .npy encoding; the
            # dtype is recorded and reload re-casts)
            os.makedirs(path, exist_ok=True)
            cells = np.asarray(self.index.cells)
            cells_dtype = ("bfloat16" if cells.dtype != np.float32
                           else "float32")
            np.save(os.path.join(path, IVF_CELLS_FILE),
                    cells.astype(np.float32))
            np.save(os.path.join(path, IVF_CENTROIDS_FILE),
                    np.asarray(self.index.centroids, np.float32))
            np.save(os.path.join(path, IVF_CELL_IDS_FILE),
                    np.asarray(self.index.cell_ids, np.int32))
            np.save(os.path.join(path, IVF_FILL_FILE),
                    np.asarray(self.index.fill, np.int32))
            with open(os.path.join(path, IDS_FILE), "w") as f:
                json.dump(list(self.index.ids), f)
            with open(os.path.join(path, META_FILE), "w") as f:
                json.dump({"n_docs": int(self.index.n_docs),
                           "dim": int(cells.shape[-1]), "dtype": "ivf",
                           "cells_dtype": cells_dtype,
                           "n_probe": int(self.index.default_n_probe),
                           "cell_budget": int(self.index.cell_budget),
                           "score": self.score}, f)
            with open(os.path.join(path, "docs.json"), "w") as f:
                json.dump(self._doc_texts, f)
            return

        from qst_tpu.retrieval.ivfpq import IVFPQIndex

        if isinstance(self.index, IVFPQIndex):
            # the IVF-PQ artifact is cell codes (m bytes/doc) + centroids
            # + codebooks; refine rows persist like PQ's (int8 verbatim,
            # bf16 as f32 — reload re-cast is bit-exact)
            os.makedirs(path, exist_ok=True)
            np.save(os.path.join(path, IVFPQ_CODES_FILE),
                    np.asarray(self.index.cell_codes, np.uint8))
            np.save(os.path.join(path, IVFPQ_CELL_IDS_FILE),
                    np.asarray(self.index.cell_ids, np.int32))
            np.save(os.path.join(path, IVFPQ_CENTROIDS_FILE),
                    np.asarray(self.index.centroids, np.float32))
            np.save(os.path.join(path, IVFPQ_CODEBOOKS_FILE),
                    np.asarray(self.index.codebooks, np.float32))
            np.save(os.path.join(path, IVFPQ_FILL_FILE),
                    np.asarray(self.index.fill, np.int32))
            if self.index._refine_rows is not None:
                rows = self.index._refine_rows
                np.save(os.path.join(path, IVFPQ_ROWS_FILE),
                        rows if rows.dtype == np.int8
                        else np.asarray(rows, np.float32))
            with open(os.path.join(path, IDS_FILE), "w") as f:
                json.dump(list(self.index.ids), f)
            with open(os.path.join(path, META_FILE), "w") as f:
                json.dump({"n_docs": int(self.index.n_docs),
                           "dim": int(self.index.dim), "dtype": "ivfpq",
                           "m": int(self.index.m),
                           "bits": int(self.index.bits),
                           "residual": bool(self.index.residual),
                           "n_probe": int(self.index.default_n_probe),
                           "cell_budget": int(self.index.cell_budget),
                           "score": self.score,
                           "refine": self.index._refine_rows is not None},
                          f)
            with open(os.path.join(path, "docs.json"), "w") as f:
                json.dump(self._doc_texts, f)
            return

        if isinstance(self.index, PQIndex):
            # the PQ artifact is codes + codebooks (16× smaller than the
            # embedding matrix at m=48); refine rows persist as f32 (bf16
            # has no portable .npy encoding — the reload re-cast is
            # bit-exact) so reloaded searches re-rank identically
            os.makedirs(path, exist_ok=True)
            np.save(os.path.join(path, PQ_CODES_FILE),
                    np.asarray(self.index.codes)[: self.index.n_docs])
            np.save(os.path.join(path, PQ_CODEBOOKS_FILE),
                    np.asarray(self.index.codebooks, np.float32))
            if self.index._refine_rows is not None:
                rows = self.index._refine_rows
                # int8 rows persist verbatim (half the disk, reload keeps
                # the scale-127 scheme); bf16 persists as f32 (portable,
                # reload re-cast is bit-exact)
                np.save(os.path.join(path, PQ_ROWS_FILE),
                        rows if rows.dtype == np.int8
                        else np.asarray(rows, np.float32))
            if self.index._rotation is not None:
                np.save(os.path.join(path, PQ_ROTATION_FILE),
                        np.asarray(self.index._rotation, np.float32))
            with open(os.path.join(path, IDS_FILE), "w") as f:
                json.dump(list(self.index.ids), f)
            with open(os.path.join(path, META_FILE), "w") as f:
                json.dump({"n_docs": int(self.index.n_docs),
                           "dim": int(self.index.dim), "dtype": "pq",
                           "m": int(self.index.m), "score": self.score,
                           "refine": self.index._refine_rows is not None},
                          f)
            with open(os.path.join(path, "docs.json"), "w") as f:
                json.dump(self._doc_texts, f)
            return
        emb = np.asarray(self.index.embeddings)[: self.index.n_docs]
        meta = {"score": self.score}
        if emb.dtype == np.int8:
            # persist the quantized rows + scale: reloads bit-exactly
            meta.update(dtype="int8", int8_scale=self.index._int8_scale)
        elif emb.dtype != np.float32:
            # .npy has no portable bf16 — store f32, reload re-casts
            meta["dtype"] = str(emb.dtype)
            emb = emb.astype(np.float32)
        save_index(path, emb, self.index.ids, meta)
        with open(os.path.join(path, "docs.json"), "w") as f:
            json.dump(self._doc_texts, f)

    def load(self, path: str) -> "Retriever":
        self.index, meta = load_index(
            path, mesh=self.mesh,
            dtype=None if self.index_dtype == "float32"
            else self.index_dtype)
        docs_path = os.path.join(path, "docs.json")
        if os.path.isfile(docs_path):
            with open(docs_path) as f:
                self._doc_texts = json.load(f)
        self.score = meta.get("score", self.score)
        return self

    def search_stream(self, query_batches, k: int = 10, depth: int = 4,
                      return_texts: bool = False):
        """Pipelined text→results serving loop: yields one result list per
        incoming batch of query texts, in input order.

        Each batch is encoded on device (no host round trip) and its search
        dispatched immediately; up to ``depth`` rounds stay in flight, so
        result materialization overlaps the following batches' compute —
        the end-to-end analogue of ``ExactIndex.search_stream``. Yields
        the same per-query ``(doc_id, score[, text])`` rows as
        :meth:`search`, including the default exact refine re-rank on
        PQ/IVF-PQ indexes built with refine rows (the gather + rescore
        runs in the materialization phase, so the pipeline overlap
        survives it). Cross-encoder reranking is not applied on the
        streaming path."""
        if self.index is None:
            raise RuntimeError("no index built or loaded")
        if self._is_updatable():
            raise RuntimeError(
                "search_stream needs a static ExactIndex (the updatable "
                "buffer mutates between batches); use search()")
        if not hasattr(self.index, "_device_search") and not hasattr(
                self.index, "_device_search_retriever"):
            raise RuntimeError(
                f"{type(self.index).__name__} has no single-dispatch "
                "search (a streamed index is a multi-dispatch tile loop); "
                "use search()")
        if depth < 1:
            raise ValueError(f"depth must be >= 1, got {depth}")
        pos_of = self._pos() if (return_texts and self._doc_texts) else None

        def finish(state):
            return self._rows_from_packed(state, k, return_texts, pos_of)

        pending: List = []
        for queries in query_batches:
            pending.append(self._dispatch_packed(list(queries), k))
            if len(pending) >= depth:
                yield finish(pending.pop(0))
        while pending:
            yield finish(pending.pop(0))

    def _default_refine(self) -> int:
        """The refine factor :meth:`search` (via ``index.search_ids``)
        would apply by default: PQ/IVF-PQ indexes built with refine rows
        re-rank ``DEFAULT_REFINE * k`` candidates exactly; every other
        index family returns 0 (its device scores are already final)."""
        if getattr(self.index, "_refine_rows", None) is None:
            return 0
        return int(getattr(self.index, "DEFAULT_REFINE", 0))

    def _dispatch_packed(self, queries: List[str], k: int):
        """Encode + search + pack WITHOUT materializing: returns the
        in-flight (q_emb, packed (scores, ids)) device arrays (JAX async
        dispatch — nothing here blocks on device completion). On indexes
        with a default refine stage the device search is dispatched at
        the widened candidate depth; :meth:`_rows_from_packed` applies
        the exact re-rank at materialization time."""
        from qst_tpu.retrieval.index import _pack_pair

        q_emb = _encode_device(self.encoder, queries)
        rf = self._default_refine()
        kk = min(k * rf, self.index.n_docs) if rf else k
        dev_search = getattr(self.index, "_device_search_retriever",
                             self.index._device_search)
        return q_emb, _pack_pair(*dev_search(q_emb, kk, self.score,
                                             131072, "auto"))

    def _rows_from_packed(self, state, k: int, return_texts: bool, pos_of):
        """ONE packed host transfer per batch (scores bitcast alongside
        ids — the same fetch_pair fix the index streaming loop got), an
        exact refine re-rank when the index carries refine rows (the same
        re-rank :meth:`search` applies), then unpack to the
        (doc_id, score[, text]) rows of :meth:`search`."""
        from qst_tpu.retrieval.index import _unpack_host

        q_emb, packed = state
        scores, idx = _unpack_host(np.asarray(packed))
        rf = self._default_refine()
        if rf:
            from qst_tpu.retrieval.pq import refine_pair

            scores, idx = refine_pair(
                q_emb, self.index._refine_rows, idx,
                min(k, idx.shape[1]),   # probed pool may be < k (IVF-PQ)
                self.index._refine_scale, self.index.n_docs)
        rows = []
        for qi in range(idx.shape[0]):
            row = []
            for j, s in zip(idx[qi], scores[qi]):
                if j < 0:   # IVF can return fewer than k real hits
                    continue
                doc_id = self.index.ids[int(j)]
                entry = (doc_id, float(s))
                if return_texts and self._doc_texts:
                    entry = (*entry, self._doc_texts[pos_of[doc_id]])
                row.append(entry)
            rows.append(row)
        return rows

    def search_async(self, queries: Sequence[str], k: int = 10,
                     return_texts: bool = False):
        """Dispatch encode + search for one batch NOW (non-blocking) and
        return a zero-arg callable that materializes the rows.

        The serving split-phase path (``DynamicBatcher(finalize_fn=...)``):
        the batcher's collector thread dispatches batch N+1's device calls
        while completer threads block on batch N's host transfer, closing
        the encode-before-search serialization gap (STATUS known-limitation
        #6). Falls back to a deferred plain :meth:`search` for index kinds
        without a single-dispatch device path (updatable / streaming), so
        callers need no capability check. Same rows as :meth:`search` —
        including the default exact refine re-rank on PQ/IVF-PQ indexes
        with refine rows, applied in the finisher (no cross-encoder
        reranking — pass rerank work through :meth:`search`)."""
        if self.index is None:
            raise RuntimeError("no index built or loaded")
        queries = list(queries)
        single_dispatch = (
            not self._is_updatable()
            and (hasattr(self.index, "_device_search_retriever")
                 or hasattr(self.index, "_device_search")))
        if not single_dispatch:
            return lambda: self.search(queries, k=k,
                                       return_texts=return_texts)
        pos_of = (self._pos() if (return_texts and self._doc_texts)
                  else None)
        state = self._dispatch_packed(queries, k)
        return lambda: self._rows_from_packed(state, k, return_texts,
                                              pos_of)

    def search(self, queries: Sequence[str], k: int = 10,
               return_texts: bool = False, rerank_k: int = 0):
        """→ list per query of (doc_id, score[, text]) tuples.

        rerank_k > 0 enables two-stage retrieval: the dense index returns
        ``rerank_k`` candidates, the cross-encoder re-scores each
        (query, doc) pair, and the top ``k`` by rerank score are returned
        (the reference's cross-encoder relevance scoring, applied at
        serve time).
        """
        if self.index is None:
            raise RuntimeError("no index built or loaded")
        updatable = self._is_updatable()
        has_texts = bool(self._texts_by_id if updatable
                         else self._doc_texts)
        if rerank_k:
            if self.reranker is None:
                raise RuntimeError("rerank_k given but no reranker configured")
            if not has_texts:
                raise RuntimeError("reranking needs doc texts (build() them)")
        q_emb = _encode_device(self.encoder, list(queries))
        fetch_k = max(k, rerank_k) if rerank_k else k
        if updatable:
            # snapshot the text map BEFORE the search: removals REPLACE
            # the map (copy-on-write), so a racing DELETE cannot null out
            # texts for docs the index snapshot legitimately returns;
            # adds insert in place, which is also safe (keys only appear)
            text_of = self._texts_by_id.get
            try:
                scores, ids = self.index.search(np.asarray(q_emb),
                                                k=fetch_k)
            except RuntimeError:
                # corpus empty — including emptied by a delete racing this
                # very call (the snapshot decides, not a pre-check): an
                # empty serving corpus answers with no hits, not a 500
                return [[] for _ in queries]
        else:
            scores, ids = self.index.search_ids(q_emb, k=fetch_k,
                                                score=self.score)
            pos_of = (self._pos() if (rerank_k or (return_texts
                                                   and has_texts))
                      else None)
            text_of = (lambda d: self._doc_texts[pos_of[d]])
        out = []
        for qi, query in enumerate(queries):
            # IVF rows can hold None tails when the probed cells contain
            # fewer than fetch_k docs — drop them, they are not hits
            cand = [(i, float(s)) for i, s in zip(ids[qi], scores[qi])
                    if i is not None]
            if rerank_k:
                # `or ""`: an add racing an updatable search can surface a
                # doc whose text isn't in the snapshotted map yet — feed
                # the reranker an empty string rather than crash the batch
                texts = [text_of(i) or "" for i, _ in cand]
                ce_scores = np.asarray(
                    self.reranker.predict([(query, t) for t in texts]))
                order = np.argsort(-ce_scores)[:k]
                cand = [(cand[int(j)][0], float(ce_scores[int(j)]))
                        for j in order]
            row = []
            for doc_id, s in cand[:k]:
                entry = (doc_id, s)
                if return_texts and has_texts:
                    entry = (*entry, text_of(doc_id))
                row.append(entry)
            out.append(row)
        return out
