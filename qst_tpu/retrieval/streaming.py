"""Host-streamed exact search: corpora larger than HBM.

The in-HBM ``ExactIndex`` requires the whole embedding matrix device-resident,
hard-capping the single-chip envelope (~8-10M docs at 384-dim bf16 on a 16 GB
v5e). The reference has no such wall: its evaluator streams the corpus through
50k-doc host chunks (reference training/main.py:178-179; the chunked
encode+score loop behind ir_evauation_script.py:107-131) and can search
anything that fits host memory. ``StreamingExactIndex`` restores that envelope
TPU-natively:

- the corpus stays in host RAM (or an ``np.memmap`` straight from disk);
- BUCKET-aligned tiles stream host→HBM **double-buffered**: the
  ``jax.device_put`` of tile t+1 is dispatched before tile t's search step,
  so the DMA of the next tile overlaps the current tile's compute;
- each tile runs the same fused pipeline as the in-HBM index
  (``pallas_topk_local``: bucket-maxima kernel → hierarchical bucket
  selection → dynamic-DMA rescore → narrow top-k) or the XLA bucket-max
  twin, and a (Q, k) candidate carry merges across tiles. Exactness is the
  deferred-merge argument applied per tile plus an exact top-k merge of
  exact rescored scores — the same math that already composes across grid
  steps inside one tile.

Only ``tile_rows · D`` bytes (×2 for the double buffer) ever occupy HBM, so
the searchable corpus is bounded by host memory / disk, not HBM. Sustained
throughput is min(host-link bandwidth, bucket-maxima compute) — see
benchmarks/RESULTS.md for the measured envelope and roofline analysis.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qst_tpu.core.meshes import DATA_AXIS, MODEL_AXIS
from qst_tpu.ops.distances import SCORE_FUNCTIONS, l2_normalize
from qst_tpu.retrieval.index import BUCKET, _local_topk


@functools.partial(jax.jit,
                   static_argnames=("k", "use_pallas", "normalize",
                                    "interpret"),
                   donate_argnames=("carry_s", "carry_i"))
def _tile_step(queries, tile, base, n_valid, carry_s, carry_i, inv_scale, *,
               k: int, use_pallas: bool, normalize: bool,
               interpret: bool) -> Tuple[jax.Array, jax.Array]:
    """Search one corpus tile and merge into the (Q, k) candidate carry.

    ``base``/``n_valid`` are dynamic (same compiled step for every tile,
    including the padded last one). The carry buffers are donated — the
    running candidates never accumulate device memory across tiles.
    ``inv_scale`` multiplies the tile's scores before the merge (1.0 for
    float tiles; 1/(query scale × tile scale) for int8 tiles, whose PER-TILE
    quantization scales make raw integer scores incomparable across
    tiles — descaling first puts the carry in the cosine domain)."""
    if normalize:
        # per-tile device normalization: a host-side pass over a >HBM corpus
        # would cost a full extra read of the whole matrix
        tile = l2_normalize(tile.astype(jnp.float32)).astype(tile.dtype)
    if use_pallas:
        from qst_tpu.ops.topk_pallas import pallas_topk_local

        s, i = pallas_topk_local(queries, tile, k, n_valid,
                                 interpret=interpret)
    else:
        q, t_ = queries, tile
        if q.dtype == jnp.int8:    # int8 exact in bf16 (see topk_pallas)
            q, t_ = q.astype(jnp.bfloat16), t_.astype(jnp.bfloat16)
        sc = jax.lax.dot_general(
            q, t_, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, sc.shape, 1)
        sc = jnp.where(col < n_valid, sc, -jnp.inf)
        # a tile holds only tile_rows docs, so min(k, tile_rows) per-tile
        # candidates still cover the global top-k exactly
        s, i = _local_topk(sc, min(k, tile.shape[0]))
    s = s * inv_scale      # exact identity (×1.0) for float tiles
    i = i + base
    cs = jnp.concatenate([carry_s, s], axis=1)
    ci = jnp.concatenate([carry_i, i], axis=1)
    s2, pos = jax.lax.top_k(cs, k)
    i2 = jnp.take_along_axis(ci, pos, axis=1)
    return s2, i2


def _sharded_tile_fn(mesh: Mesh, k: int, shard_rows: int, *,
                     use_pallas: bool, normalize: bool, interpret: bool):
    """Build the shard_map tile step: replicated queries + carry, a
    row-sharded corpus tile → the merged replicated (Q, k) carry.

    Per shard: mask rows past the tile's global valid count, run the same
    local search as the resident sharded index (fused Pallas pipeline or
    the XLA twin), offset indices by shard + tile base, all_gather the
    per-shard candidates over ICI, and top-k-merge them with the running
    carry — streaming and ICI sharding compose because both are instances
    of the same exact deferred-merge math."""
    axes = (DATA_AXIS, MODEL_AXIS)

    def step(q, tile_shard, base, n_valid, carry_s, carry_i, inv_scale):
        from qst_tpu.core.meshes import flat_shard_index

        local_off = flat_shard_index(axes) * shard_rows
        if normalize:
            tile_shard = l2_normalize(
                tile_shard.astype(jnp.float32)).astype(tile_shard.dtype)
        n_local = jnp.clip(n_valid - local_off, 0, shard_rows)
        if use_pallas:
            from qst_tpu.ops.topk_pallas import pallas_topk_local

            s1, i1 = pallas_topk_local(q, tile_shard, k, n_local,
                                       interpret=interpret)
        else:
            qd, td = q, tile_shard
            if qd.dtype == jnp.int8:   # int8 exact in bf16 (topk_pallas)
                qd, td = qd.astype(jnp.bfloat16), td.astype(jnp.bfloat16)
            sc = jax.lax.dot_general(
                qd, td, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            col = jax.lax.broadcasted_iota(jnp.int32, sc.shape, 1)
            sc = jnp.where(col < n_local, sc, -jnp.inf)
            s1, i1 = _local_topk(sc, min(k, shard_rows))
        s1 = s1 * inv_scale    # see _tile_step: per-tile int8 descale
        i1 = i1 + local_off + base
        all_s = jax.lax.all_gather(s1, axes, axis=1, tiled=True)
        all_i = jax.lax.all_gather(i1, axes, axis=1, tiled=True)
        cs = jnp.concatenate([carry_s, all_s], axis=1)
        ci = jnp.concatenate([carry_i, all_i], axis=1)
        s2, pos = jax.lax.top_k(cs, k)
        i2 = jnp.take_along_axis(ci, pos, axis=1)
        return s2, i2

    return jax.jit(
        jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(P(), P(axes), P(), P(), P(), P(), P()),
            out_specs=(P(), P()),
            # outputs ARE replicated (identical all_gather + top_k on
            # every shard) but the varying-axes checker can't prove it
            check_vma=False,
        ),
        donate_argnums=(4, 5),
    )


class StreamingExactIndex:
    """Exact top-k search over a HOST-resident corpus (RAM ``np.ndarray`` or
    ``np.memmap``), streamed tile-by-tile through HBM.

    The corpus array is NOT copied — slices are materialized per tile at
    transfer time (and cast to ``transfer_dtype``, halving host-link bytes
    for f32 sources)."""

    def __init__(self, embeddings: np.ndarray,
                 tile_rows: int = 1 << 21,
                 normalize: bool = False,
                 transfer_dtype: str = "bfloat16",
                 ids: Optional[list] = None,
                 mesh: Optional[Mesh] = None):
        """``normalize``: L2-normalize every tile on device (ExactIndex
        (normalize=True) semantics — dot searches then see the normalized
        vectors; a host-side pass over a >HBM corpus would cost a full
        extra read). ``mesh``: shard every streamed tile row-wise over all
        mesh devices — each chip searches tile_rows/n_devices rows with
        the same fused pipeline and candidates merge over ICI, so the
        host-link stream fans out across the slice's chips (a v5e-8
        searches a host corpus ~8× faster than one chip, and the >HBM
        envelope applies per POD SLICE, not per chip)."""
        if embeddings.ndim != 2 or embeddings.shape[0] == 0:
            raise ValueError(
                f"embeddings must be (N, D), got {embeddings.shape}")
        self._n_dev = (int(np.prod(list(mesh.shape.values())))
                       if mesh is not None else 1)
        if self._n_dev == 1:
            mesh = None
        self.mesh = mesh
        row_quantum = BUCKET * self._n_dev
        if tile_rows % row_quantum != 0 or tile_rows <= 0:
            raise ValueError(
                f"tile_rows must be a positive multiple of {row_quantum} "
                f"(BUCKET × mesh devices), got {tile_rows}")
        if transfer_dtype not in ("float32", "bfloat16", "int8"):
            raise ValueError(
                f"transfer_dtype must be float32|bfloat16|int8, got"
                f" {transfer_dtype}")
        if transfer_dtype == "int8":
            # int8 tiles HALVE the host-link bytes — the measured bottleneck
            # of the >HBM envelope (RESULTS.md: the stream runs at link
            # speed) — so streaming throughput ~doubles at the same link.
            # Tiles are unit-normalized + quantized host-side at a fixed
            # scale of 127 (ExactIndex-int8 semantics: cos ≡ dot over the
            # normalized corpus; ranking is integer-exact); an
            # ALREADY-int8 host array (e.g. a quantized memmap built with
            # :meth:`quantize_host`) streams verbatim, also halving host
            # RAM/disk.
            if normalize:
                raise ValueError(
                    "transfer_dtype='int8' always normalizes (quantization "
                    "needs unit rows); drop normalize=True")
            if embeddings.shape[1] * 127 * 127 >= 1 << 24:
                raise ValueError(
                    f"dim {embeddings.shape[1]} too wide for int8 "
                    "(D·127² must stay below 2^24 for exact f32 sums)")
        self.embeddings = embeddings      # host-resident, never copied whole
        self.n_docs, self.dim = embeddings.shape
        self.tile_rows = tile_rows
        self._normalize_on_device = normalize
        self.transfer_dtype = jnp.dtype(transfer_dtype)
        self.ids = list(ids) if ids is not None else None
        if self.ids is not None and len(self.ids) != self.n_docs:
            raise ValueError("ids length mismatch")
        self._tile_sharding = (
            NamedSharding(mesh, P((DATA_AXIS, MODEL_AXIS)))
            if mesh is not None else None)
        self._sharded_fns = {}

    @classmethod
    def from_npy(cls, path: str, **kw) -> "StreamingExactIndex":
        """Memory-map a ``.npy`` corpus straight from disk — the searchable
        corpus is then bounded by disk, not RAM."""
        return cls(np.load(path, mmap_mode="r"), **kw)

    INT8_SCALE = 127.0   # pre-quantized host arrays: unit-norm rows bound
    # |component| <= 1, so quantize_host uses the fixed worst-case scale.
    # Tiles quantized ON THE FLY from a float host corpus instead use a
    # PER-TILE scale 127/max|tile| — ~4× finer at 384-dim (max component
    # of a unit vector is ~0.25), worth ~7 recall@10 points (measured);
    # the merge descales per tile so cross-tile scores stay comparable.

    @staticmethod
    def quantize_host(rows: np.ndarray) -> np.ndarray:
        """Unit-normalize + quantize rows to the fixed-scale int8 scheme —
        use it to materialize a half-size host/disk corpus once, then
        construct the index over the int8 array (streamed verbatim). Note
        the fixed scale is coarser than the on-the-fly per-tile scale:
        prefer streaming from the float corpus when host RAM allows."""
        rows = np.asarray(rows, np.float32)
        rows = rows / np.maximum(
            np.linalg.norm(rows, axis=1, keepdims=True), 1e-12)
        return np.clip(np.round(rows * StreamingExactIndex.INT8_SCALE),
                       -127, 127).astype(np.int8)

    def _host_tile(self, t: int) -> Tuple[np.ndarray, float]:
        """Materialize tile t host-side: slice, cast (or normalize +
        quantize for int8), pad the last tile. → (tile, scale) where scale
        is the tile's quantization scale (1.0 for float tiles)."""
        lo = t * self.tile_rows
        hi = min(lo + self.tile_rows, self.n_docs)
        chunk = np.asarray(self.embeddings[lo:hi])
        np_dtype = jnp.dtype(self.transfer_dtype)
        scale = 1.0
        if np_dtype == jnp.int8:
            if chunk.dtype == np.int8:      # pre-quantized: fixed scale
                scale = self.INT8_SCALE
            else:
                chunk = np.asarray(chunk, np.float32)
                chunk = chunk / np.maximum(
                    np.linalg.norm(chunk, axis=1, keepdims=True), 1e-12)
                scale = 127.0 / max(float(np.abs(chunk).max()), 1e-12)
                chunk = np.clip(np.round(chunk * scale),
                                -127, 127).astype(np.int8)
        elif chunk.dtype != np_dtype:
            chunk = chunk.astype(np_dtype)
        if hi - lo < self.tile_rows:
            chunk = np.pad(chunk, ((0, self.tile_rows - (hi - lo)), (0, 0)))
        return chunk, scale

    def search(self, queries, k: int = 10, score: str = "cos_sim",
               backend: str = "auto") -> Tuple[np.ndarray, np.ndarray]:
        """→ (scores (Q, k), indices (Q, k)) as numpy, exact over the full
        host corpus. One full host→HBM corpus pass per call — batch queries
        to amortize it (Q only changes the compute term, not the stream)."""
        if score not in ("cos_sim", "dot_score"):
            raise ValueError(
                f"streaming search supports cos_sim|dot_score, got {score!r}")
        if backend not in ("auto", "pallas", "xla"):
            raise ValueError(f"unknown backend {backend!r}")
        on_cpu = jax.devices()[0].platform == "cpu"
        use_pallas = backend == "pallas" or (backend == "auto" and not on_cpu)
        k = min(k, self.n_docs)
        if k > 128 and use_pallas:
            if backend == "pallas":
                raise ValueError("pallas backend supports k <= 128")
            use_pallas = False
        interpret = use_pallas and on_cpu
        qq = jnp.asarray(np.asarray(queries), jnp.float32)
        if score == "cos_sim":
            qq = l2_normalize(qq)
        qscale = None
        if self.transfer_dtype == jnp.int8:
            # ExactIndex-int8 scheme: per-call symmetric query scale;
            # integer scores descale back to the cosine domain at the end
            qscale = 127.0 / jnp.maximum(jnp.max(jnp.abs(qq)), 1e-12)
            qq = jnp.clip(jnp.round(qq * qscale), -127, 127
                          ).astype(jnp.int8)
        else:
            qq = qq.astype(self.transfer_dtype)
        Q = qq.shape[0]
        # tiles normalize on device when the score needs it OR the index
        # was constructed with normalize=True (ExactIndex(normalize=True)
        # semantics: dot/euclid then see the normalized vectors too) —
        # int8 tiles arrive normalized+quantized from the host instead
        normalize = (self.transfer_dtype != jnp.int8
                     and (self._normalize_on_device or score == "cos_sim"))

        n_tiles = -(-self.n_docs // self.tile_rows)
        carry_s = jnp.full((Q, k), -jnp.inf, jnp.float32)
        carry_i = jnp.full((Q, k), -1, jnp.int32)
        if self.mesh is not None:
            key = (k, use_pallas, normalize, interpret)
            step = self._sharded_fns.get(key)
            if step is None:
                step = self._sharded_fns[key] = _sharded_tile_fn(
                    self.mesh, k, self.tile_rows // self._n_dev,
                    use_pallas=use_pallas, normalize=normalize,
                    interpret=interpret)
        else:
            step = functools.partial(
                _tile_step, k=k, use_pallas=use_pallas,
                normalize=normalize, interpret=interpret)
        # double buffer: tile t+1's host slice + device transfer are issued
        # before tile t's step is consumed, overlapping DMA with compute
        # (with a mesh, each device receives only its tile shard)
        tile0, scale0 = self._host_tile(0)
        buf = jax.device_put(tile0, self._tile_sharding), scale0
        for t in range(n_tiles):
            if t + 1 < n_tiles:
                tile_n, scale_n = self._host_tile(t + 1)
                nxt = jax.device_put(tile_n, self._tile_sharding), scale_n
            else:
                nxt = None
            base = jnp.int32(t * self.tile_rows)
            n_valid = jnp.int32(
                min(self.n_docs - t * self.tile_rows, self.tile_rows))
            # int8: descale this tile's integer scores into the cosine
            # domain BEFORE the carry merge (per-tile scales otherwise
            # make scores incomparable across tiles); float tiles pass 1.0
            inv = (jnp.float32(1.0) if qscale is None
                   else 1.0 / (qscale * buf[1]))
            carry_s, carry_i = step(qq, buf[0], base, n_valid,
                                    carry_s, carry_i, inv)
            buf = nxt
        from qst_tpu.retrieval.index import fetch_pair
        return fetch_pair(carry_s, carry_i)

    def search_ids(self, queries, k: int = 10, score: str = "cos_sim"):
        """→ (scores, doc-id lists) using external ids when provided."""
        s, i = self.search(queries, k, score)
        ids = self.ids if self.ids is not None else list(range(self.n_docs))
        return s, [[ids[j] for j in row] for row in i]
