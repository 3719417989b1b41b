"""Pipeline parallelism (GPipe-style) over a ``pipe`` mesh axis.

New first-class capability (the reference has no distributed layer at all,
SURVEY.md §2.2): the encoder trunk's layers are partitioned into stages, one
stage per device along the ``pipe`` axis; microbatches stream through the
stages, activations hop stage→stage over ICI via ``lax.ppermute``. Composes
with data parallelism — a 2-D ('pipe', 'data') mesh shards each microbatch
over ``data`` while stages split over ``pipe``.

Design (idiomatic JAX, not a torch port):
- stage parameters are STACKED: every leaf gains a leading (n_stages,
  layers_per_stage) prefix and is sharded ``P('pipe')`` — one stage slice
  resident per device;
- the schedule is a ``lax.scan`` over ``v·n_microbatches + n_stages - 1``
  ticks; each tick every stage applies one of its layer chunks to its
  current activations (bubble ticks skip compute via ``lax.cond``) and
  ``ppermute``s the result to the next stage;
- ``n_rounds`` v > 1 selects the CIRCULAR (interleaved) schedule: each
  device holds v chunks of L/(S·v) layers, microbatches loop the ring v
  times (the last device's sends wrap to device 0 through a per-microbatch
  bank), shrinking the fill/drain bubble from (S-1)/(M+S-1) to
  (S-1)/(v·M+S-1) — the standard interleaved-pipeline bubble reduction,
  expressed as the same scan;
- the whole pipeline is a pure differentiable function: ``jax.grad``
  through ``scan`` + ``ppermute`` yields the reverse-schedule backward
  automatically (GPipe fill-drain; activations of all in-flight microbatches
  are rematerialized by AD as usual);
- outputs leave the last stage and are ``psum``-broadcast over ``pipe``
  (every other stage contributes zeros), staying sharded over ``data``.

Dropout (round 3): the trunk threads a PER-(data-shard, microbatch, layer)
PRNG stream through the stage scan — ``fold_in(fold_in(fold_in(rng,
data_index), microbatch), global_layer)`` — so PP training runs at the
reference's default dropout rates (reference training/main.py:221-239 via
the HF config) with masks that are deterministic given the step rng, exactly
like the fused layer kernel's counter-based scheme. Embedding dropout uses
the ``fold_in(rng, num_layers)`` stream. Pass ``rng=None`` (default) for the
deterministic forward.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qst_tpu.core.config import EncoderConfig
from qst_tpu.core.meshes import DATA_AXIS
from qst_tpu.models.bert import BertEmbeddings, BertLayer
from qst_tpu.ops.distances import l2_normalize
from qst_tpu.ops.pooling import POOLERS

PIPE_AXIS = "pipe"


def make_pipe_mesh(pipe: int, data: int = 1,
                   devices: Optional[Any] = None) -> Mesh:
    """2-D ('pipe', 'data') mesh."""
    import numpy as np

    devs = list(devices if devices is not None else jax.devices())
    if pipe * data > len(devs):
        raise ValueError(f"mesh {pipe}x{data} needs more than "
                         f"{len(devs)} devices")
    arr = np.asarray(devs[: pipe * data]).reshape(pipe, data)
    return Mesh(arr, (PIPE_AXIS, DATA_AXIS))


def _chunk_layers(num_layers: int, n_stages: int, n_rounds: int):
    """Layer ids of chunk ``c`` (device c % S, round c // S): the circular
    assignment [c·pc, (c+1)·pc) with pc = L/(S·v)."""
    if num_layers % (n_stages * n_rounds) != 0:
        raise ValueError(
            f"{num_layers} layers not divisible by {n_stages} stages × "
            f"{n_rounds} rounds")
    pc = num_layers // (n_stages * n_rounds)
    return [list(range(c * pc, (c + 1) * pc))
            for c in range(n_stages * n_rounds)]


def stack_stage_params(encoder_params: Dict[str, Any], num_layers: int,
                       n_stages: int, n_rounds: int = 1) -> Any:
    """{layer_0..layer_{L-1}} → pytree with leading (n_stages, L/n_stages)
    axes on every leaf. With ``n_rounds`` v > 1 (the circular schedule)
    device p's row holds its v chunks back to back — slot r·pc + i is
    layer (r·S + p)·pc + i — so the leaf SHAPES are identical for every v
    and only the layer→slot mapping changes."""
    chunks = _chunk_layers(num_layers, n_stages, n_rounds)
    stages = []
    for s in range(n_stages):
        layer_ids = [li for r in range(n_rounds)
                     for li in chunks[r * n_stages + s]]
        group = [encoder_params[f"layer_{li}"] for li in layer_ids]
        stages.append(jax.tree.map(lambda *xs: jnp.stack(xs), *group))
    return jax.tree.map(lambda *xs: jnp.stack(xs), *stages)


def unstack_stage_params(stage_params: Any, num_layers: int,
                         n_rounds: int = 1) -> Dict[str, Any]:
    """Inverse of :func:`stack_stage_params` (for checkpoint export)."""
    leaves = jax.tree.leaves(stage_params)
    n_stages, per = leaves[0].shape[0], leaves[0].shape[1]
    if n_stages * per != num_layers:
        raise ValueError("stage stack does not match num_layers")
    chunks = _chunk_layers(num_layers, n_stages, n_rounds)
    out = {}
    for s in range(n_stages):
        layer_ids = [li for r in range(n_rounds)
                     for li in chunks[r * n_stages + s]]
        for slot, li in enumerate(layer_ids):
            out[f"layer_{li}"] = jax.tree.map(
                lambda x: x[s, slot], stage_params)
    return out


def _pipeline_trunk_fn(cfg: EncoderConfig, n_stages: int,
                       n_microbatches: int,
                       stochastic: bool = False,
                       n_rounds: int = 1) -> Callable:
    """The per-device body run under shard_map: stacked stage params +
    microbatched activations → microbatched last-hidden states.

    ``stochastic``: thread per-(microbatch, layer) dropout keys through the
    stage scan — layer l of microbatch m uses
    ``fold_in(fold_in(fold_in(rng, data_index), m), l)`` (l global across
    stages), so masks are deterministic given the step rng and iid across
    data shards, microbatches, and layers. Bubble ticks draw the same keys
    as the clipped microbatch they shadow, but their outputs are masked.

    ``n_rounds`` v > 1 runs the CIRCULAR (interleaved) schedule: each
    device holds v chunks of L/(S·v) layers (chunk c = r·S + p on device
    p), a microbatch loops the ring v times, and the last device's sends
    wrap back to device 0 through a per-microbatch buffer. Tick count
    grows to v·M + S - 1 but each tick computes 1/v of the old stage, so
    the fill/drain bubble shrinks from (S-1) to (S-1)/v stage-times —
    bubble fraction (S-1)/(v·M + S - 1). The schedule is static: at tick
    t device p runs round (t-p) div M of microbatch (t-p) mod M, which
    requires M ≥ S so a wrapped activation (arriving at tick
    (r-1)·M + m + S) is ready before its round-r slot (tick r·M + m)."""
    layer = BertLayer(cfg)
    per = cfg.num_layers // n_stages          # layer slots per device
    pc = per // n_rounds                      # layers per chunk
    M, Pn, V = n_microbatches, n_stages, n_rounds

    def apply_chunk(sp, rr, hidden, bias, mask, key_m):
        """Apply this device's round-``rr`` chunk (dynamic slice of its
        slot-stacked params; slot r·pc + i holds layer (r·S + p)·pc + i)."""
        s = jax.lax.axis_index(PIPE_AXIS)
        sp_r = jax.tree.map(
            lambda x: jax.lax.dynamic_slice_in_dim(x, rr * pc, pc, 0), sp)
        base = (rr * Pn + s) * pc             # first GLOBAL layer id

        def body(h, xs):
            lp, li = xs
            if stochastic:
                k = jax.random.fold_in(key_m, base + li)
                h = layer.apply({"params": lp}, h, bias, mask, False,
                                rngs={"dropout": k})
            else:
                h = layer.apply({"params": lp}, h, bias, mask, True)
            return h, None

        h, _ = jax.lax.scan(body, hidden,
                            (sp_r, jnp.arange(pc, dtype=jnp.int32)))
        return h

    def trunk(stage_params, mb_hidden, mb_bias, mb_mask, rng):
        # local slices: stage_params (1, per, ...), mb_* (M, mb_local, ...)
        sp = jax.tree.map(lambda x: x[0], stage_params)
        p = jax.lax.axis_index(PIPE_AXIS)
        last = Pn - 1
        rng_l = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))

        def tick(carry, t):
            buf, wrap, outs = carry
            tp = t - p                   # schedule position at this stage
            valid = (tp >= 0) & (tp < V * M)
            tpc = jnp.clip(tp, 0, V * M - 1)
            rr, mc = tpc // M, tpc % M
            entering = mb_hidden[mc] if V == 1 else jnp.where(
                rr == 0, mb_hidden[mc], wrap[mc])
            x = jnp.where(p == 0, entering, buf)
            # bubble ticks SKIP the chunk compute (lax.cond is legal here:
            # apply_chunk has no collectives, so per-device divergence
            # during fill/drain is fine — the ppermute below is outside the
            # cond and every device still participates). Wall-clock per
            # tick is set by the busiest stage either way; the cond saves
            # the bubble fraction of don't-care FLOPs (energy on TPU, real
            # time on the shared-core CPU test mesh).
            y = jax.lax.cond(
                valid,
                lambda x: apply_chunk(sp, rr, x, mb_bias[mc], mb_mask[mc],
                                      jax.random.fold_in(rng_l, mc)),
                lambda x: x,
                x)
            outs = jnp.where((p == last) & (rr == V - 1) & valid,
                             outs.at[mc].set(y), outs)
            if V == 1:
                # activations hop stage p → p+1 (last stage's send dropped)
                buf = jax.lax.ppermute(
                    y, PIPE_AXIS, [(i, i + 1) for i in range(Pn - 1)])
            else:
                # circular hop: the last stage's send wraps to device 0,
                # which banks it per microbatch until its round-r slot
                sent = jax.lax.ppermute(
                    y, PIPE_AXIS, [(i, (i + 1) % Pn) for i in range(Pn)])
                tpl = t - last           # producer schedule position
                tplc = jnp.clip(tpl, 0, V * M - 1)
                store = ((tpl >= 0) & (tpl < V * M)
                         & (tplc // M < V - 1) & (p == 0))
                wrap = jnp.where(store, wrap.at[tplc % M].set(sent), wrap)
                buf = sent
            return (buf, wrap, outs), None

        buf0 = jnp.zeros_like(mb_hidden[0])
        wrap0 = (jnp.zeros((), mb_hidden.dtype) if V == 1
                 else jnp.zeros_like(mb_hidden))
        outs0 = jnp.zeros_like(mb_hidden)
        (_, _, outs), _ = jax.lax.scan(tick, (buf0, wrap0, outs0),
                                       jnp.arange(V * M + Pn - 1))
        # only the last stage holds real outputs; broadcast over the pipe
        return jax.lax.psum(outs, PIPE_AXIS)

    return trunk


def make_pp_embed_fn(cfg: EncoderConfig, mesh: Mesh, n_stages: int,
                     n_microbatches: int, n_rounds: int = 1) -> Callable:
    """→ ``fn(params, input_ids, attention_mask) -> (B, D) embeddings``
    with the trunk pipeline-parallel over ``mesh``'s 'pipe' axis and the
    batch sharded over its 'data' axis.

    ``params`` = {"embeddings": <BertEmbeddings>, "stages": <stacked>}.
    B must be divisible by n_microbatches × data-axis size. ``n_rounds``
    > 1 selects the circular (interleaved) schedule — bubble fraction
    (S-1)/(v·M+S-1) instead of GPipe's (S-1)/(M+S-1); stack the params
    with the same ``n_rounds``.
    """
    if PIPE_AXIS not in mesh.shape:
        raise ValueError("mesh needs a 'pipe' axis")
    if mesh.shape[PIPE_AXIS] != n_stages:
        raise ValueError(
            f"mesh pipe={mesh.shape[PIPE_AXIS]} != n_stages={n_stages}")
    _chunk_layers(cfg.num_layers, n_stages, n_rounds)  # divisibility
    if n_rounds > 1 and n_microbatches < n_stages:
        raise ValueError(
            f"the circular schedule needs n_microbatches >= n_stages "
            f"(wrapped activations must arrive before their next-round "
            f"slot), got {n_microbatches} < {n_stages}")
    emb_mod = BertEmbeddings(cfg)
    stochastic = cfg.hidden_dropout > 0 or cfg.attention_dropout > 0

    def make_sharded_trunk(stoch: bool):
        return jax.shard_map(
            _pipeline_trunk_fn(cfg, n_stages, n_microbatches, stoch,
                               n_rounds),
            mesh=mesh,
            in_specs=(P(PIPE_AXIS), P(None, DATA_AXIS), P(None, DATA_AXIS),
                      P(None, DATA_AXIS), P()),
            out_specs=P(None, DATA_AXIS),
            check_vma=False,
        )

    trunks = {False: make_sharded_trunk(False)}
    if stochastic:
        trunks[True] = make_sharded_trunk(True)
    M = n_microbatches

    def fn(params, input_ids, attention_mask, rng=None):
        """``rng=None`` → deterministic forward; with a key (and non-zero
        configured dropout rates) the trunk runs stochastic per-microbatch
        dropout and the embedding dropout uses the fold_in(rng, num_layers)
        stream."""
        B, S = input_ids.shape
        if B % M != 0:
            raise ValueError(f"batch {B} not divisible by {M} microbatches")
        stoch = rng is not None and stochastic
        position_ids = jnp.broadcast_to(
            jnp.arange(S, dtype=jnp.int32)[None, :], (B, S))
        if stoch:
            hidden = emb_mod.apply(
                {"params": params["embeddings"]}, input_ids,
                jnp.zeros_like(input_ids), position_ids, False,
                rngs={"dropout": jax.random.fold_in(rng, cfg.num_layers)})
        else:
            hidden = emb_mod.apply({"params": params["embeddings"]},
                                   input_ids, jnp.zeros_like(input_ids),
                                   position_ids, True)
        bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9)
        bias = bias.astype(jnp.float32)
        mb = B // M
        trunk_rng = rng if stoch else jax.random.key(0)
        hidden = trunks[stoch](
            params["stages"],
            hidden.reshape(M, mb, S, -1),
            bias.reshape(M, mb, 1, 1, S),
            attention_mask.reshape(M, mb, S),
            trunk_rng,
        ).reshape(B, S, -1)
        pooled = POOLERS[cfg.pooling](hidden, attention_mask)
        if cfg.normalize:
            pooled = l2_normalize(pooled)
        return pooled

    return fn


def pp_params_from_encoder(encoder_params: Dict[str, Any],
                           cfg: EncoderConfig, n_stages: int,
                           mesh: Optional[Mesh] = None,
                           n_rounds: int = 1) -> Dict[str, Any]:
    """Split a flat ``BertEncoder`` param tree into the PP layout (and
    place the stage stack sharded over the pipe axis when a mesh is given)."""
    stages = stack_stage_params(encoder_params, cfg.num_layers, n_stages,
                                n_rounds)
    if mesh is not None:
        sh = NamedSharding(mesh, P(PIPE_AXIS))
        stages = jax.tree.map(lambda x: jax.device_put(x, sh), stages)
    # copy (not alias) the embedding leaves: the PP train step donates its
    # state, and donating aliased arrays would delete the caller's encoder
    # params out from under them
    emb = jax.tree.map(jnp.array, encoder_params["embeddings"])
    return {"embeddings": emb, "stages": stages}


def make_pp_train_step(cfg: EncoderConfig, loss_cfg, tx, mesh: Mesh,
                       n_stages: int, n_microbatches: int,
                       n_rounds: int = 1) -> Callable:
    """Jitted quadruplet train step with the encoder trunk pipelined.

    → ``step(state, input_ids (4, B, S), attention_mask, rng) ->
    (state, loss)`` where ``state`` is a TrainState whose params are the PP
    layout ({"embeddings", "stages"}). With non-zero configured dropout
    rates the trunk runs per-microbatch stochastic dropout from ``rng``
    (reference training semantics); everything else matches the standard
    step.
    """
    from qst_tpu.train.train_step import loss_from_config

    fwd = make_pp_embed_fn(cfg, mesh, n_stages, n_microbatches, n_rounds)
    loss_fn_inner = loss_from_config(loss_cfg)
    stochastic = cfg.hidden_dropout > 0 or cfg.attention_dropout > 0

    def loss_fn(params, input_ids, attention_mask, rng):
        four, B, S = input_ids.shape
        emb = fwd(params, input_ids.reshape(four * B, S),
                  attention_mask.reshape(four * B, S),
                  rng if stochastic else None)
        emb = emb.reshape(four, B, -1)
        return loss_fn_inner(emb[0], emb[1], emb[2], emb[3])

    import optax

    def step(state, input_ids, attention_mask, rng):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, input_ids, attention_mask, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=new_opt), loss

    return jax.jit(step, donate_argnums=(0,))
