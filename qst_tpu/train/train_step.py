"""The jitted quadruplet train step.

Idiomatic TPU replacement for the reference's train path — the black-box
``SentenceTransformer.fit`` driving ``QuadrupletSentenceTransformerLossModel``
(reference quadruplet_sentence_transformer.py:22-77), which runs FOUR
sequential encoder forwards per step (:42-60). Here:

- the collator stacks the four roles into one (4·B, S) batch and the step
  runs ONE fused forward — 4× the matmul batch feeding the MXU;
- loss, grads, AdamW update, grad clipping, and LR schedule are one jitted,
  donated-argument function; with a sharded batch (data axis), XLA inserts
  the gradient all-reduce over ICI automatically (data parallelism);
- AMP: compute dtype bf16 via the encoder config (``use_amp`` equivalent),
  params and optimizer state stay f32;
- the discriminator-regularized variant trains the pair discriminator
  jointly (reference losses.py:72-151 + notebook DummyDiscriminator).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qst_tpu.core.config import EncoderConfig, LossConfig, TrainConfig
from qst_tpu.core.meshes import DATA_AXIS
from qst_tpu.models.discriminator import PairDiscriminator
from qst_tpu.models.sentence_encoder import SentenceEncoderModule
from qst_tpu.ops.losses import (
    d_regularized_quadruplet_loss,
    gamma_quadruplet_loss,
    triplet_margin_loss,
)


def encoder_apply_fn(encoder_cfg: EncoderConfig,
                     mesh: Optional[Mesh] = None) -> Callable:
    """→ ``fn(params, flat_ids, flat_mask, dropout_rng) → (N, D)`` — the
    trainable 4-role encoder forward.

    With ``encoder_cfg.use_fused_layer`` the trunk runs through the fused
    Pallas layer kernels WITH their custom-VJP backward
    (ops/fused_layer_pallas.py) — the fully-fused training path. Non-zero
    dropout rates run as in-kernel counter-based dropout (reference
    training semantics; masks regenerate bit-identically in the backward
    kernel's recompute).

    When ``mesh`` is given alongside the fused path, the encode is wrapped
    in ``shard_map`` over the data axis: each device runs the Pallas
    kernels on ITS batch shard (GSPMD has no partitioning rule for custom
    calls, so without this the compiler could all-gather + replicate);
    shard_map's transpose psums the replicated-param cotangents — the DP
    gradient reduction."""
    if encoder_cfg.use_fused_layer:
        from qst_tpu.ops.fused_layer_pallas import fused_embed_fn

        stochastic = (encoder_cfg.hidden_dropout > 0
                      or encoder_cfg.attention_dropout > 0)
        fwd = fused_embed_fn(encoder_cfg, nb=encoder_cfg.fused_nb,
                             differentiable=True, with_dropout=stochastic)
        if mesh is not None and mesh.shape[DATA_AXIS] > 1:
            shard_map = jax.shard_map

            if stochastic:
                # every device derives ITS mask stream from (rng, its batch
                # shard): fold the data-axis index into the key inside the
                # shard so dropout is iid across shards
                def fwd_shard(params, ids, mask, rng):
                    rng = jax.random.fold_in(
                        rng, jax.lax.axis_index(DATA_AXIS))
                    return fwd(params, ids, mask, rng)

                sharded = shard_map(
                    fwd_shard, mesh=mesh,
                    in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P()),
                    out_specs=P(DATA_AXIS), check_vma=False)
                return lambda params, ids, mask, rng: sharded(
                    params, ids, mask, rng)
            sharded = shard_map(
                fwd, mesh=mesh,
                in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
                out_specs=P(DATA_AXIS), check_vma=False)
            return lambda params, ids, mask, rng: sharded(params, ids, mask)
        if stochastic:
            return fwd
        return lambda params, ids, mask, rng: fwd(params, ids, mask)
    model = SentenceEncoderModule(encoder_cfg)
    return lambda params, ids, mask, rng: model.apply(
        {"params": params}, ids, mask, deterministic=False,
        rngs={"dropout": rng})["sentence_embedding"]


def loss_from_config(loss_cfg: LossConfig,
                     discr_apply: Optional[Callable] = None) -> Callable:
    """→ ``loss(a, pos, part, neg) -> scalar`` for the configured kind.

    One dispatch point for all three loss kinds: "gamma" (reference
    losses.py:9-69), "d_regularized" (:72-151, needs ``discr_apply``), and
    "triplet" — the plain (anchor, pos, neg) hinge that IGNORES the
    part-positive role, used as the ablation baseline for the quadruplet
    loss's graded-relevance claim."""
    if loss_cfg.kind == "d_regularized":
        if discr_apply is None:
            raise ValueError("d_regularized loss needs discr_apply")

        def loss(a, pos, part, neg):
            return d_regularized_quadruplet_loss(
                a, pos, part, neg,
                margin_pos_neg=loss_cfg.margin_pos_neg,
                margin_part_neg=loss_cfg.margin_part_neg,
                lmbd=loss_cfg.lmbd, discr=discr_apply,
                p=loss_cfg.p, swap=loss_cfg.swap, reduction="mean")
    elif loss_cfg.kind == "triplet":
        def loss(a, pos, part, neg):
            del part
            return triplet_margin_loss(
                a, pos, neg, margin=loss_cfg.margin_pos_neg,
                p=loss_cfg.p, swap=loss_cfg.swap).mean()
    elif loss_cfg.use_fused_kernel:
        # fused Pallas pairwise-distance/margin kernel with analytic
        # custom-VJP backward (p=2, no swap — enforced by LossConfig);
        # interpreter mode on the CPU test mesh
        from qst_tpu.ops.quadruplet_pallas import fused_gamma_quadruplet_loss

        interpret = jax.devices()[0].platform == "cpu"

        def loss(a, pos, part, neg):
            return fused_gamma_quadruplet_loss(
                a, pos, part, neg, loss_cfg.gamma,
                loss_cfg.margin_pos_neg, loss_cfg.margin_pos_part,
                loss_cfg.margin_part_neg, "mean", interpret)
    else:
        def loss(a, pos, part, neg):
            return gamma_quadruplet_loss(
                a, pos, part, neg,
                gamma=loss_cfg.gamma,
                margin_pos_neg=loss_cfg.margin_pos_neg,
                margin_pos_part=loss_cfg.margin_pos_part,
                margin_part_neg=loss_cfg.margin_part_neg,
                p=loss_cfg.p, swap=loss_cfg.swap, reduction="mean")
    return loss


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    discr_params: Any = None  # only for the d-regularized loss


def make_optimizer(train_cfg: TrainConfig, total_steps: int) -> optax.GradientTransformation:
    from qst_tpu.train.schedules import get_schedule

    schedule = get_schedule(train_cfg.scheduler, train_cfg.learning_rate,
                            train_cfg.warmup_steps, total_steps)
    tx = optax.chain(
        optax.clip_by_global_norm(train_cfg.max_grad_norm),
        optax.adamw(schedule, weight_decay=train_cfg.weight_decay,
                    b1=0.9, b2=0.999, eps=1e-8),
    )
    accum = getattr(train_cfg, "gradient_accumulation_steps", 1)
    if accum > 1:
        # average grads over N micro-batches before one optimizer update —
        # effective batch = N * batch_size at constant device memory
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx


def create_train_state(
    encoder_cfg: EncoderConfig,
    train_cfg: TrainConfig,
    rng: jax.Array,
    total_steps: int,
    loss_cfg: Optional[LossConfig] = None,
    initial_params: Optional[Any] = None,
) -> Tuple[TrainState, optax.GradientTransformation]:
    """``initial_params``: start from these weights (e.g. an imported HF
    checkpoint — the reference fine-tunes pretrained MiniLM, reference
    training/main.py:242) instead of random init."""
    from qst_tpu.models.discriminator import init_discriminator
    from qst_tpu.models.sentence_encoder import init_params

    # copy (not alias) provided weights: the train step donates its state,
    # and donating aliased arrays would delete the caller's params
    params = (jax.tree.map(jnp.array, initial_params)
              if initial_params is not None
              else init_params(encoder_cfg, rng))
    discr_params = None
    trainable = {"encoder": params}
    if loss_cfg is not None and loss_cfg.kind == "d_regularized":
        discr_params = init_discriminator(
            encoder_cfg.hidden_size, jax.random.fold_in(rng, 1))
        trainable = {"encoder": params, "discr": discr_params}
    tx = make_optimizer(train_cfg, total_steps)
    opt_state = tx.init(trainable)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=opt_state, discr_params=discr_params), tx


def create_train_state_sharded(
    encoder_cfg: EncoderConfig,
    train_cfg: TrainConfig,
    rng: jax.Array,
    total_steps: int,
    mesh: Mesh,
    loss_cfg: Optional[LossConfig] = None,
    initial_params: Optional[Any] = None,
):
    """Tensor-parallel state creation: params (and optimizer moments)
    materialize directly in the layout given by the qst_tpu.parallel rules —
    attention heads and MLP width sharded over the ``model`` axis. The train
    step then inherits these shardings through its arguments and XLA inserts
    the TP collectives. → (state, tx, state_shardings).

    ``initial_params``: overwrite the randomly-initialized encoder params
    with these weights (device_put into the rule-derived shardings; the
    Adam moments are zeros either way, so only the params leaves change)."""
    from qst_tpu.parallel.sharding import create_sharded

    tx = make_optimizer(train_cfg, total_steps)

    def build():
        from qst_tpu.models.discriminator import init_discriminator
        from qst_tpu.models.sentence_encoder import init_params

        params = init_params(encoder_cfg, rng)
        discr_params = None
        trainable = {"encoder": params}
        if loss_cfg is not None and loss_cfg.kind == "d_regularized":
            discr_params = init_discriminator(
                encoder_cfg.hidden_size, jax.random.fold_in(rng, 1))
            trainable = {"encoder": params, "discr": discr_params}
        opt_state = tx.init(trainable)
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=opt_state, discr_params=discr_params)

    state, shardings = create_sharded(mesh, build)
    if initial_params is not None:
        placed = jax.tree.map(
            lambda tgt, src: jax.device_put(
                jnp.asarray(src, tgt.dtype), tgt.sharding),
            state.params, initial_params)
        state = state.replace(params=placed)
    return state, tx, shardings


def make_train_step(
    encoder_cfg: EncoderConfig,
    loss_cfg: LossConfig,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
) -> Callable[[TrainState, jax.Array, jax.Array, jax.Array],
              Tuple[TrainState, jax.Array]]:
    """→ jitted ``step(state, input_ids, attention_mask, dropout_rng)``.

    ``input_ids``/``attention_mask``: (4, B, S) stacked role batches.
    When ``mesh`` is given, the batch axis B is sharded over the data axis
    and params are replicated (XLA derives the grad psum).
    """
    encode = encoder_apply_fn(encoder_cfg, mesh)
    discr = PairDiscriminator()
    d_reg = loss_cfg.kind == "d_regularized"

    def loss_fn(trainable, input_ids, attention_mask, dropout_rng):
        four, B, S = input_ids.shape
        flat_ids = input_ids.reshape(four * B, S)
        flat_mask = attention_mask.reshape(four * B, S)
        emb = encode(trainable["encoder"], flat_ids, flat_mask,
                     dropout_rng).reshape(four, B, -1)
        a, pos, part, neg = emb[0], emb[1], emb[2], emb[3]
        discr_apply = (
            lambda x, y: discr.apply({"params": trainable["discr"]}, x, y)
        ) if d_reg else None
        return loss_from_config(loss_cfg, discr_apply)(a, pos, part, neg)

    def step(state: TrainState, input_ids, attention_mask, dropout_rng):
        trainable = {"encoder": state.params}
        if d_reg:
            trainable["discr"] = state.discr_params
        loss, grads = jax.value_and_grad(loss_fn)(
            trainable, input_ids, attention_mask, dropout_rng)
        updates, new_opt = tx.update(grads, state.opt_state, trainable)
        new_trainable = optax.apply_updates(trainable, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_trainable["encoder"],
            opt_state=new_opt,
            discr_params=new_trainable.get("discr") if d_reg else None,
        )
        return new_state, loss

    if mesh is not None:
        batch_sharding = NamedSharding(mesh, P(None, DATA_AXIS, None))
        replicated = NamedSharding(mesh, P())
        return jax.jit(
            step,
            in_shardings=(None, batch_sharding, batch_sharding, replicated),
            donate_argnums=(0,),
        )
    return jax.jit(step, donate_argnums=(0,))


def make_multi_step(
    encoder_cfg: EncoderConfig,
    loss_cfg: LossConfig,
    tx: optax.GradientTransformation,
    n_steps: int,
    mesh: Optional[Mesh] = None,
) -> Callable:
    """→ jitted ``multi_step(state, input_ids, attention_mask, rngs)`` that
    executes ``n_steps`` optimizer steps in ONE dispatch via ``lax.scan``.

    inputs: (n_steps, 4, B, S) stacked role batches and (n_steps,) PRNG keys.
    Returns (state, per-step losses). Amortizes per-dispatch overhead (the
    dev tunnel adds ~30 ms per call; production serving stacks see reduced
    launch/host costs as well) — the host prefetch pipeline feeds whole
    super-batches.
    """
    encode = encoder_apply_fn(encoder_cfg, mesh)
    discr = PairDiscriminator()
    d_reg = loss_cfg.kind == "d_regularized"

    def loss_fn(trainable, input_ids, attention_mask, dropout_rng):
        four, B, S = input_ids.shape
        emb = encode(trainable["encoder"],
                     input_ids.reshape(four * B, S),
                     attention_mask.reshape(four * B, S),
                     dropout_rng).reshape(four, B, -1)
        a, pos, part, neg = emb[0], emb[1], emb[2], emb[3]
        discr_apply = (
            lambda x, y: discr.apply({"params": trainable["discr"]}, x, y)
        ) if d_reg else None
        return loss_from_config(loss_cfg, discr_apply)(a, pos, part, neg)

    def one_step(state, batch):
        input_ids, attention_mask, rng_key = batch
        trainable = {"encoder": state.params}
        if d_reg:
            trainable["discr"] = state.discr_params
        loss, grads = jax.value_and_grad(loss_fn)(
            trainable, input_ids, attention_mask, rng_key)
        updates, new_opt = tx.update(grads, state.opt_state, trainable)
        new_trainable = optax.apply_updates(trainable, updates)
        return state.replace(
            step=state.step + 1,
            params=new_trainable["encoder"],
            opt_state=new_opt,
            discr_params=new_trainable.get("discr") if d_reg else None,
        ), loss

    def multi_step(state, input_ids, attention_mask, rngs):
        return jax.lax.scan(one_step, state,
                            (input_ids, attention_mask, rngs))

    if mesh is not None:
        batch_sharding = NamedSharding(mesh, P(None, None, DATA_AXIS, None))
        replicated = NamedSharding(mesh, P())
        return jax.jit(
            multi_step,
            in_shardings=(None, batch_sharding, batch_sharding, replicated),
            donate_argnums=(0,),
        )
    return jax.jit(multi_step, donate_argnums=(0,))


def make_eval_loss_fn(
    encoder_cfg: EncoderConfig, loss_cfg: LossConfig,
) -> Callable:
    """Deterministic (no-dropout) batch loss — the validation-loss kernel
    behind the loss evaluator (reference QuadrupletLossEvaluator,
    evaluators.py:34-127)."""
    from qst_tpu.models.sentence_encoder import embed_fn

    fwd = embed_fn(encoder_cfg)  # routes through the fused path when flagged

    @jax.jit
    def eval_loss(params, input_ids, attention_mask,
                  discr_params=None):
        four, B, S = input_ids.shape
        emb = fwd(params, input_ids.reshape(four * B, S),
                  attention_mask.reshape(four * B, S)).reshape(four, B, -1)
        a, pos, part, neg = emb[0], emb[1], emb[2], emb[3]
        discr_apply = None
        if loss_cfg.kind == "d_regularized":
            discr = PairDiscriminator()
            discr_apply = lambda x, y: discr.apply(
                {"params": discr_params}, x, y)
        return loss_from_config(loss_cfg, discr_apply)(a, pos, part, neg)

    return eval_loss
