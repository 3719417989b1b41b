"""The training loop.

Explicit, lightweight replacement for the reference's black-box
``SentenceTransformer.fit`` call (reference training/main.py:128-148):
per-epoch iteration over fixed-shape quadruplet batches, a jitted train step,
periodic evaluation driving early stopping and best-model checkpoints, and a
pre-training evaluation at epoch -1 (reference training/main.py:126).
"""

from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qst_tpu.core.config import (
    EncoderConfig,
    LossConfig,
    TrainConfig,
    save_config,
)
from qst_tpu.core.telemetry import JsonLogSink, StepTimer
from qst_tpu.data.collate import QuadrupletCollator
from qst_tpu.data.quadruplet_dataset import QuadrupletDataset
from qst_tpu.train.callbacks import EarlyStopping
from qst_tpu.train.checkpoints import CheckpointManager
from qst_tpu.train.train_step import (
    TrainState,
    create_train_state,
    make_train_step,
)

logger = logging.getLogger("qst_tpu.trainer")


@dataclass
class TrainResult:
    state: TrainState
    best_score: float
    best_epoch: int
    history: List[Dict[str, float]]
    stopped_early: bool
    steps_per_sec: float


class Trainer:
    """Quadruplet fine-tuning driver.

    evaluator: optional callable ``(params, epoch, steps) -> float`` whose
    score drives early stopping and best-model saving (the role of the
    reference's SequentialEvaluator main score).
    """

    def __init__(
        self,
        encoder_cfg: EncoderConfig,
        loss_cfg: LossConfig,
        train_cfg: TrainConfig,
        dataset: QuadrupletDataset,
        collator: QuadrupletCollator,
        evaluator: Optional[Callable[[Any, int, int], float]] = None,
        mesh=None,
        steps_per_epoch: Optional[int] = None,
        steps_per_call: int = 1,
        initial_params: Optional[Any] = None,
        pp_stages: int = 1,
        pp_microbatches: int = 0,
        pp_rounds: int = 1,
    ):
        """``initial_params``: start from these encoder weights (imported
        HF checkpoint — the reference fine-tunes pretrained MiniLM) instead
        of random init; ``--resume`` restores over them.

        ``pp_stages`` > 1 trains through the pipeline-parallel trunk
        (qst_tpu.parallel.pipeline): ``mesh`` must then be a
        ('pipe', 'data') mesh from ``make_pipe_mesh``; ``pp_microbatches``
        defaults to ``pp_stages``; ``pp_rounds`` > 1 selects the circular
        interleaved schedule. Checkpoints store the PP layout (resume with
        the same flags); the BEST artifact is saved in the standard flat
        layout so ir-eval / index CLIs consume it unchanged."""
        if steps_per_call < 1:
            raise ValueError(f"steps_per_call must be >= 1, {steps_per_call}")
        if pp_stages > 1 and steps_per_call > 1:
            raise ValueError(
                "steps_per_call > 1 is not supported with pipeline "
                "training (the PP schedule is already a scanned multi-tick "
                "dispatch)")
        if pp_stages > 1 and loss_cfg.kind == "d_regularized":
            raise ValueError(
                "d_regularized loss is not supported with pipeline "
                "training")
        self.encoder_cfg = encoder_cfg
        self.loss_cfg = loss_cfg
        self.train_cfg = train_cfg
        self.dataset = dataset
        self.collator = collator
        self.evaluator = evaluator
        self.mesh = mesh
        self.steps_per_call = steps_per_call
        self.initial_params = initial_params
        self.pp_stages = pp_stages
        self.pp_microbatches = pp_microbatches or pp_stages
        self.pp_rounds = pp_rounds
        self.steps_per_epoch = steps_per_epoch or max(
            1, len(dataset) // train_cfg.batch_size)
        self.total_steps = self.steps_per_epoch * train_cfg.epochs
        self.timer = StepTimer()

    def train(self, rng: Optional[jax.Array] = None,
              resume: bool = False) -> TrainResult:
        cfg = self.train_cfg
        rng = rng if rng is not None else jax.random.key(cfg.seed)
        if self.pp_stages > 1:
            from qst_tpu.models.sentence_encoder import init_params
            from qst_tpu.parallel.pipeline import (
                PIPE_AXIS,
                make_pp_train_step,
                pp_params_from_encoder,
            )
            from qst_tpu.train.train_step import make_optimizer

            if self.mesh is None or PIPE_AXIS not in self.mesh.shape:
                raise ValueError(
                    "pipeline training needs a ('pipe', 'data') mesh "
                    "(qst_tpu.parallel.pipeline.make_pipe_mesh)")
            full = (self.initial_params if self.initial_params is not None
                    else init_params(self.encoder_cfg, rng))
            pp_params = pp_params_from_encoder(
                full["encoder"], self.encoder_cfg, self.pp_stages,
                self.mesh, self.pp_rounds)
            tx = make_optimizer(cfg, self.total_steps)
            state = TrainState(step=jnp.zeros((), jnp.int32),
                               params=pp_params,
                               opt_state=tx.init(pp_params))
            step_fn = make_pp_train_step(
                self.encoder_cfg, self.loss_cfg, tx, self.mesh,
                self.pp_stages, self.pp_microbatches, self.pp_rounds)
        elif self.mesh is not None and self.mesh.shape.get("model", 1) > 1:
            from qst_tpu.train.train_step import create_train_state_sharded

            state, tx, _ = create_train_state_sharded(
                self.encoder_cfg, cfg, rng, self.total_steps, self.mesh,
                self.loss_cfg, initial_params=self.initial_params)
        else:
            state, tx = create_train_state(
                self.encoder_cfg, cfg, rng, self.total_steps, self.loss_cfg,
                initial_params=self.initial_params)
        if self.pp_stages == 1:
            step_fn = make_train_step(self.encoder_cfg, self.loss_cfg, tx,
                                      self.mesh)
        multi_fn = None
        if self.steps_per_call > 1:
            from qst_tpu.train.train_step import make_multi_step

            multi_fn = make_multi_step(self.encoder_cfg, self.loss_cfg, tx,
                                       self.steps_per_call, self.mesh)

        os.makedirs(cfg.experiment_dir, exist_ok=True)
        save_config(
            {"encoder": self.encoder_cfg, "loss": self.loss_cfg, "train": cfg},
            os.path.join(cfg.experiment_dir, "experiment_config.json"))
        loss_log = JsonLogSink(os.path.join(cfg.experiment_dir, "train_loss.json"))

        ckpt = CheckpointManager(
            os.path.join(cfg.experiment_dir, "checkpoints"),
            save_steps=cfg.checkpoint_save_steps,
            total_limit=cfg.checkpoint_save_total_limit,
            save_best=cfg.save_best_model,
            mode=cfg.early_stopping_mode)
        if resume:
            restored = ckpt.restore_latest(state)
            if restored is not None:
                state = restored
                logger.info("resumed from step %d", int(state.step))

        stopper = EarlyStopping(
            patience=cfg.early_stopping_patience,
            delta=cfg.early_stopping_delta,
            mode=cfg.early_stopping_mode)
        history: List[Dict[str, float]] = []

        def flat_params(params):
            """PP layout → the standard {"encoder": {...}} layout the
            evaluators and downstream CLIs consume (identity otherwise)."""
            if self.pp_stages == 1:
                return params
            from qst_tpu.parallel.pipeline import unstack_stage_params

            enc = {"embeddings": params["embeddings"],
                   **unstack_stage_params(params["stages"],
                                          self.encoder_cfg.num_layers,
                                          self.pp_rounds)}
            return {"encoder": enc}

        def run_eval(epoch: int, steps: int) -> Optional[float]:
            if self.evaluator is None:
                return None
            flat = flat_params(state.params)
            score = float(self.evaluator(flat, epoch, steps))
            history.append({"epoch": epoch, "steps": steps, "score": score})
            # the best artifact always stores the flat layout so ir-eval /
            # index consumers work regardless of the training parallelism
            ckpt.update_best(state if self.pp_stages == 1
                             else state.replace(params=flat), score)
            return score

        # pre-training evaluation (reference training/main.py:126)
        run_eval(epoch=-1, steps=-1)

        global_step = int(state.step)
        # preemption-resume fast-forward: the per-epoch batch order and the
        # per-step sampling/rng keys are all deterministic functions of
        # (epoch, step), so a resumed run that SKIPS the already-trained
        # batches continues the interrupted run exactly (tested bit-close
        # in tests/test_train.py::test_resume_matches_uninterrupted)
        steps_per_epoch = max(1, len(self.dataset) // cfg.batch_size)
        start_epoch, resume_skip = divmod(global_step, steps_per_epoch)
        if global_step == 0:
            start_epoch, resume_skip = 0, 0
        stop = False
        t_start = time.perf_counter()
        compiled_steps = 0
        from qst_tpu.data.prefetch import PrefetchIterator

        for epoch in range(start_epoch, cfg.epochs):
            if stop:
                break
            skip = resume_skip if epoch == start_epoch else 0
            # sampling + mining + collation run on a host thread, hidden
            # behind the device step
            prefetch = PrefetchIterator(
                self.dataset.iter_batches(cfg.batch_size, shuffle=True,
                                          epoch=epoch,
                                          step_offset=global_step,
                                          start_batch=skip),
                transform=self.collator, depth=2 * self.steps_per_call)
            pending = []
            iterator = iter(prefetch)
            exhausted = False
            while not exhausted and not stop:
                # collect up to steps_per_call collated batches
                while len(pending) < self.steps_per_call:
                    try:
                        pending.append(next(iterator))
                    except StopIteration:
                        exhausted = True
                        break
                if not pending:
                    break
                step_before = global_step
                K = len(pending)
                if multi_fn is not None and K == self.steps_per_call:
                    ids = jnp.asarray(np.stack([b.input_ids for b in pending]))
                    masks = jnp.asarray(
                        np.stack([b.attention_mask for b in pending]))
                    rngs = jnp.stack([
                        jax.random.fold_in(rng, global_step + 1 + j)
                        for j in range(K)])
                    with self.timer.phase("train_step"):
                        state, losses = multi_fn(state, ids, masks, rngs)
                    loss = losses[-1]
                    global_step += K
                    compiled_steps += K
                else:  # remainder (or steps_per_call == 1): single steps
                    for qb in pending:
                        dropout_rng = jax.random.fold_in(rng, global_step + 1)
                        with self.timer.phase("train_step"):
                            state, loss = step_fn(
                                state, jnp.asarray(qb.input_ids),
                                jnp.asarray(qb.attention_mask), dropout_rng)
                        global_step += 1
                        compiled_steps += 1
                pending = []
                ev = cfg.evaluation_steps
                if ev > 0 and (step_before // ev) != (global_step // ev):
                    loss_val = float(loss)
                    loss_log.append({"epoch": epoch, "steps": global_step,
                                     "loss": loss_val})
                    score = run_eval(epoch, global_step)
                    if score is not None and stopper.update(score, epoch, global_step):
                        stop = True
                        prefetch.close()
                        break
                cs = cfg.checkpoint_save_steps
                if cs > 0 and (step_before // cs) != (global_step // cs):
                    ckpt.save_now(state, global_step)
            if not stop:
                score = run_eval(epoch, global_step)
                if score is not None and stopper.update(score, epoch, global_step):
                    stop = True

        jax.block_until_ready(state.params)
        elapsed = time.perf_counter() - t_start
        ckpt.save_now(state, global_step)
        ckpt.close()
        return TrainResult(
            state=state,
            best_score=stopper.best_score,
            best_epoch=stopper.best_epoch,
            history=history,
            stopped_early=stopper.stopped,
            steps_per_sec=compiled_steps / elapsed if elapsed > 0 else 0.0,
        )
