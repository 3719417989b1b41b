"""Evaluator factory.

Capability match for the reference ``get_sequential_evaluator``
(models/evaluators.py:532-614): assemble a SequentialEvaluator over
[InformationRetrievalEvaluator?, QuadrupletEvaluator, QuadrupletLossEvaluator]
with the loss LAST (its score is the main score, reference :602) — adapted to
the trainer's ``evaluator(params, epoch, steps) -> float`` interface.

The reference's relevant-set bug at :561 does not apply: the eval-set builder
already returns per-query doc-id sets (see qst_tpu.evals.eval_set).
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Sequence


from qst_tpu.core.config import EncoderConfig, IREvalConfig, LossConfig
from qst_tpu.data.collate import QuadrupletCollator
from qst_tpu.evals.eval_set import IREvaluationSet
from qst_tpu.evals.ir_evaluator import InformationRetrievalEvaluator
from qst_tpu.evals.loss_evaluator import QuadrupletLossEvaluator
from qst_tpu.evals.quadruplet_evaluator import QuadrupletEvaluator
from qst_tpu.models.sentence_encoder import SentenceEncoder


def get_sequential_evaluator(
    encoder_cfg: EncoderConfig,
    loss_cfg: LossConfig,
    tokenizer: Any,
    val_instances: Sequence[dict],
    val_batches: Optional[Sequence] = None,
    collator: Optional[QuadrupletCollator] = None,
    ir_eval_set: Optional[IREvaluationSet] = None,
    ir_cfg: Optional[IREvalConfig] = None,
    log_dir: Optional[str] = None,
    mesh=None,
    main: str = "loss",  # "loss" (reference ordering) | "ir" | "quadruplet"
) -> Callable[[Any, int, int], float]:
    """→ ``evaluator(params, epoch, steps) -> float`` for the Trainer."""
    collator = collator or QuadrupletCollator(
        tokenizer, max_length=encoder_cfg.max_seq_length)

    evaluators: List[tuple] = []  # (kind, evaluator)
    if ir_eval_set is not None:
        evaluators.append((
            "ir",
            InformationRetrievalEvaluator(
                ir_eval_set.queries, ir_eval_set.corpus, ir_eval_set.relevant,
                cfg=ir_cfg, mesh=mesh, log_dir=log_dir),
        ))
    if val_instances:
        evaluators.append((
            "quadruplet",
            QuadrupletEvaluator.from_instances(
                list(val_instances), gamma=loss_cfg.gamma, log_dir=log_dir),
        ))
    if val_batches is not None:
        evaluators.append((
            "loss",
            QuadrupletLossEvaluator(
                encoder_cfg, loss_cfg, val_batches, collator, log_dir=log_dir),
        ))
    if not evaluators:
        raise ValueError("no evaluators configured")

    # main-score evaluator goes last (SequentialEvaluator takes the last score)
    evaluators.sort(key=lambda kv: kv[0] == main)

    def evaluator(params: Any, epoch: int, steps: int) -> float:
        encoder = SentenceEncoder(encoder_cfg, params, tokenizer)
        encode_fn = lambda texts: encoder.encode(list(texts))
        scores = []
        for kind, ev in evaluators:
            if kind == "loss":
                scores.append(ev(params, epoch, steps))
            else:
                scores.append(ev(encode_fn, epoch, steps))
        return float(scores[-1])

    evaluator.evaluators = evaluators  # type: ignore[attr-defined]
    return evaluator
