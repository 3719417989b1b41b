from qst_tpu.evals.ir_metrics import (
    ir_metrics,
    triplet_accuracy,
    quadruplet_global_accuracy,
)
from qst_tpu.evals.ir_evaluator import InformationRetrievalEvaluator
from qst_tpu.evals.loss_evaluator import QuadrupletLossEvaluator
from qst_tpu.evals.quadruplet_evaluator import QuadrupletEvaluator
from qst_tpu.evals.sequential import SequentialEvaluator
from qst_tpu.evals.eval_set import IREvaluationSet, create_ir_evaluation_set
from qst_tpu.evals.factory import get_sequential_evaluator

__all__ = [
    "ir_metrics",
    "triplet_accuracy",
    "quadruplet_global_accuracy",
    "InformationRetrievalEvaluator",
    "QuadrupletLossEvaluator",
    "QuadrupletEvaluator",
    "SequentialEvaluator",
    "IREvaluationSet",
    "create_ir_evaluation_set",
    "get_sequential_evaluator",
]
