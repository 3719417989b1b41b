"""IR metric golden tests (hand-computed values + degenerate cases)."""

import math

import numpy as np
import pytest

from qst_tpu.evals.ir_metrics import (
    ir_metrics,
    quadruplet_global_accuracy,
    triplet_accuracy,
)


def test_single_query_hand_computed():
    # ranked: [r, x, r, x, x]; relevant = {d0, d2, d9} (d9 never retrieved)
    ranked = [["d0", "d5", "d2", "d7", "d8"]]
    relevant = [{"d0", "d2", "d9"}]
    m = ir_metrics(ranked, relevant,
                   accuracy_at_k=(1, 2, 5), precision_recall_at_k=(1, 3, 5),
                   mrr_at_k=(5,), ndcg_at_k=(5,), map_at_k=(5,))
    assert m["accuracy@1"] == 1.0
    assert m["accuracy@2"] == 1.0
    assert m["precision@1"] == 1.0
    assert m["precision@3"] == pytest.approx(2 / 3)
    assert m["recall@3"] == pytest.approx(2 / 3)
    assert m["recall@5"] == pytest.approx(2 / 3)
    assert m["mrr@5"] == 1.0
    dcg = 1 / math.log2(2) + 1 / math.log2(4)
    idcg = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert m["ndcg@5"] == pytest.approx(dcg / idcg)
    # AP@5 = (1/1 + 2/3) / min(5, 3)
    assert m["map@5"] == pytest.approx((1.0 + 2 / 3) / 3)


def test_miss_everything():
    m = ir_metrics([["a", "b"]], [{"z"}], accuracy_at_k=(1, 2),
                   precision_recall_at_k=(2,), mrr_at_k=(2,),
                   ndcg_at_k=(2,), map_at_k=(2,))
    assert all(v == 0.0 for v in m.values())


def test_multi_query_averaging():
    ranked = [["d0"], ["x"]]
    relevant = [{"d0"}, {"y"}]
    m = ir_metrics(ranked, relevant, accuracy_at_k=(1,),
                   precision_recall_at_k=(1,), mrr_at_k=(1,),
                   ndcg_at_k=(1,), map_at_k=(1,))
    assert m["accuracy@1"] == 0.5
    assert m["mrr@1"] == 0.5


def test_empty_relevant_queries_skipped():
    # second query has empty relevant set → excluded from the average
    ranked = [["d0"], ["d0"]]
    relevant = [{"d0"}, set()]
    m = ir_metrics(ranked, relevant, accuracy_at_k=(1,),
                   precision_recall_at_k=(1,), mrr_at_k=(1,),
                   ndcg_at_k=(1,), map_at_k=(1,))
    assert m["accuracy@1"] == 1.0


def test_no_valid_queries():
    m = ir_metrics([["a"]], [set()], accuracy_at_k=(1,),
                   precision_recall_at_k=(1,), mrr_at_k=(1,),
                   ndcg_at_k=(1,), map_at_k=(1,))
    assert m["accuracy@1"] == 0.0


def test_triplet_and_global_accuracy():
    sim_pos = np.array([0.9, 0.8, 0.3])
    sim_neg = np.array([0.1, 0.9, 0.2])
    assert triplet_accuracy(sim_pos, sim_neg) == pytest.approx(2 / 3)
    # reference formula evaluators.py:367
    g = quadruplet_global_accuracy(0.8, 0.9, 1.0, gamma=0.6)
    assert g == pytest.approx((0.4 * 0.8 + 0.6 * 0.9 + 1.0) / 2)
