from qst_tpu.retrieval.index import ExactIndex, exact_topk

__all__ = ["ExactIndex", "exact_topk"]
