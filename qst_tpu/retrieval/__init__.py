from qst_tpu.retrieval.index import ExactIndex, exact_topk
from qst_tpu.retrieval.retriever import Retriever, save_index, load_index
from qst_tpu.retrieval.streaming import StreamingExactIndex
from qst_tpu.retrieval.updatable import UpdatableIndex
from qst_tpu.retrieval.ivf import IVFIndex, kmeans
from qst_tpu.retrieval.pq import PQIndex
from qst_tpu.retrieval.ivfpq import IVFPQIndex

__all__ = ["ExactIndex", "exact_topk", "Retriever", "save_index",
           "load_index", "StreamingExactIndex", "UpdatableIndex",
           "IVFIndex", "kmeans", "PQIndex", "IVFPQIndex"]
