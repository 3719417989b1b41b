from qst_tpu.serve.batcher import DynamicBatcher
from qst_tpu.serve.server import RetrievalServer

__all__ = ["DynamicBatcher", "RetrievalServer"]
